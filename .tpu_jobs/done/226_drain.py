"""r5 job 226: serve-tail share + drain-threshold A/B.

The dfield null result on recorded frames (686.5 ms, == r4) vs its
-17% on no-serve generic ladders says the production gi segment's
critical path is NOT ladder kernels — suspect the final serve drain
(~65k incoherent tail rays at 30-100 us/(tile,crossing)).  Measure
directly: the same generic ladder with/without a final-round serve,
then longer ladders that shrink the served tail before draining.
"""
import importlib
import json
import sys
import time
import traceback

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
import svo_raytracer_tpu.ops.wavefront as wf  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


tree, _ = bench.build_scene(1024, 512)
b0 = bench.build_brick_scene(tree, 1024)
W, H = 1920, 1080
GEN = (0, 0, 1, 1, 1, 1, 2, 2)
LONG = GEN + (3, 3, 3, 3)
LONGER = GEN + (3, 3, 3, 3, 3, 3, 3, 3)

wsc = wf.prepare(b0)
jax.block_until_ready(wsc.attr_comb)

from svo_raytracer_tpu.ops import render_wave  # noqa: E402
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402

gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
po = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                     pxz[:, 1:]], axis=1)
pd = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wf.intersect_wavefront(wsc, jnp.asarray(po), jnp.asarray(pd))
ts = np.asarray(pr.t)
best = int(np.argmax(ts))
cam = Camera(pos=np.array([po[best, 0],
                           min(1.999 - float(ts[best]) + 0.05, 1.99),
                           po[best, 2]]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
origins, dirs, px, py = render_wave._frame_rays(cam5, W, H)
res1, _ = wf.intersect_wavefront(
    wsc, origins, dirs, camera=(cam5, W, H), cam_block=True,
    schedule=GEN, serve_local=False)
accum, mask, depth, it0, active, rnd = render_wave._gi_init(
    px, py, jnp.asarray(3, jnp.float32), dirs)
_, _, _, _, active, o2, d2 = render_wave._gi_update(
    True, (), accum, mask, depth, it0, active, origins, dirs, rnd, res1)
jax.block_until_ready(o2)

for tag, sched, serve in (("gen_noserve", GEN, 0),
                          ("gen_drain", GEN, 4096),
                          ("long_drain", LONG, 4096),
                          ("longer_drain", LONGER, 4096)):
    if time.time() > DEADLINE - 600:
        out(what="stop", reason="deadline")
        break
    try:
        def gi():
            return wf.intersect_wavefront(
                wsc, o2, d2, active=active, schedule=sched,
                serve_local=False, serve=serve, serve_width=4, cloop=64)
        t0 = time.time()
        r = gi()
        jax.block_until_ready(r[0].t)
        cs = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            r = gi()
        jax.block_until_ready(r[0].t)
        out(what=tag, ms=round((time.time() - t0) / 3 * 1e3, 1),
            compile_s=round(cs, 1), n_left=int(r[1]),
            hits=int(jnp.sum(r[0].hit)))
    except Exception:
        traceback.print_exc()
        out(what="failed", tag=tag)
out(what="done")
