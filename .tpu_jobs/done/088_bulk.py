"""serve_bulk sweep at KMAX=8 + full-frame adoption run.

087: gi acts decay ~30%/round regardless of KMAX (4/8/16 nearly
identical) => rounds are limited by ONE crossing per round, not
candidate coverage.  serve_bulk adds bounded in-kernel crossings per
bulk round.  Sweep it on the gi segment, then record + time full frames
at the best config, prove 20-frame invariance, and persist schedules."""
import json
import os
import sys
import time

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from svo_raytracer_tpu.ops import render_wave, wavefront as wf  # noqa: E402
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


assert wf.KMAX == 8, wf.KMAX
tree, _ = bench.build_scene(1024, 512)
wsc = wf.prepare(bench.build_brick_scene(tree, 1024))
jax.block_until_ready(wsc.attr_comb)

W, H = 1920, 1080
gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
po = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                     pxz[:, 1:]], axis=1)
pd = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wf.intersect_wavefront(wsc, jnp.asarray(po), jnp.asarray(pd))
ts = np.asarray(pr.t)
best = int(np.argmax(ts))
cam = Camera(pos=np.array([po[best, 0], min(1.999 - float(ts[best]) + 0.05,
                                            1.99), po[best, 2]]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
origins, dirs, px, py = render_wave._frame_rays(cam5, W, H)
camera = (cam5, W, H)

res1, _ = wf.intersect_wavefront(wsc, origins, dirs, camera=camera,
                                 schedule=(), serve_local=True)
accum, mask, depth, it0, active, rnd = render_wave._gi_init(
    px, py, jnp.asarray(3, jnp.float32), dirs)
_, _, _, _, active, o2, d2 = render_wave._gi_update(
    True, (), accum, mask, depth, it0, active, origins, dirs, rnd, res1)
jax.block_until_ready(o2)


def timeit(fn, reps=3):
    r = fn()
    jax.block_until_ready(r[0] if isinstance(r, tuple) else r)
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r[0] if isinstance(r, tuple) else r)
    return (time.time() - t0) / reps, r


for sb in (2, 4):
    prof = {}
    wf.intersect_wavefront(wsc, o2, d2, active=active, profile=prof,
                           serve_local=False, serve_bulk=sb)
    sched = prof["schedule"]
    ms, r = timeit(lambda s=sched, sb=sb: wf.intersect_wavefront(
        wsc, o2, d2, active=active, serve_local=False, serve_bulk=sb,
        schedule=s))
    out(kind=f"gi_k8_sb{sb}", replay_ms=round(ms * 1e3, 1),
        n_left=int(r[1]), rounds=len(sched),
        acts=[x["active"] for x in prof["rounds"]][:12])
    # primary with the same bulk bound
    prof = {}
    wf.intersect_wavefront(wsc, origins, dirs, camera=camera, profile=prof,
                           serve_local=False, serve_bulk=sb)
    sched = prof["schedule"]
    ms, r = timeit(lambda s=sched, sb=sb: wf.intersect_wavefront(
        wsc, origins, dirs, camera=camera, serve_local=False, serve_bulk=sb,
        schedule=s))
    out(kind=f"prim_k8_sb{sb}", replay_ms=round(ms * 1e3, 1),
        n_left=int(r[1]), rounds=len(sched))
