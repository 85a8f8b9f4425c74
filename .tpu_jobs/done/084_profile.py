"""Phase-level profiling of the serve-loop engine on the 1024^3 bench
scene at 1080p: where do the 547 ms (primary) and 7016 ms (gi, 083) go,
and does a bounded-serve + re-sorting ladder (hybrid) beat the
drain-in-one-round config?  Every (serve, serve_width, schedule) combo
is its own Mosaic compile — kept to a handful."""
import json
import os
import sys
import time

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from svo_raytracer_tpu.ops import render_wave, shade, wavefront  # noqa
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


tree, _ = bench.build_scene(1024, 512)
wsc = wavefront.prepare(bench.build_brick_scene(tree, 1024))
jax.block_until_ready(wsc.attr_comb)

W, H = 1920, 1080
gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
po = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                     pxz[:, 1:]], axis=1)
pd = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wavefront.intersect_wavefront(wsc, jnp.asarray(po), jnp.asarray(pd))
ts = np.asarray(pr.t)
best = int(np.argmax(ts))
cam = Camera(pos=np.array([po[best, 0], min(1.999 - float(ts[best]) + 0.05,
                                            1.99), po[best, 2]]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
origins, dirs, px, py = render_wave._frame_rays(cam5, W, H)
camera = (cam5, W, H)


def timeit(fn, reps=3):
    r = fn()
    jax.block_until_ready(r[0] if isinstance(r, tuple) else r)
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r[0] if isinstance(r, tuple) else r)
    return (time.time() - t0) / reps, r


# ---------------- primary variants (camera mode) ----------------
for label, kw in [
    ("prim_staticonly", dict(schedule=(), serve=0)),
    ("prim_drain_v1", dict(schedule=(), serve_width=1)),
    ("prim_drain_v4", dict(schedule=())),
    ("prim_drain_v8", dict(schedule=(), serve_width=8)),
]:
    dt, r = timeit(lambda kw=kw: wavefront.intersect_wavefront(
        wsc, origins, dirs, camera=camera, **kw))
    res, nl = r
    out(kind=label, ms=round(dt * 1e3, 1), n_left=int(nl),
        hits=int(np.asarray(res.hit).sum()))

# ---------------- gi (bounce) rays ----------------
res1, _ = wavefront.intersect_wavefront(wsc, origins, dirs, camera=camera,
                                        schedule=())
accum, mask, depth, it0, active, rnd = render_wave._gi_init(
    px, py, jnp.asarray(3, jnp.float32), dirs)
accum, mask, depth, it0, active, o2, d2 = render_wave._gi_update(
    True, (), accum, mask, depth, it0, active, origins, dirs, rnd, res1)
jax.block_until_ready(o2)
out(kind="gi_rays", n_active=int(jnp.sum(active)))

# drain-in-one-sorted-round (083's config)
for label, kw in [
    ("gi_sorted_drain_v4", dict(serve_local=False, schedule=(0,))),
    ("gi_sorted_drain_v8", dict(serve_local=False, schedule=(0,),
                                serve_width=8)),
]:
    dt, r = timeit(lambda kw=kw: wavefront.intersect_wavefront(
        wsc, o2, d2, active=active, **kw), reps=2)
    res, nl = r
    out(kind=label, ms=round(dt * 1e3, 1), n_left=int(nl))

# hybrid: bounded serve per round + re-sorting ladder (dynamic loop)
for label, kw in [
    ("gi_hybrid_s2_v4", dict(serve=2, serve_local=False)),
    ("gi_hybrid_s4_v4", dict(serve=4, serve_local=False)),
    ("gi_hybrid_s8_v8", dict(serve=8, serve_width=8, serve_local=False)),
    ("gi_ladder_pure", dict(serve=0)),
]:
    prof = {}
    dt, r = timeit(lambda kw=kw: wavefront.intersect_wavefront(
        wsc, o2, d2, active=active, **kw), reps=2)
    prof2 = {}
    wavefront.intersect_wavefront(wsc, o2, d2, active=active, profile=prof2,
                                  **kw)
    out(kind=label, ms=round(dt * 1e3, 1),
        rounds=len([x for x in prof2["rounds"] if isinstance(x["r"], int)]),
        acts=[x["active"] for x in prof2["rounds"]][:14])

# hybrid primary: bounded serve in 1L + ladder
for label, kw in [
    ("prim_hybrid_s2_v4", dict(serve=2)),
    ("prim_hybrid_s4_v4", dict(serve=4)),
]:
    prof2 = {}
    wavefront.intersect_wavefront(wsc, origins, dirs, camera=camera,
                                  profile=prof2, **kw)
    sched = prof2["schedule"]
    dt, r = timeit(lambda kw=kw, sched=sched: wavefront.intersect_wavefront(
        wsc, origins, dirs, camera=camera, schedule=sched, **kw))
    res, nl = r
    out(kind=label, ms=round(dt * 1e3, 1), n_left=int(nl), sched=list(sched))
