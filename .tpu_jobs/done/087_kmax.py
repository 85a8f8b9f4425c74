"""KMAX x DRAIN_TILES sweep, take 2.  086 crashed because patching
wf.KMAX mid-process reuses _sort_stage's shape-keyed jit cache (KMAX=4
tile tables into a KMAX=8 kernel -> OOB block index -> TPU INTERNAL).
Reload the module per config so every jit cache resets."""
import importlib
import json
import os
import sys
import time

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from svo_raytracer_tpu.ops import render_wave, shade  # noqa: E402
from svo_raytracer_tpu.ops import wavefront as wf0  # noqa: E402
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


tree, _ = bench.build_scene(1024, 512)
b0 = bench.build_brick_scene(tree, 1024)

W, H = 1920, 1080
wsc0 = wf0.prepare(b0)
jax.block_until_ready(wsc0.attr_comb)
gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
po = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                     pxz[:, 1:]], axis=1)
pd = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wf0.intersect_wavefront(wsc0, jnp.asarray(po), jnp.asarray(pd))
ts = np.asarray(pr.t)
best = int(np.argmax(ts))
cam = Camera(pos=np.array([po[best, 0], min(1.999 - float(ts[best]) + 0.05,
                                            1.99), po[best, 2]]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
origins, dirs, px, py = render_wave._frame_rays(cam5, W, H)
camera = (cam5, W, H)

res1, _ = wf0.intersect_wavefront(wsc0, origins, dirs, camera=camera,
                                  schedule=())
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


import svo_raytracer_tpu.ops.wavefront as wfmod  # noqa: E402

for KM in (8, 16):
    wf = importlib.reload(wfmod)
    wf.KMAX = KM
    wsc = wf.prepare(b0)
    jax.block_until_ready(wsc.attr_comb)
    for dt_tiles in (64, 256):
        wf.DRAIN_TILES = dt_tiles
        prof = {}
        t0 = time.time()
        wf.intersect_wavefront(wsc, o2, d2, active=active, profile=prof,
                               serve_local=False)
        disc_s = time.time() - t0
        sched = prof["schedule"]
        ms, r = timeit(lambda s=sched: wf.intersect_wavefront(
            wsc, o2, d2, active=active, serve_local=False, schedule=s))
        out(kind=f"gi_k{KM}_d{dt_tiles}", replay_ms=round(ms * 1e3, 1),
            n_left=int(r[1]), rounds=len(sched), disc_s=round(disc_s, 1),
            acts=[x["active"] for x in prof["rounds"]][:12])
    wf.DRAIN_TILES = 64
    prof = {}
    wf.intersect_wavefront(wsc, origins, dirs, camera=camera, profile=prof,
                           serve_local=False)
    sched = prof["schedule"]
    ms, r = timeit(lambda s=sched: wf.intersect_wavefront(
        wsc, origins, dirs, camera=camera, serve_local=False, schedule=s))
    out(kind=f"prim_k{KM}_ladder", replay_ms=round(ms * 1e3, 1),
        n_left=int(r[1]), rounds=len(sched), sched=list(sched))
