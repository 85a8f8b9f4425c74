"""r4 job 100: baseline segment replays + cont=2/3 sweep + sort micro.

Questions:
  1. What do the adopted (cont=1) primary/gi-1 replays measure today?
  2. Does cont=2/3 (unrolled static-candidate crossings per round) cut
     rounds/time?  (PERF_NOTES r3 "next levers" #1; compile cost was
     9-12 s at KMAX=4 in r2, unknown at KMAX=8.)
  3. Micro: 11-op global sort vs batched per-tile key-only sort at 2 M
     (the local re-coherence round candidate).
"""
import json
import os
import sys
import time

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from svo_raytracer_tpu.ops import render_wave  # noqa: E402
from svo_raytracer_tpu.ops import wavefront as wf  # noqa: E402
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


tree, _ = bench.build_scene(1024, 512)
b0 = bench.build_brick_scene(tree, 1024)
W, H = 1920, 1080
wsc = wf.prepare(b0)
jax.block_until_ready(wsc.attr_comb)

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
camera = (cam5, W, H)

# primary hits -> gi-1 ray state (frame 3 RNG like 087)
res1, _ = wf.intersect_wavefront(wsc, origins, dirs, camera=camera,
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


# ---- 3: sort micro-benchmarks (informs local re-coherence rounds) ----
state11 = wf._init_state(o2, d2, active, 1024, W * H)
key = state11[0]


def glob_sort():
    return jax.jit(lambda s: jax.lax.sort(tuple(s), num_keys=1))(state11)


def glob_sort5():
    return jax.jit(lambda s: jax.lax.sort(tuple(s), num_keys=1))(state11[:5])


def local_sort():
    return jax.jit(lambda k: jnp.sort(k.reshape(-1, wf.TILE), axis=1))(key)


dt, _ = timeit(glob_sort, 5)
out(what="sort11_2M_ms", ms=round(dt * 1e3, 2))
dt, _ = timeit(glob_sort5, 5)
out(what="sort5_2M_ms", ms=round(dt * 1e3, 2))
dt, _ = timeit(local_sort, 5)
out(what="local_keysort_2M_ms", ms=round(dt * 1e3, 2))

# ---- 1+2: cont sweep on discovery + replay -------------------------
for cont in (1, 2, 3):
    if time.time() > DEADLINE - 600:
        out(what="skip", cont=cont, reason="deadline")
        break
    # primary (camera mode)
    prof = {}
    t0 = time.time()
    r = wf.intersect_wavefront(wsc, origins, dirs, camera=camera,
                               profile=prof, cont=cont, serve_local=False)
    jax.block_until_ready(r.t)
    disc = time.time() - t0
    sched = prof["schedule"]
    dt, rr = timeit(lambda: wf.intersect_wavefront(
        wsc, origins, dirs, camera=camera, schedule=sched, cont=cont,
        serve_local=False))
    hits = int(jnp.sum(rr[0].hit))
    out(what="prim", cont=cont, disc_s=round(disc, 1), rounds=len(sched),
        replay_ms=round(dt * 1e3, 1), hits=hits,
        n_left=int(rr[1]))
    # gi-1
    prof = {}
    t0 = time.time()
    r = wf.intersect_wavefront(wsc, o2, d2, active=active, profile=prof,
                               cont=cont, serve_local=False)
    jax.block_until_ready(r.t)
    disc = time.time() - t0
    sched = prof["schedule"]
    dt, rr = timeit(lambda: wf.intersect_wavefront(
        wsc, o2, d2, active=active, schedule=sched, cont=cont,
        serve_local=False))
    hits = int(jnp.sum(rr[0].hit))
    out(what="gi1", cont=cont, disc_s=round(disc, 1), rounds=len(sched),
        replay_ms=round(dt * 1e3, 1), hits=hits, n_left=int(rr[1]))
out(what="done")
