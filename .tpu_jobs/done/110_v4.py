"""r4 job 110: v4 engine (coarse-refine merged DDA + cloop) on-chip.

1. Compiled-mode correctness gate: 2048 random interior rays at 1024^3
   vs the XLA brick oracle (the r2 lesson: interpret green proves
   nothing about Mosaic lowering).
2. Segment timings at 1080p: primary (camera mode) + gi-1, discovery +
   static replay, vs r3 baselines (prim 171 ms / gi 534 ms).
If the cond-gated refine fails to lower, retries with GATE_REFINE=False.
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


def out(**kw):
    print(json.dumps(kw), flush=True)


tree, _ = bench.build_scene(1024, 512)
b0 = bench.build_brick_scene(tree, 1024)
W, H = 1920, 1080

import svo_raytracer_tpu.ops.wavefront as wfmod  # noqa: E402


def run_suite(wf, tag):
    from svo_raytracer_tpu.ops import brick_trace, render_wave
    from svo_raytracer_tpu.utils.camera import Camera

    t0 = time.time()
    wsc = wf.prepare(b0)
    jax.block_until_ready(wsc.attr_comb)
    out(what="prepare_s", tag=tag, s=round(time.time() - t0, 1))

    # ---- correctness gate: random interior rays vs XLA oracle --------
    rng = np.random.default_rng(42)
    n = 2048
    o = (1.0 + rng.random((n, 3)) * 0.999).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t0 = time.time()
    got = wf.intersect_wavefront(wsc, jnp.asarray(o), jnp.asarray(d))
    jax.block_until_ready(got.t)
    out(what="gate_compile_s", tag=tag, s=round(time.time() - t0, 1))
    ref = brick_trace.intersect_bricks(b0.to_device(), jnp.asarray(o),
                                       jnp.asarray(d))
    gh = np.asarray(got.hit)
    rh = np.asarray(ref.hit)
    agree = float((gh == rh).mean())
    both = gh & rh
    strict = np.ones(n, bool)
    strict &= ~both | (np.asarray(got.value) == np.asarray(ref.value))
    strict &= ~both | (np.abs(np.asarray(got.t) - np.asarray(ref.t)) <= 2e-4)
    out(what="gate", tag=tag, hit_agree=round(agree, 4),
        strict=round(float(strict[both].mean()), 4),
        hits=int(gh.sum()), ref_hits=int(rh.sum()))

    # ---- segment timings at 1080p ------------------------------------
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

    def timeit(fn, reps=3):
        r = fn()
        jax.block_until_ready(r[0].t if isinstance(r, tuple) else r.t)
        t0 = time.time()
        for _ in range(reps):
            r = fn()
        jax.block_until_ready(r[0].t if isinstance(r, tuple) else r.t)
        return (time.time() - t0) / reps, r

    prof = {}
    t0 = time.time()
    r1 = wf.intersect_wavefront(wsc, origins, dirs, camera=camera,
                                profile=prof, serve_local=False)
    jax.block_until_ready(r1.t)
    disc = time.time() - t0
    sched_p = prof["schedule"]
    dt, rr = timeit(lambda: wf.intersect_wavefront(
        wsc, origins, dirs, camera=camera, schedule=sched_p,
        serve_local=False))
    out(what="prim", tag=tag, disc_s=round(disc, 1), rounds=len(sched_p),
        replay_ms=round(dt * 1e3, 1), hits=int(jnp.sum(rr[0].hit)),
        n_left=int(rr[1]), profile=prof.get("rounds"))

    res1, _ = wf.intersect_wavefront(wsc, origins, dirs, camera=camera,
                                     schedule=sched_p, serve_local=False)
    accum, mask, depth, it0, active, rnd = render_wave._gi_init(
        px, py, jnp.asarray(3, jnp.float32), dirs)
    _, _, _, _, active, o2, d2 = render_wave._gi_update(
        True, (), accum, mask, depth, it0, active, origins, dirs, rnd, res1)
    jax.block_until_ready(o2)

    prof = {}
    t0 = time.time()
    r2 = wf.intersect_wavefront(wsc, o2, d2, active=active, profile=prof,
                                serve_local=False)
    jax.block_until_ready(r2.t)
    disc = time.time() - t0
    sched_g = prof["schedule"]
    dt, rr = timeit(lambda: wf.intersect_wavefront(
        wsc, o2, d2, active=active, schedule=sched_g, serve_local=False))
    out(what="gi1", tag=tag, disc_s=round(disc, 1), rounds=len(sched_g),
        replay_ms=round(dt * 1e3, 1), hits=int(jnp.sum(rr[0].hit)),
        n_left=int(rr[1]), profile=prof.get("rounds"))


try:
    wf = importlib.reload(wfmod)
    run_suite(wf, "gated")
except Exception:
    traceback.print_exc()
    out(what="gated_failed")
    try:
        wf = importlib.reload(wfmod)
        wf.GATE_REFINE = False
        run_suite(wf, "ungated")
    except Exception:
        traceback.print_exc()
        out(what="ungated_failed")
out(what="done")
