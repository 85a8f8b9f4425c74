"""r4 job 135: gi-segment config sweep under v4+predict+gating.

The gi ladder is the frame's dominant cost.  Sweep, replay-only (a
generic over-provisioned ladder + final-round drain makes discovery
unnecessary; n_left>0 flags an insufficient ladder):
  - KMAX 8 vs 16 (presence-gated probes make idle candidates cheap;
    bounce tiles span ~15 runs so 8 candidates cover half the runs)
  - cloop 3 vs 64 at KMAX=8 (long low-utilization crossing tails vs
    re-sort reconvergence)
Module reloaded per KMAX (stale shape-keyed jit caches crash the chip,
CLAUDE.md).
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
import svo_raytracer_tpu.ops.wavefront as wfmod  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


tree, _ = bench.build_scene(1024, 512)
b0 = bench.build_brick_scene(tree, 1024)
W, H = 1920, 1080
GEN_SCHED = (0, 0, 1, 1, 1, 1, 2, 2)   # generic over-provisioned ladder


def gi_state(wf, wsc):
    from svo_raytracer_tpu.ops import render_wave
    from svo_raytracer_tpu.utils.camera import Camera

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
        schedule=GEN_SCHED, serve_local=False)
    accum, mask, depth, it0, active, rnd = render_wave._gi_init(
        px, py, jnp.asarray(3, jnp.float32), dirs)
    _, _, _, _, active, o2, d2 = render_wave._gi_update(
        True, (), accum, mask, depth, it0, active, origins, dirs, rnd, res1)
    jax.block_until_ready(o2)
    return cam5, origins, dirs, o2, d2, active


for KM in (8, 16):
    try:
        wf = importlib.reload(wfmod)
        wf.KMAX = KM
        wsc = wf.prepare(b0)
        jax.block_until_ready(wsc.attr_comb)
        cam5, origins, dirs, o2, d2, active = gi_state(wf, wsc)

        # primary replay with the generic ladder
        def prim():
            return wf.intersect_wavefront(
                wsc, origins, dirs, camera=(cam5, W, H), cam_block=True,
                schedule=GEN_SCHED, serve_local=False)
        t0 = time.time()
        r = prim()
        jax.block_until_ready(r[0].t)
        out(what="prim_compile_s", kmax=KM, s=round(time.time() - t0, 1))
        t0 = time.time()
        for _ in range(3):
            r = prim()
        jax.block_until_ready(r[0].t)
        out(what="prim_replay", kmax=KM,
            ms=round((time.time() - t0) / 3 * 1e3, 1), n_left=int(r[1]),
            hits=int(jnp.sum(r[0].hit)))

        # serve_local trial: with block-major tiles a bounce tile's rays
        # come from one 32x32-pixel block (a few surface bricks), so the
        # sort-free local round + serve drain may retire most of the
        # segment before any global sort
        def gi_sl():
            return wf.intersect_wavefront(
                wsc, o2, d2, active=active, schedule=(0, 0),
                serve_local=True)
        t0 = time.time()
        r = gi_sl()
        jax.block_until_ready(r[0].t)
        out(what="gi_servelocal_compile_s", kmax=KM,
            s=round(time.time() - t0, 1))
        t0 = time.time()
        for _ in range(3):
            r = gi_sl()
        jax.block_until_ready(r[0].t)
        out(what="gi_servelocal_replay", kmax=KM,
            ms=round((time.time() - t0) / 3 * 1e3, 1), n_left=int(r[1]),
            hits=int(jnp.sum(r[0].hit)))

        cls = (3, 64) if KM == 8 else (64,)
        for cl in cls:
            def gi():
                return wf.intersect_wavefront(
                    wsc, o2, d2, active=active, schedule=GEN_SCHED,
                    serve_local=False, cloop=cl)
            t0 = time.time()
            r = gi()
            jax.block_until_ready(r[0].t)
            out(what="gi_compile_s", kmax=KM, cloop=cl,
                s=round(time.time() - t0, 1))
            t0 = time.time()
            for _ in range(3):
                r = gi()
            jax.block_until_ready(r[0].t)
            out(what="gi_replay", kmax=KM, cloop=cl,
                ms=round((time.time() - t0) / 3 * 1e3, 1),
                n_left=int(r[1]), hits=int(jnp.sum(r[0].hit)))
    except Exception:
        traceback.print_exc()
        out(what="failed", kmax=KM)
    if time.time() > DEADLINE - 900:
        out(what="stop", reason="deadline")
        break
out(what="done")
