"""r5 job 210: candidate-coverage sweep — KMAX x OCT_SORT (VERDICT r5
item 1a).  Can wide COVERED candidate sets + direction-octant sort keys
collapse the gi ladder to ~2-4 rounds?

Replay-only segment measurements (no recorded schedules): prim with the
generic 8-round ladder, gi with BOTH the generic ladder and a short
4-round ladder (final round serve-drains, so short ladders complete and
their time shows what coverage buys).  Also times _sort_stage alone at
full gi size (the per-round sort+tables term).  Module reloaded per
config (stale shape-keyed jit caches crash the chip, CLAUDE.md).
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
GEN_SCHED = (0, 0, 1, 1, 1, 1, 2, 2)
SHORT_SCHED = (0, 0, 1, 1)


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


def timed(f, n=3):
    t0 = time.time()
    r = f()
    jax.block_until_ready(r[0].t)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r[0].t)
    return r, round((time.time() - t0) / n * 1e3, 1), round(compile_s, 1)


# (KMAX, OCT) ladder: in-job baseline first (this config is dfield-ON
# current code — job 200's 685 ms baseline was the pre-dfield module)
for KM, OCT in ((8, 0), (16, 1), (8, 1), (32, 1)):
    if time.time() > DEADLINE - 1200:
        out(what="stop", reason="deadline")
        break
    try:
        wf = importlib.reload(wfmod)
        wf.KMAX = KM
        wf.OCT_SORT = bool(OCT)
        wsc = wf.prepare(b0)
        jax.block_until_ready(wsc.attr_comb)
        cam5, origins, dirs, o2, d2, active = gi_state(wf, wsc)

        r, ms, cs = timed(lambda: wf.intersect_wavefront(
            wsc, origins, dirs, camera=(cam5, W, H), cam_block=True,
            schedule=GEN_SCHED, serve_local=False))
        out(what="prim", kmax=KM, oct=OCT, ms=ms, compile_s=cs,
            n_left=int(r[1]), hits=int(jnp.sum(r[0].hit)))

        for tag, sched in (("gi_gen", GEN_SCHED), ("gi_short", SHORT_SCHED)):
            r, ms, cs = timed(lambda: wf.intersect_wavefront(
                wsc, o2, d2, active=active, schedule=sched,
                serve_local=False, cloop=64))
            out(what=tag, kmax=KM, oct=OCT, ms=ms, compile_s=cs,
                n_left=int(r[1]), hits=int(jnp.sum(r[0].hit)))

        # per-round sort+tables cost at full gi size (explicit mode:
        # 11 sorted operands; ws in voxels, G = brick-grid size)
        B = o2.shape[0]
        state = wf._init_state(o2, d2, active, 1024, B)
        st = wf._sort_stage(state, wsc.brick_slot, G=32,
                            predict=wf.PREDICT)
        jax.block_until_ready(st[0])
        t0 = time.time()
        for _ in range(10):
            st = wf._sort_stage(state, wsc.brick_slot, G=32,
                                predict=wf.PREDICT)
        jax.block_until_ready(st[0])
        out(what="sort_stage", kmax=KM, oct=OCT, B=int(B),
            ms=round((time.time() - t0) / 10 * 1e3, 2))
    except Exception:
        traceback.print_exc()
        out(what="failed", kmax=KM, oct=OCT)
out(what="done")
