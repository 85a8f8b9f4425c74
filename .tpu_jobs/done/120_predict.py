"""r4 job 120: v4 + round-0 fix + predictive candidates, on-chip.

Measures (1024^3 bench scene, 1080p):
  a. compiled gate (random rays) — prediction changes tables, re-gate;
  b. primary + gi-1: discovery rounds, replay time, per-round actives;
  c. stage split at full size: jitted sort+tables vs whole round
     (how much of a round is the 11-op sort + prediction march now);
  d. PREDICT=False A/B on the same segments (module reload).
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


def seg_suite(wf, tag, deadline_pad=600):
    from svo_raytracer_tpu.ops import brick_trace, render_wave
    from svo_raytracer_tpu.utils.camera import Camera

    wsc = wf.prepare(b0)
    jax.block_until_ready(wsc.attr_comb)

    rng = np.random.default_rng(42)
    n = 2048
    o = (1.0 + rng.random((n, 3)) * 0.999).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    got = wf.intersect_wavefront(wsc, jnp.asarray(o), jnp.asarray(d))
    ref = brick_trace.intersect_bricks(b0.to_device(), jnp.asarray(o),
                                       jnp.asarray(d))
    agree = float((np.asarray(got.hit) == np.asarray(ref.hit)).mean())
    out(what="gate", tag=tag, hit_agree=round(agree, 4),
        hits=int(np.asarray(got.hit).sum()))

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
        n_left=int(rr[1]),
        actives=[r.get("active") for r in prof.get("rounds", [])])

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
        n_left=int(rr[1]),
        actives=[r.get("active") for r in prof.get("rounds", [])])

    # ---- stage split at full size (explicit mode, gi rays) -----------
    state = wf._init_state(o2, d2, active, 1024, W * H)
    occ_flat = jax.jit(wf._cell_occ_flat, static_argnums=1)(
        wsc.l0_occ, wsc.grid_size)

    sort_pred = jax.jit(lambda st: wf._sort_stage(st, wsc.brick_slot,
                                                  occ_flat, None,
                                                  cam_dims=None))
    sort_plain = jax.jit(lambda st: wf._sort_stage(st, wsc.brick_slot))

    def t_of(fn, reps=5):
        r = fn(state)
        jax.block_until_ready(r[1])
        t0 = time.time()
        for _ in range(reps):
            r = fn(state)
        jax.block_until_ready(r[1])
        return (time.time() - t0) / reps

    out(what="stage_sort_plain_ms", tag=tag,
        ms=round(t_of(sort_plain) * 1e3, 2))
    out(what="stage_sort_predict_ms", tag=tag,
        ms=round(t_of(sort_pred) * 1e3, 2))
    return cam5


for tag, pred in (("pred", True), ("nopred", False)):
    try:
        wf = importlib.reload(wfmod)
        wf.PREDICT = pred
        seg_suite(wf, tag)
    except Exception:
        traceback.print_exc()
        out(what="failed", tag=tag)
    if time.time() > DEADLINE - 900:
        out(what="stop", reason="deadline")
        break
out(what="done")
