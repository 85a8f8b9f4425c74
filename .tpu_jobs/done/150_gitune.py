"""r4 job 150: gi-segment final tune — GATE_REFINE x cloop, with a REAL
discovered schedule (the 135 generic ladder stranded 50-100 K rays, so
its absolute numbers were invalid).

One discovery on the current config; its schedule replayed across
configs (same KMAX => no reload needed for cloop; GATE_REFINE is read
inside _dda_cr at trace time, so a fresh jit cache per setting is
needed -> module reload per GATE_REFINE value).
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


def mk_state(wf, wsc):
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
        schedule=(0, 0, 1, 1, 1, 1, 2, 2), serve_local=False)
    accum, mask, depth, it0, active, rnd = render_wave._gi_init(
        px, py, jnp.asarray(3, jnp.float32), dirs)
    _, _, _, _, active, o2, d2 = render_wave._gi_update(
        True, (), accum, mask, depth, it0, active, origins, dirs, rnd, res1)
    jax.block_until_ready(o2)
    return o2, d2, active


# discovery on current defaults (GATE_REFINE=True, cloop default)
wf = importlib.reload(wfmod)
wsc = wf.prepare(b0)
jax.block_until_ready(wsc.attr_comb)
o2, d2, active = mk_state(wf, wsc)
prof = {}
t0 = time.time()
r = wf.intersect_wavefront(wsc, o2, d2, active=active, profile=prof,
                           serve_local=False)
jax.block_until_ready(r.t)
SCHED = prof["schedule"]
out(what="gi_disc", s=round(time.time() - t0, 1), rounds=len(SCHED),
    sched=list(SCHED))

for gate_ref in (True, False):
    try:
        wf = importlib.reload(wfmod)
        wf.GATE_REFINE = gate_ref
        wsc = wf.prepare(b0)
        jax.block_until_ready(wsc.attr_comb)
        o2, d2, active = mk_state(wf, wsc)
        for cl in ((64, 12) if gate_ref else (64,)):
            def gi():
                return wf.intersect_wavefront(
                    wsc, o2, d2, active=active, schedule=SCHED,
                    serve_local=False, cloop=cl)
            t0 = time.time()
            r = gi()
            jax.block_until_ready(r[0].t)
            out(what="gi_compile", gate=gate_ref, cloop=cl,
                s=round(time.time() - t0, 1))
            t0 = time.time()
            for _ in range(3):
                r = gi()
            jax.block_until_ready(r[0].t)
            out(what="gi_replay", gate=gate_ref, cloop=cl,
                ms=round((time.time() - t0) / 3 * 1e3, 1),
                n_left=int(r[1]), hits=int(jnp.sum(r[0].hit)))
    except Exception:
        traceback.print_exc()
        out(what="failed", gate=gate_ref)
    if time.time() > DEADLINE - 900:
        out(what="stop")
        break
out(what="done")
