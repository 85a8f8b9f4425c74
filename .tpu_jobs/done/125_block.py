"""r4 job 125: v4 + prediction + presence-gated probes + block-major
frames, measured through the REAL bench path (render_frame_wavefront).

120 takeaways: prediction cut primary rounds 9->5 but the ungated
KMAX-merged probes made rounds pricier (replay 240 ms).  This job has
(a) per-candidate lax.cond probe gating, (b) 32x32-pixel block-major
frame order (local-round tiles cover compact blocks).
"""
import json
import sys
import time

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from svo_raytracer_tpu.ops import brick_trace, render_wave  # noqa: E402
from svo_raytracer_tpu.ops import wavefront as wf  # noqa: E402
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


tree, _ = bench.build_scene(1024, 512)
b0 = bench.build_brick_scene(tree, 1024)
W, H = 1920, 1080
wsc = wf.prepare(b0)
jax.block_until_ready(wsc.attr_comb)

# quick compiled gate
rng = np.random.default_rng(42)
n = 2048
o = (1.0 + rng.random((n, 3)) * 0.999).astype(np.float32)
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
got = wf.intersect_wavefront(wsc, jnp.asarray(o), jnp.asarray(d))
ref = brick_trace.intersect_bricks(b0.to_device(), jnp.asarray(o),
                                   jnp.asarray(d))
out(what="gate", hit_agree=round(
    float((np.asarray(got.hit) == np.asarray(ref.hit)).mean()), 4))

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


def frame(i, bounces=1):
    c, dep, it = render_wave.render_frame_wavefront(
        wsc, cam5, W, H, render_mode=0, frame_number=i, gi_bounces=bounces)
    return c


t0 = time.time()
col = frame(1)
jax.block_until_ready(col)
out(what="first_frame_s", s=round(time.time() - t0, 1))
for i in range(2, 7):
    t0 = time.time()
    jax.block_until_ready(frame(i))
    out(what="warm_frame", i=i, s=round(time.time() - t0, 2))
t0 = time.time()
for i in range(2, 7):
    col = frame(i)
jax.block_until_ready(col)
dt = (time.time() - t0) / 5
out(what="steady_gi1", frame_ms=round(dt * 1e3, 1),
    mrays=round(2 * W * H / dt / 1e6, 2),
    residue=dict(render_wave.last_residue))

# segment replays for the diagnosis ledger
origins, dirs, px, py = render_wave._frame_rays(cam5, W, H)
Bp = origins.shape[0]
for tag in ("prim", "gi1"):
    key = render_wave._sched_key(wsc, tag, Bp)
    if key not in render_wave._SCHED:
        out(what="no_sched", tag=tag)
        continue
    sched = render_wave._SCHED[key][0]
    if tag == "prim":
        def run():
            return wf.intersect_wavefront(
                wsc, origins, dirs, camera=(cam5, W, H), cam_block=True,
                schedule=sched, serve_local=False)
    else:
        res1, _ = wf.intersect_wavefront(
            wsc, origins, dirs, camera=(cam5, W, H), cam_block=True,
            schedule=render_wave._SCHED[render_wave._sched_key(
                wsc, "prim", Bp)][0], serve_local=False)
        accum, mask, depth, it0, active, rnd = render_wave._gi_init(
            px, py, jnp.asarray(3, jnp.float32), dirs)
        _, _, _, _, active, o2, d2 = render_wave._gi_update(
            True, (), accum, mask, depth, it0, active, origins, dirs, rnd,
            res1)
        jax.block_until_ready(o2)

        def run():
            return wf.intersect_wavefront(
                wsc, o2, d2, active=active, schedule=sched,
                serve_local=False)
    r = run()
    jax.block_until_ready(r[0].t)
    t0 = time.time()
    for _ in range(3):
        r = run()
    jax.block_until_ready(r[0].t)
    out(what=f"{tag}_replay", rounds=len(sched),
        ms=round((time.time() - t0) / 3 * 1e3, 1), n_left=int(r[1]))

render_wave.save_schedules(REPO + "/.bench_cache/wave_schedules.json")
out(what="done")
