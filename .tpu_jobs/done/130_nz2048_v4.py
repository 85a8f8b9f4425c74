"""r4 job 130: the 2048^3 cliff under v4 (VERDICT item 3).

r3 measured 56.9 s per 960x540 GI-1 frame at 2048^3 (0.02 Mrays/s) —
dominated, per the v4 analysis, by the G=64 L0 probe (a 64-row
composite fetch per DDA step).  v4 marches L0 at 2-brick granularity
(8-row probe) and pays the 64-row fetch once per stop.  Gate + steady
GI-1 frame timing on the cached NZ world.
"""
import json
import os
import sys
import time

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from svo_raytracer_tpu.ops import brick_scene, brick_trace  # noqa: E402
from svo_raytracer_tpu.ops import render_wave, wavefront as wf  # noqa
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


CACHE = os.path.join(REPO, ".bench_cache")
bz = np.load(os.path.join(CACHE, "bricks_nz_2048.npz"))
scene = brick_scene.BrickScene(
    world_size=2048, grid_size=64, n_mixed=int(bz["n_mixed"]),
    l0_table=bz["l0_table"], brick_slot=bz["brick_slot"],
    brick_attr=bz["brick_attr"], occ_words=bz["occ_words"],
    attrs=bz["attrs"])
W = wf.prepare(scene)
dscene = scene.to_device()
out(kind="nz2_loaded", n_mixed=W.n_mixed)

rs = np.random.RandomState(7)
n = 4096
o = (rs.rand(n, 3) * 0.9 + 1.05).astype(np.float32)
d = rs.randn(n, 3).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
ref = brick_trace.intersect_bricks(dscene, jnp.asarray(o), jnp.asarray(d))
t0 = time.time()
got = wf.intersect_wavefront(W, jnp.asarray(o), jnp.asarray(d),
                             interpret=False)
rh, gh = np.asarray(ref.hit), np.asarray(got.hit)
agree = float((rh == gh).mean())
both = rh & gh
tok = float((np.abs(np.asarray(ref.t) - np.asarray(got.t))[both]
             <= 2e-4).mean()) if both.any() else 1.0
out(kind="nz2048_v4_gate", hit_agree=round(agree, 5),
    t_ok=round(tok, 5), nhit=int(both.sum()), s=round(time.time() - t0, 1),
    ok=bool(agree >= 0.995 and tok >= 0.98))

# steady GI-1 frames at 960x540 through the frame renderer
pxz = np.stack(np.meshgrid(np.linspace(1.2, 1.8, 5, dtype=np.float32),
                           np.linspace(1.2, 1.8, 5, dtype=np.float32),
                           indexing="ij"), -1).reshape(-1, 2)
po = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                     pxz[:, 1:]], axis=1)
pd = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wf.intersect_wavefront(W, jnp.asarray(po), jnp.asarray(pd))
ts = np.asarray(pr.t)
best = int(np.argmax(ts))
cam = Camera(pos=np.array([po[best, 0],
                           min(1.999 - float(ts[best]) + 0.03, 1.99),
                           po[best, 2]]))
cam.rotate(-0.3, 0.5)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
WD, HT = 960, 540

t0 = time.time()
col, dep, it = render_wave.render_frame_wavefront(W, cam5, WD, HT,
                                                  render_mode=0,
                                                  frame_number=1,
                                                  gi_bounces=1)
jax.block_until_ready(col)
out(kind="nz2048_first_frame_s", s=round(time.time() - t0, 1))
for i in range(2, 5):
    t0 = time.time()
    col, dep, it = render_wave.render_frame_wavefront(W, cam5, WD, HT,
                                                      render_mode=0,
                                                      frame_number=i,
                                                      gi_bounces=1)
    jax.block_until_ready(col)
    out(kind="nz2048_warm_frame", i=i, s=round(time.time() - t0, 2))
t0 = time.time()
reps = 3
for i in range(reps):
    col, dep, it = render_wave.render_frame_wavefront(W, cam5, WD, HT,
                                                      render_mode=0,
                                                      frame_number=2 + i,
                                                      gi_bounces=1)
jax.block_until_ready(col)
dt = (time.time() - t0) / reps
out(kind="nz2048_steady_gi1_v4", frame_ms=round(dt * 1e3, 1),
    mrays=round(2 * WD * HT / dt / 1e6, 3),
    residue=dict(render_wave.last_residue),
    mean=round(float(jnp.mean(col)), 4))
out(kind="done")
