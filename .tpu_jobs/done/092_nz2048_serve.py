"""Compiled validation of the G=64 serve path: the 074 renders of the
2048^3 NZ world predate the serve loop, so the word-DMA cell->slot
lookup (ops/wavefront._slot_of, G>32 branch) has only ever run in
interpret mode.  Renders the cached NZ world through the CURRENT engine
and cross-checks hits against the XLA brick oracle."""
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
from svo_raytracer_tpu.io.image import write_png  # noqa: E402
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

# oracle cross-check on random interior rays (compiled serve, G=64)
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
out(kind="nz2048_serve_gate", hit_agree=round(agree, 5),
    t_ok=round(tok, 5), nhit=int(both.sum()), s=round(time.time() - t0, 1),
    ok=bool(agree >= 0.995 and tok >= 0.98))

# camera render through the current fast path
pxz = np.stack(np.meshgrid(np.linspace(1.2, 1.8, 5, dtype=np.float32),
                           np.linspace(1.2, 1.8, 5, dtype=np.float32),
                           indexing="ij"), -1).reshape(-1, 2)
po = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                     pxz[:, 1:]], axis=1)
pd = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wf.intersect_wavefront(W, jnp.asarray(po), jnp.asarray(pd))
ts = np.asarray(pr.t)
best = int(np.argsort(ts)[len(ts) // 2])
cam = Camera(pos=np.array([po[best, 0],
                           min(1.999 - float(ts[best]) + 0.08, 1.99),
                           po[best, 2]]))
cam.rotate(-0.25, 0.5)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
for mode, name in ((2, "nz2048_direct_r3"), (0, "nz2048_gi_r3")):
    t0 = time.time()
    col, _, _ = render_wave.render_frame_wavefront(
        W, cam5, 960, 540, render_mode=mode, frame_number=3, gi_bounces=1)
    c = np.clip(np.asarray(col), 0, 1)
    out(kind=f"{name}", s=round(time.time() - t0, 1),
        mean=round(float(c.mean()), 4))
    write_png(os.path.join(REPO, "assets", "renders", f"{name}.png"), c)
# steady frame time at 960x540 (schedules recorded above)
t0 = time.time()
for k in range(4, 8):
    col, _, _ = render_wave.render_frame_wavefront(
        W, cam5, 960, 540, render_mode=0, frame_number=k, gi_bounces=1)
col.block_until_ready()
dt = (time.time() - t0) / 4
out(kind="nz2048_steady_gi1", frame_ms=round(dt * 1e3, 1),
    mrays=round(2 * 960 * 540 / dt / 1e6, 2))
