"""v3 wavefront: camera-mode 5-op sort + static-schedule replay.

A: compiled-parity gate vs brick_trace (8192 random rays).
B: camera-mode dynamic primary (discovery) on the hard camera.
C: static replay of B (single dispatch) x3.
D: GI 2-seg frames through render_frame_wavefront use_static.
"""
import sys as _sys
for _m in [m for m in _sys.modules if m.startswith("svo_raytracer_tpu")]:
    del _sys.modules[_m]
import json, os, sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, REPO)
from svo_raytracer_tpu.ops import brick_scene, brick_trace, shade
from svo_raytracer_tpu.ops import wavefront as wf
from svo_raytracer_tpu.ops import render_wave
from svo_raytracer_tpu.utils.camera import Camera
f32 = jnp.float32
def out(**kw): print(json.dumps(kw), flush=True)
CACHE = os.path.join(REPO, ".bench_cache")
b = np.load(os.path.join(CACHE, "bricks_1024.npz"))
scene_h = brick_scene.BrickScene(world_size=1024, grid_size=32,
    n_mixed=int(b["n_mixed"]), l0_table=b["l0_table"],
    brick_slot=b["brick_slot"], brick_attr=b["brick_attr"],
    occ_words=b["occ_words"], attrs=b["attrs"])
W = wf.prepare(scene_h)
jax.block_until_ready(W.attr_comb)
dscene = scene_h.to_device()

# ---- A: compiled parity gate (also the round's Pallas regression gate)
rs = np.random.RandomState(31)
n = 8192
o = (rs.rand(n, 3) * 0.9 + 1.05).astype(np.float32)
d = rs.randn(n, 3).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
ref = brick_trace.intersect_bricks(dscene, jnp.asarray(o), jnp.asarray(d))
got = wf.intersect_wavefront(W, jnp.asarray(o), jnp.asarray(d),
                             interpret=False)
rh, gh = np.asarray(ref.hit), np.asarray(got.hit)
agree = float((rh == gh).mean())
both = rh & gh
tok = float((np.abs(np.asarray(ref.t) - np.asarray(got.t))[both]
             <= 2e-4).mean()) if both.any() else 1.0
vok = float((np.asarray(ref.value)[both]
             == np.asarray(got.value)[both]).mean()) if both.any() else 1.0
out(kind="gate", hit_agree=round(agree, 5), t_ok=round(tok, 5),
    v_ok=round(vok, 5), nhit=int(both.sum()))

# ---- hard camera (same as 058/060)
gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
po = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                     pxz[:, 1:]], axis=1)
pd = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wf.intersect_wavefront(W, jnp.asarray(po), jnp.asarray(pd),
                            interpret=False)
ts = np.asarray(pr.t); best = int(np.argmax(ts)); surf = 1.999 - float(ts[best])
cam = Camera(pos=np.array([po[best, 0], min(surf + 0.05, 1.99), po[best, 2]]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
out(kind="camera", y=round(cam.pos[1], 4))
WD, HT = 1920, 1080
B = WD * HT
du = shade.pixel_dirs_device(cam5, WD, HT)
dirs = du / jnp.linalg.norm(du, axis=-1, keepdims=True)
origins = jnp.broadcast_to(cam5[0], dirs.shape)
jax.block_until_ready(dirs)

# ---- B: camera-mode dynamic primary (discovery)
prof = {}
res = wf.intersect_wavefront(W, origins, dirs, camera=(cam5, WD, HT),
                             interpret=False, profile=prof,
                             schedule_slack=1)
nh_dyn = float(jnp.sum(res.hit.astype(f32)))
t0 = time.time()
for _i in range(3):
    res = wf.intersect_wavefront(W, origins, dirs, camera=(cam5, WD, HT),
                                 interpret=False)
jax.block_until_ready(res.t)
dt = (time.time() - t0) / 3
out(kind="primary_cam_dyn", ms=round(dt * 1e3, 1),
    mrays=round(B / dt / 1e6, 1), hitfrac=round(nh_dyn / B, 4),
    rounds=len(prof["schedule"]))
sched = prof["schedule"]
out(kind="schedule", sched=list(sched))

# ---- C: static replay (single dispatch)
t0 = time.time()
res_s, n_left = wf.intersect_wavefront(W, origins, dirs,
                                       camera=(cam5, WD, HT),
                                       interpret=False, schedule=sched)
jax.block_until_ready(res_s.t)
out(kind="static_compile", s=round(time.time() - t0, 1),
    n_left=int(n_left))
nh_st = float(jnp.sum(res_s.hit.astype(f32)))
t0 = time.time()
for _i in range(3):
    res_s, n_left = wf.intersect_wavefront(W, origins, dirs,
                                           camera=(cam5, WD, HT),
                                           interpret=False, schedule=sched)
jax.block_until_ready(res_s.t)
dt = (time.time() - t0) / 3
out(kind="primary_static", ms=round(dt * 1e3, 1),
    mrays=round(B / dt / 1e6, 1), hitfrac=round(nh_st / B, 4),
    match_dyn=bool(abs(nh_st - nh_dyn) < 1))

# ---- D: GI 2-seg frames, static replay path
col, d_, it_ = render_wave.render_frame_wavefront(
    W, cam5, WD, HT, render_mode=0, frame_number=1, gi_bounces=1,
    interpret=False)
_ = float(jnp.sum(col))
t0 = time.time()
col, d_, it_ = render_wave.render_frame_wavefront(
    W, cam5, WD, HT, render_mode=0, frame_number=2, gi_bounces=1,
    interpret=False)
_ = float(jnp.sum(col))
out(kind="gi_frame2_static_compile", s=round(time.time() - t0, 1))
t0 = time.time()
for i in range(3):
    col, d_, it_ = render_wave.render_frame_wavefront(
        W, cam5, WD, HT, render_mode=0, frame_number=i + 3, gi_bounces=1,
        interpret=False)
_ = float(jnp.sum(col))
dt = (time.time() - t0) / 3
out(kind="gi_frame", ms=round(dt * 1e3, 1),
    mrays=round(2 * B / dt / 1e6, 1))
