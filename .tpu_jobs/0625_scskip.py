"""Supercell-skip A/B on the primary trace + fused GI with extra=0
(062's fused section accidentally ran extra=2, a measured loss)."""
import sys as _sys
for _m in [m for m in _sys.modules if m.startswith("svo_raytracer_tpu")]:
    del _sys.modules[_m]
import json, os, sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, REPO)
from svo_raytracer_tpu.ops import brick_scene, shade
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
WD, HT = 1920, 1080
B = WD * HT
du = shade.pixel_dirs_device(cam5, WD, HT)
dirs = du / jnp.linalg.norm(du, axis=-1, keepdims=True)
origins = jnp.broadcast_to(cam5[0], dirs.shape)
jax.block_until_ready(dirs)

ref_hits = None
for sc in (True, False):
    prof = {}
    t0 = time.time()
    res = wf.intersect_wavefront(W, origins, dirs, camera=(cam5, WD, HT),
                                 interpret=False, profile=prof,
                                 schedule_slack=1, sc_skip=sc)
    nh = float(jnp.sum(res.hit.astype(f32)))
    comp = time.time() - t0
    if ref_hits is None:
        ref_hits = nh
    sched = prof["schedule"]
    t0 = time.time()
    res_s, n_left = wf.intersect_wavefront(
        W, origins, dirs, camera=(cam5, WD, HT), interpret=False,
        schedule=sched, sc_skip=sc)
    jax.block_until_ready(res_s.t)
    comp2 = time.time() - t0
    t0 = time.time()
    for _i in range(3):
        res_s, n_left = wf.intersect_wavefront(
            W, origins, dirs, camera=(cam5, WD, HT), interpret=False,
            schedule=sched, sc_skip=sc)
    jax.block_until_ready(res_s.t)
    dt = (time.time() - t0) / 3
    out(kind="prim_static_sc", sc=sc, ms=round(dt * 1e3, 1),
        mrays=round(B / dt / 1e6, 1), rounds=len(sched),
        n_left=int(n_left), comp_s=round(comp + comp2, 1),
        dhit=int(nh - ref_hits))

# fused GI, extra=0, sc on — warm the EXACT frame numbers later timed
render_wave._SCHED.clear()
for fn in (1, 2, 3, 4, 5):
    t0 = time.time()
    col, d_, it_ = render_wave.render_frame_wavefront(
        W, cam5, WD, HT, render_mode=0, frame_number=fn, gi_bounces=1,
        interpret=False)
    _ = float(jnp.sum(col))
    out(kind=f"gi_warm{fn}", s=round(time.time() - t0, 1))
t0 = time.time()
n_f = 4
for i in range(n_f):
    col, d_, it_ = render_wave.render_frame_wavefront(
        W, cam5, WD, HT, render_mode=0, frame_number=i + 2, gi_bounces=1,
        interpret=False)
_ = float(jnp.sum(col))
dt = (time.time() - t0) / n_f
out(kind="gi_frame_sc", ms=round(dt * 1e3, 1),
    mrays=round(2 * B / dt / 1e6, 1))

for fn in (1, 2, 3, 4):
    col, d_, it_ = render_wave.render_frame_wavefront(
        W, cam5, WD, HT, render_mode=0, frame_number=fn, gi_bounces=3,
        interpret=False)
    _ = float(jnp.sum(col))
t0 = time.time()
for i in range(3):
    col, d_, it_ = render_wave.render_frame_wavefront(
        W, cam5, WD, HT, render_mode=0, frame_number=i + 2, gi_bounces=3,
        interpret=False)
_ = float(jnp.sum(col))
dt = (time.time() - t0) / 3
out(kind="gi3_frame_sc", ms=round(dt * 1e3, 1),
    mrays=round(4 * B / dt / 1e6, 1))
