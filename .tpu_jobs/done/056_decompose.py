"""Decompose wavefront v2 costs on the real scene with a REAL (surface)
camera: kernel while-vs-fori, sort-stage parts, end-to-end rounds.
"""
import sys as _sys
for _m in [m for m in _sys.modules if m.startswith("svo_raytracer_tpu")]:
    del _sys.modules[_m]

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, REPO)
from svo_raytracer_tpu.ops import brick_scene, brick_trace, shade
from svo_raytracer_tpu.ops import wavefront as wf
from svo_raytracer_tpu.utils.camera import Camera

f32, i32 = jnp.float32, jnp.int32


def out(**kw):
    print(json.dumps(kw), flush=True)


CACHE = os.path.join(REPO, ".bench_cache")
b = np.load(os.path.join(CACHE, "bricks_1024.npz"))
scene_h = brick_scene.BrickScene(
    world_size=1024, grid_size=32, n_mixed=int(b["n_mixed"]),
    l0_table=b["l0_table"], brick_slot=b["brick_slot"],
    brick_attr=b["brick_attr"], occ_words=b["occ_words"], attrs=b["attrs"])
W = wf.prepare(scene_h)
jax.block_until_ready(W.attr_comb)
out(kind="prepared", capacity=W.capacity)

# ---- surface camera (like bench.py, via the wavefront itself) -----------
gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
probe_o = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                          pxz[:, 1:]], axis=1)
probe_d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
probe = wf.intersect_wavefront(W, jnp.asarray(probe_o),
                               jnp.asarray(probe_d), interpret=False)
ts = np.asarray(probe.t)
best = int(np.argmax(ts))
surf_y = 1.999 - float(ts[best])
cam = Camera(pos=np.array([probe_o[best, 0], min(surf_y + 0.05, 1.99),
                           probe_o[best, 2]]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
out(kind="camera", y=round(cam.pos[1], 3), surf=round(surf_y, 3))

WD, HT = 1920, 1080
B = WD * HT
dirs_un = shade.pixel_dirs_device(cam5, WD, HT)
dirs = dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True)
origins = jnp.broadcast_to(cam5[0], dirs.shape)
jax.block_until_ready(dirs)

# ---- B: round-0 kernel, while vs fori -----------------------------------
st0 = wf._init_state(origins, dirs, jnp.ones(B, bool), 1024, B)
S = st0[0].shape[0]
none = jnp.full((S // wf.TILE, wf.KMAX), -1, i32)

for early in (True, False):
    st = wf._run_kernel(none, none, W.l0_occ, W.l0_mixed, W.occ_words, st0,
                        G=32, NM=W.capacity, inner_cap=100, l0_cap=100,
                        early_exit=early, interpret=False)
    _ = float(jnp.sum(st[0]))
    t0 = time.time()
    for _i in range(3):
        st = wf._run_kernel(none, none, W.l0_occ, W.l0_mixed, W.occ_words,
                            st0, G=32, NM=W.capacity, inner_cap=100,
                            l0_cap=100, early_exit=early, interpret=False)
    chk = float(jnp.sum(st[0].astype(f32)))
    out(kind="r0_kernel", early=early,
        ms=round((time.time() - t0) / 3 * 1e3, 1),
        active=int(jnp.sum((st[0] != wf.KEY_DONE).astype(f32))))

# keep the post-round-0 state for stage decomposition
state1 = st

# ---- C: sort-stage decomposition at full size ----------------------------
f_sort12 = jax.jit(lambda s: jax.lax.sort(s, num_keys=1))
x = f_sort12(state1)
_ = float(jnp.sum(x[0]))
t0 = time.time()
for _i in range(3):
    x = f_sort12(state1)
_ = float(jnp.sum(x[0]))
out(kind="sort12", B=S, ms=round((time.time() - t0) / 3 * 1e3, 1))

f_sort1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
y = f_sort1(state1[0])
_ = float(jnp.sum(y))
t0 = time.time()
for _i in range(3):
    y = f_sort1(state1[0])
_ = float(jnp.sum(y))
out(kind="sort1", B=S, ms=round((time.time() - t0) / 3 * 1e3, 1))

r = wf._sort_stage(state1, W.brick_slot)
_ = float(r[3])
t0 = time.time()
for _i in range(3):
    r = wf._sort_stage(state1, W.brick_slot)
n1 = int(r[3])
out(kind="sort_stage", B=S, ms=round((time.time() - t0) / 3 * 1e3, 1),
    active_after_r0=n1)

# ---- D: end-to-end primary with per-round profile -------------------------
prof = {}
res = wf.intersect_wavefront(W, origins, dirs, interpret=False, profile=prof)
nh = float(jnp.sum(res.hit.astype(f32)))
out(kind="first_frame_hitfrac", hitfrac=round(nh / B, 4))
for rr in prof["rounds"]:
    out(kind="round_profile", **rr)

t0 = time.time()
for _i in range(3):
    res = wf.intersect_wavefront(W, origins, dirs, interpret=False)
nh = float(jnp.sum(res.hit.astype(f32)))
dt = (time.time() - t0) / 3
out(kind="primary", B=B, ms=round(dt * 1e3, 1), mrays=round(B / dt / 1e6, 1),
    hitfrac=round(nh / B, 4))

# sanity vs oracle on the real camera
scene_dev = scene_h.to_device()
idx = np.random.default_rng(0).integers(0, B, 2048)
o_s = origins[idx]
d_s = dirs[idx]
ref = brick_trace.intersect_bricks(scene_dev, o_s, d_s)
got = jax.tree.map(lambda a: a[idx], res)
agree = float(jnp.mean((ref.hit == got.hit).astype(f32)))
both = ref.hit & got.hit
tdiff = float(jnp.max(jnp.where(both, jnp.abs(ref.t - got.t), 0.0)))
out(kind="sanity", hit_agree=round(agree, 4), max_tdiff=round(tdiff, 6))
del scene_dev

# ---- E: GI frame ----------------------------------------------------------
from svo_raytracer_tpu.ops import render_wave

col, depth, iters = render_wave.render_frame_wavefront(
    W, cam5, WD, HT, render_mode=0, frame_number=1, gi_bounces=1,
    interpret=False)
c0 = float(jnp.sum(col))
t0 = time.time()
for i in range(3):
    col, depth, iters = render_wave.render_frame_wavefront(
        W, cam5, WD, HT, render_mode=0, frame_number=i + 2, gi_bounces=1,
        interpret=False)
c0 = float(jnp.sum(col))
dt = (time.time() - t0) / 3
out(kind="gi_frame", ms=round(dt * 1e3, 1),
    mrays=round(2 * B / dt / 1e6, 1), chk=round(c0, 1))
