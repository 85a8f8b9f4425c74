"""Continuation-kernel sweep: cont in {1,2,3,4}, per-round stage timing,
GI frame at the best setting.
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
from svo_raytracer_tpu.ops import brick_scene, shade
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

cam = Camera(pos=np.array([1.2, 1.399, 1.2]))
cam.rotate(-0.35, 0.4)
# NOTE: probe for the real surface under THIS column
probe_o = np.asarray([[1.2, 1.999, 1.2]], np.float32)
probe_d = np.asarray([[0.0, -1.0, 0.0]], np.float32)
pr = wf.intersect_wavefront(W, jnp.asarray(probe_o), jnp.asarray(probe_d),
                            interpret=False)
surf_y = 1.999 - float(pr.t[0])
cam = Camera(pos=np.array([1.2, min(surf_y + 0.05, 1.99), 1.2]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
out(kind="camera", y=round(cam.pos[1], 4), surf=round(surf_y, 4))

WD, HT = 1920, 1080
B = WD * HT
dirs_un = shade.pixel_dirs_device(cam5, WD, HT)
dirs = dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True)
origins = jnp.broadcast_to(cam5[0], dirs.shape)
jax.block_until_ready(dirs)

best = (None, 1e9)
for cont in (1, 2, 3, 4):
    prof = {}
    t0 = time.time()
    res = wf.intersect_wavefront(W, origins, dirs, interpret=False,
                                 cont=cont, profile=prof)
    nh = float(jnp.sum(res.hit.astype(f32)))
    c_s = time.time() - t0
    t0 = time.time()
    for _i in range(3):
        res = wf.intersect_wavefront(W, origins, dirs, interpret=False,
                                     cont=cont)
    nh = float(jnp.sum(res.hit.astype(f32)))
    dt = (time.time() - t0) / 3
    rounds = len(prof["rounds"])
    out(kind="primary_cont", cont=cont, compile_s=round(c_s, 1),
        ms=round(dt * 1e3, 1), mrays=round(B / dt / 1e6, 1), rounds=rounds,
        hitfrac=round(nh / B, 4),
        actives=[r["active"] for r in prof["rounds"]])
    if dt < best[1]:
        best = (cont, dt)

CONT = best[0]
out(kind="best_cont", cont=CONT)

# per-round stage timing at best cont
state = wf._init_state(origins, dirs, jnp.ones(B, bool), 1024, B)
S = state[0].shape[0]
none = jnp.full((S // wf.TILE, wf.KMAX), -1, i32)
t0 = time.time()
state = wf._run_kernel(none, none, W.l0_occ, W.l0_mixed, W.occ_words, state,
                       G=32, NM=W.capacity, inner_cap=100, l0_cap=100,
                       early_exit=True, interpret=False)
jax.block_until_ready(state[0])
out(kind="st_r0", ms=round((time.time() - t0) * 1e3, 1))
ovox = jnp.full((B + 1,), -1, i32)
oaidx = jnp.zeros((B + 1,), i32)
ot = jnp.zeros((B + 1,), f32)
oit = jnp.zeros((B + 1,), i32)
for r in range(1, 10):
    t0 = time.time()
    state, tslot, tcell, n_act = wf._sort_stage(state, W.brick_slot)
    n = int(n_act)
    t_sort = time.time() - t0
    if n == 0:
        break
    t0 = time.time()
    nslice = 0
    while (tslot.shape[0] + 1) // 2 >= max(-(-n // wf.TILE), 64) \
            and tslot.shape[0] > 64:
        state, tail, tslot, tcell = wf._slice_half(state, tslot, tcell)
        ovox, oaidx, ot, oit = wf._harvest(tail[7], tail[8], tail[9],
                                           tail[10], ovox, oaidx, ot, oit,
                                           tail[11])
        nslice += 1
    jax.block_until_ready(state[0])
    t_slice = time.time() - t0
    t0 = time.time()
    state = wf._run_kernel(tslot, tcell, W.l0_occ, W.l0_mixed, W.occ_words,
                           state, G=32, NM=W.capacity, inner_cap=100,
                           l0_cap=100, early_exit=True, interpret=False,
                           cont=CONT)
    jax.block_until_ready(state[0])
    t_kern = time.time() - t0
    out(kind="st_round", r=r, active=n, tiles=int(tslot.shape[0]),
        nslice=nslice, sort_ms=round(t_sort * 1e3, 1),
        slice_ms=round(t_slice * 1e3, 1), kern_ms=round(t_kern * 1e3, 1))

# GI frame
from svo_raytracer_tpu.ops import render_wave

col, d_, it_ = render_wave.render_frame_wavefront(
    W, cam5, WD, HT, render_mode=0, frame_number=1, gi_bounces=1,
    interpret=False)
_ = float(jnp.sum(col))
t0 = time.time()
for i in range(3):
    col, d_, it_ = render_wave.render_frame_wavefront(
        W, cam5, WD, HT, render_mode=0, frame_number=i + 2, gi_bounces=1,
        interpret=False)
_ = float(jnp.sum(col))
dt = (time.time() - t0) / 3
out(kind="gi_frame", ms=round(dt * 1e3, 1),
    mrays=round(2 * B / dt / 1e6, 1))

# 3-bounce
col, d_, it_ = render_wave.render_frame_wavefront(
    W, cam5, WD, HT, render_mode=0, frame_number=1, gi_bounces=3,
    interpret=False)
_ = float(jnp.sum(col))
t0 = time.time()
for i in range(3):
    col, d_, it_ = render_wave.render_frame_wavefront(
        W, cam5, WD, HT, render_mode=0, frame_number=i + 2, gi_bounces=3,
        interpret=False)
_ = float(jnp.sum(col))
dt = (time.time() - t0) / 3
out(kind="gi3_frame", ms=round(dt * 1e3, 1),
    mrays=round(4 * B / dt / 1e6, 1))
