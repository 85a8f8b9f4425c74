"""Wavefront v2 on the real 1024^3 terrain: correctness sanity, steady
frame time, per-round stage timings, and a 2-segment GI frame.

Timing pattern: module-level loops + final dependent scalar readback
(041 showed in-function timeit with block_until_ready reports fake
numbers through the axon tunnel).
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, REPO)
from svo_raytracer_tpu.core.octree import Octree
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
t0 = time.time()
attrs_np = np.asarray(scene_h.attrs).reshape(-1).astype(np.int32)
comb = np.concatenate([attrs_np, np.asarray(scene_h.brick_attr, np.int32)])
out(kind="prep_host_s", s=round(time.time() - t0, 1))
t0 = time.time()
W = wf.prepare(scene_h)
jax.block_until_ready(W.attr_comb)
out(kind="prepare_s", s=round(time.time() - t0, 1))
del attrs_np, comb

cam = Camera(pos=np.array([1.2, 1.45, 1.2]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
WD, HT = 1920, 1080
B = WD * HT
dirs_un = shade.pixel_dirs_device(cam5, WD, HT)
dirs = dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True)
origins = jnp.broadcast_to(cam5[0], dirs.shape)
jax.block_until_ready(dirs)

EARLY = True

# ---- 2. full-frame compile + first run ----------------------------------
prof = {}
t0 = time.time()
res = wf.intersect_wavefront(W, origins, dirs, interpret=False,
                             early_exit=EARLY, profile=prof)
nhit = float(jnp.sum(res.hit.astype(f32)))
out(kind="first_frame", s=round(time.time() - t0, 1), hit=int(nhit),
    hitfrac=round(nhit / B, 4))
for rr in prof["rounds"]:
    out(kind="round_profile", **rr)

# ---- 3. sanity vs the XLA brick oracle (subsample) ----------------------
try:
    scene_dev = scene_h.to_device()
    idx = np.random.default_rng(0).integers(0, B, 2048)
    o_s = origins[idx]
    d_s = dirs[idx]
    ref = brick_trace.intersect_bricks(scene_dev, o_s, d_s)
    got = jax.tree.map(lambda a: a[idx], res)
    agree = float(jnp.mean((ref.hit == got.hit).astype(f32)))
    both = ref.hit & got.hit
    tdiff = float(jnp.max(jnp.where(both, jnp.abs(ref.t - got.t), 0.0)))
    vagree = float(jnp.mean(jnp.where(both, (ref.value == got.value),
                                      True).astype(f32)))
    nagree = float(jnp.mean(jnp.where(
        both, jnp.max(jnp.abs(jnp.nan_to_num(ref.normal)
                              - jnp.nan_to_num(got.normal)), axis=-1) < 1e-4,
        True).astype(f32)))
    out(kind="sanity", hit_agree=round(agree, 4), max_tdiff=round(tdiff, 6),
        value_agree=round(vagree, 4), normal_agree=round(nagree, 4))
    del scene_dev
except Exception as e:
    import traceback
    traceback.print_exc()
    out(kind="sanity", error=repr(e)[:300])

# ---- 4. steady-state primary frame --------------------------------------
t0 = time.time()
REPS = 3
acc = 0.0
for _ in range(REPS):
    res = wf.intersect_wavefront(W, origins, dirs, interpret=False,
                                 early_exit=EARLY)
    acc += float(jnp.sum(res.hit.astype(f32)))
dt = (time.time() - t0) / REPS
out(kind="primary", B=B, ms=round(dt * 1e3, 1),
    mrays=round(B / dt / 1e6, 1), hitchk=acc / REPS)

# ---- 5. per-stage instrumented loop (first rounds) -----------------------
state = wf._init_state(origins, dirs, jnp.ones(B, bool), 1024, B)
S = state[0].shape[0]
none = jnp.full((S // wf.TILE, wf.KMAX), -1, i32)
t0 = time.time()
state = wf._run_kernel(none, none, W.l0_occ, W.l0_mixed, W.occ_words, state,
                       G=32, NM=W.n_mixed, inner_cap=100, l0_cap=100,
                       early_exit=EARLY, interpret=False)
n0 = float(jnp.sum((state[0] != wf.KEY_DONE).astype(f32)))
out(kind="stage_r0_kernel", ms=round((time.time() - t0) * 1e3, 1),
    active=int(n0))
ovox = jnp.full((B + 1,), -1, i32)
oaidx = jnp.zeros((B + 1,), i32)
ot = jnp.zeros((B + 1,), f32)
oit = jnp.zeros((B + 1,), i32)
for r in range(1, 7):
    t0 = time.time()
    state, tslot, tcell, n_act, bufs = wf._sort_stage(
        state, W.brick_slot, ovox, oaidx, ot, oit)
    ovox, oaidx, ot, oit = bufs
    n = int(n_act)
    t_sort = time.time() - t0
    t0 = time.time()
    nslice = 0
    while (tslot.shape[0] + 1) // 2 >= max(-(-n // wf.TILE), 64) \
            and tslot.shape[0] > 64:
        state, tslot, tcell = wf._slice_half(state, tslot, tcell)
        nslice += 1
    jax.block_until_ready(state[0])
    t_slice = time.time() - t0
    t0 = time.time()
    state = wf._run_kernel(tslot, tcell, W.l0_occ, W.l0_mixed, W.occ_words,
                           state, G=32, NM=W.n_mixed, inner_cap=100,
                           l0_cap=100, early_exit=EARLY, interpret=False)
    nn = float(jnp.sum((state[0] != wf.KEY_DONE).astype(f32)))
    t_kern = time.time() - t0
    out(kind="stage_round", r=r, active_in=n, tiles=int(tslot.shape[0]),
        nslice=nslice, sort_ms=round(t_sort * 1e3, 1),
        slice_ms=round(t_slice * 1e3, 1), kern_ms=round(t_kern * 1e3, 1),
        active_out=int(nn))
    if nn == 0:
        break

# ---- 6. GI frame (primary + 1 bounce) through shade_gi -------------------
import functools
isect = functools.partial(wf.intersect_wavefront, W, interpret=False,
                          early_exit=EARLY)
px = jnp.tile(jnp.arange(WD, dtype=f32), HT)
py = jnp.repeat(jnp.arange(HT, dtype=f32), WD)
t0 = time.time()
col, depth, iters = shade.shade_gi(None, origins, dirs, px, py, 1,
                                   gi_bounces=1, intersect_fn=isect)
c0 = float(jnp.sum(col))
out(kind="gi_first", s=round(time.time() - t0, 1))
t0 = time.time()
for i in range(3):
    col, depth, iters = shade.shade_gi(None, origins, dirs, px, py, i + 2,
                                       gi_bounces=1, intersect_fn=isect)
    c0 = float(jnp.sum(col))
dt = (time.time() - t0) / 3
out(kind="gi_frame", ms=round(dt * 1e3, 1),
    mrays=round(2 * B / dt / 1e6, 1))
