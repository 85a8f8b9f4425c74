"""Per-phase profile of the brick-wavefront round loop + glue primitives.

VERDICT.md round-2 item 1: find where the 7.7 s/frame goes (bare DDA is
161 Mrays/s; the assembled wavefront is 0.3).  Also re-measures the Mosaic
gather forms with real error messages (VERDICT weak item 3).
"""
import functools
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, REPO)
from svo_raytracer_tpu.core.octree import Octree
from svo_raytracer_tpu.ops import brick_pallas, brick_scene, brick_trace
from svo_raytracer_tpu.ops import shade
from svo_raytracer_tpu.utils.camera import Camera

f32, i32 = jnp.float32, jnp.int32


def out(**kw):
    print(json.dumps(kw), flush=True)


def timeit(f, *a, reps=5, warm=1):
    r = None
    for _ in range(warm):
        r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps, r


# ---------------------------------------------------------------- scene
CACHE = os.path.join(REPO, ".bench_cache")
z = np.load(os.path.join(CACHE, "terrain_1024_512.npz"))
tree = Octree(child=z["child"], mask=z["mask"], value=z["value"],
              normal=z["normal"], n_nodes=int(z["n_nodes"]), world_size=1024)
b = np.load(os.path.join(CACHE, "bricks_1024.npz"))
scene_h = brick_scene.BrickScene(
    world_size=1024, grid_size=32, n_mixed=int(b["n_mixed"]),
    l0_table=b["l0_table"], brick_slot=b["brick_slot"],
    brick_attr=b["brick_attr"], occ_words=b["occ_words"], attrs=b["attrs"])
scene = scene_h.to_device()
NM = scene.n_mixed
G = 32
WS = 1024
out(kind="scene", n_mixed=NM)

cam = Camera(pos=np.array([1.2, 1.45, 1.2]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
W, H = 1920, 1080
B = W * H
dirs_un = shade.pixel_dirs_device(cam5, W, H)
dirs = dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True)
origins = jnp.broadcast_to(cam5[0], dirs.shape)
jax.block_until_ready(dirs)

# ------------------------------------------------- A. glue primitives
rng = np.random.default_rng(0)
key_np = rng.integers(0, NM, B).astype(np.int32)
key = jnp.asarray(key_np)
vals = [jnp.asarray(rng.normal(size=B).astype(np.float32))
        for _ in range(10)]
vals2d = jnp.asarray(rng.normal(size=(B, 12)).astype(np.float32))

try:
    t, _ = timeit(jax.jit(jnp.argsort), key)
    out(kind="a1_argsort", B=B, ms=round(t * 1e3, 2))
except Exception as e:
    out(kind="a1_argsort", error=repr(e)[:300])

try:
    f = jax.jit(lambda k, *vs: jax.lax.sort((k,) + vs, num_keys=1))
    t, _ = timeit(f, key, *vals)
    out(kind="a2_sort_10payload", B=B, ms=round(t * 1e3, 2))
except Exception as e:
    out(kind="a2_sort_10payload", error=repr(e)[:300])

try:
    f = jax.jit(lambda k, v: v[jnp.argsort(k)])
    t, _ = timeit(f, key, vals2d)
    out(kind="a3_argsort_rowgather12", B=B, ms=round(t * 1e3, 2))
except Exception as e:
    out(kind="a3_argsort_rowgather12", error=repr(e)[:300])

# a4: the current scat(): argsort + per-field gather + scatter to padded S
TILE = brick_pallas.TILE
S = (B + B // 2 + TILE - 1) // TILE * TILE


def make_dest(k):
    counts = jnp.bincount(k, length=NM + 2)
    pc = (counts + TILE - 1) // TILE * TILE
    base_pad = jnp.concatenate([jnp.zeros(1, counts.dtype),
                                jnp.cumsum(pc)])[:-1]
    base_raw = jnp.concatenate([jnp.zeros(1, counts.dtype),
                                jnp.cumsum(counts)])[:-1]
    order = jnp.argsort(k)
    k_s = k[order]
    rank = jnp.arange(B) - base_raw[k_s]
    dest = base_pad[k_s] + rank
    dest = jnp.where(dest >= S, S, dest).astype(i32)
    return order, dest


try:
    def full_scat(k, *vs):
        order, dest = make_dest(k)
        outs = []
        for v in vs:
            buf = jnp.full((S,), 0, f32)
            outs.append(buf.at[dest].set(v[order], mode="drop"))
        return tuple(outs)

    t, _ = timeit(jax.jit(full_scat), key, *vals)
    out(kind="a4_scat10_padded", B=B, S=S, ms=round(t * 1e3, 2))
except Exception as e:
    out(kind="a4_scat10_padded", error=repr(e)[:300])

try:
    def row_scat(k, v):
        order, dest = make_dest(k)
        buf = jnp.zeros((S + 1, 12), f32)
        return buf.at[jnp.minimum(dest, S)].set(v[order], mode="drop")

    t, _ = timeit(jax.jit(row_scat), key, vals2d)
    out(kind="a5_rowscat12_padded", B=B, S=S, ms=round(t * 1e3, 2))
except Exception as e:
    out(kind="a5_rowscat12_padded", error=repr(e)[:300])

# a6: sort cost vs size (for the compaction schedule)
for n in (1 << 20, 1 << 19, 1 << 18, 1 << 16):
    kk = jnp.asarray(key_np[:n])
    vv = [v[:n] for v in vals]
    try:
        f = jax.jit(lambda k, *vs: jax.lax.sort((k,) + vs, num_keys=1))
        t, _ = timeit(f, kk, *vv)
        out(kind="a6_sort10", n=n, ms=round(t * 1e3, 2))
    except Exception as e:
        out(kind="a6_sort10", n=n, error=repr(e)[:300])

# a7: unscatter (B scatter by rid)
try:
    rid = jnp.asarray(rng.permutation(B).astype(np.int32))

    def unscat5(r, *vs):
        return tuple(jnp.zeros((B,), f32).at[r].set(v) for v in vs)

    t, _ = timeit(jax.jit(unscat5), rid, *vals[:5])
    out(kind="a7_unscat5", B=B, ms=round(t * 1e3, 2))
except Exception as e:
    out(kind="a7_unscat5", error=repr(e)[:300])

# a8: gather with sorted vs random indices into a big table
tab16 = jnp.asarray(rng.integers(0, 100, 1 << 24).astype(np.int32))
idx_rand = jnp.asarray(rng.integers(0, 1 << 24, B).astype(np.int32))
idx_sort = jnp.sort(idx_rand)
for nm, ix in (("rand", idx_rand), ("sorted", idx_sort)):
    try:
        f = jax.jit(lambda t_, i_: t_[i_])
        t, _ = timeit(f, tab16, ix)
        out(kind="a8_gather16M", order=nm, ms=round(t * 1e3, 2),
            g_elem_s=round(B / t / 1e9, 3))
    except Exception as e:
        out(kind="a8_gather16M", order=nm, error=repr(e)[:300])

# a9: d2h scalar sync
try:
    f = jax.jit(lambda k: jnp.sum(k >= 0))
    r = f(key)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(10):
        v = int(f(key))
    t = (time.time() - t0) / 10
    out(kind="a9_scalar_sync", ms=round(t * 1e3, 2))
except Exception as e:
    out(kind="a9_scalar_sync", error=repr(e)[:300])

# ------------------------------- B. round-by-round instrumented wavefront
# mirrors brick_pallas._intersect_impl's round_body as separate jitted
# stages so each phase is timed; prints actives per round.
o = origins.astype(f32)
d = dirs.astype(f32)
ov = (o - 1.0) * f32(WS)
oxs, oys, ozs = ov[:, 0], ov[:, 1], ov[:, 2]
dxs, dys, dzs = d[:, 0], d[:, 1], d[:, 2]

T = S // TILE


@jax.jit
def stage_bin(t_tot, alive, slot, cell):
    k = jnp.where(alive, jnp.where(slot >= 0, slot, NM), NM + 1)
    counts = jnp.bincount(k, length=NM + 2)
    pc = (counts + TILE - 1) // TILE * TILE
    base_pad = jnp.concatenate([jnp.zeros(1, counts.dtype),
                                jnp.cumsum(pc)])[:-1]
    base_raw = jnp.concatenate([jnp.zeros(1, counts.dtype),
                                jnp.cumsum(counts)])[:-1]
    order = jnp.argsort(k)
    k_s = k[order]
    rank = jnp.arange(B) - base_raw[k_s]
    dest = base_pad[k_s] + rank
    dest = jnp.where(k_s >= NM + 1, S, dest)
    dest = jnp.where(dest >= S, S, dest).astype(i32)

    px = oxs + t_tot * dxs
    py = oys + t_tot * dys
    pz = ozs + t_tot * dzs

    def scat(v, dtype=f32, fill=0):
        buf = jnp.full((S,), fill, dtype)
        return buf.at[dest].set(v[order].astype(dtype), mode="drop")

    p = dict(px=scat(px), py=scat(py), pz=scat(pz), dx=scat(dxs),
             dy=scat(dys), dz=scat(dzs), act=scat(alive, i32),
             slot=scat(jnp.where(slot >= 0, slot, -1), i32, fill=-1),
             cell=scat(cell, i32),
             rid=scat(jnp.arange(B), i32, fill=-1))
    return p


def stage_kernel(p, inner, l0s):
    tile_slot = p["slot"].reshape(T, TILE)[:, 0]
    tile_cell = p["cell"].reshape(T, TILE)[:, 0]

    def rs(a):
        return a.reshape(T * 8, 128)

    return brick_pallas._run_round_kernel(
        tile_slot, tile_cell, scene.l0_table, scene.occ_words,
        scene.attrs.reshape(scene.occ_words.shape[0], 256, 128),
        rs(p["px"]), rs(p["py"]), rs(p["pz"]), rs(p["dx"]), rs(p["dy"]),
        rs(p["dz"]), rs(p["act"]), G, inner, l0s, True, False)


stage_kernel_j = jax.jit(stage_kernel, static_argnames=("inner", "l0s"))


@jax.jit
def stage_post(p, outs, t_tot, alive, slot, cell, hit, t_hit):
    status_p, t_p, vox_p, attr_p, steps_p = outs
    rid = p["rid"]
    valid = rid >= 0
    ridc = jnp.where(valid, rid, B)

    def unscat(v, dtype, fill=0):
        buf = jnp.full((B + 1,), fill, dtype)
        return buf.at[ridc].set(
            jnp.where(valid, v.reshape(-1), fill), mode="drop")[:B]

    r_status = unscat(status_p.reshape(-1), i32)
    r_t = unscat(t_p.reshape(-1), f32)
    r_vox = unscat(vox_p.reshape(-1), i32)

    is_hit = alive & (r_status == 1)
    is_miss = alive & (r_status == 3)
    is_stop = alive & (r_status == 2)
    cell2 = jnp.clip(r_vox, 0, G * G * G - 1)
    s2 = scene.brick_slot[cell2]
    uattr = scene.brick_attr[cell2]
    uni_solid = is_stop & (s2 < 0) & ((uattr & 0xFF) != 0)
    hit = hit | is_hit | uni_solid
    t_hit = jnp.where(is_hit | uni_solid, t_tot + r_t, t_hit)
    cont = is_stop & ~uni_solid
    slot = jnp.where(cont, jnp.where(s2 >= 0, s2, -1), slot)
    cell = jnp.where(cont, cell2, cell)
    t_tot = jnp.where(cont, t_tot + r_t, t_tot)
    alive = alive & ~is_hit & ~is_miss & ~uni_solid
    return t_tot, alive, slot, cell, hit, t_hit


def run_instrumented(o_v, d_v, act0, tag, inner=100, l0s=100, rounds=14):
    ttot = jnp.zeros(B, f32)
    alive = act0
    slot = jnp.full(B, -1, i32)
    cell = jnp.zeros(B, i32)
    hit = jnp.zeros(B, bool)
    t_hit = jnp.zeros(B, f32)
    tot = dict(bin=0.0, kern=0.0, post=0.0)
    for r in range(rounds):
        n_act = int(jnp.sum(alive))
        if n_act == 0:
            break
        t1, p = timeit(stage_bin, ttot, alive, slot, cell, reps=3, warm=1)
        t2, outs = timeit(lambda pp: stage_kernel_j(pp, inner=inner,
                                                    l0s=l0s),
                          p, reps=3, warm=1)
        t3, st = timeit(stage_post, p, outs, ttot, alive, slot, cell, hit,
                        t_hit, reps=3, warm=1)
        ttot, alive, slot, cell, hit, t_hit = st
        tot["bin"] += t1
        tot["kern"] += t2
        tot["post"] += t3
        out(kind=f"{tag}_round", r=r, active=n_act,
            bin_ms=round(t1 * 1e3, 1), kern_ms=round(t2 * 1e3, 1),
            post_ms=round(t3 * 1e3, 1))
    out(kind=f"{tag}_total", hit=int(jnp.sum(hit)),
        bin_ms=round(tot["bin"] * 1e3, 1),
        kern_ms=round(tot["kern"] * 1e3, 1),
        post_ms=round(tot["post"] * 1e3, 1))
    return hit, t_hit


# NOTE: stage_bin uses globals oxs..dzs; for bounce rays re-bind below.
try:
    hit1, t1 = run_instrumented(o, d, jnp.ones(B, bool), "b_primary")
except Exception as e:
    import traceback
    traceback.print_exc()
    out(kind="b_primary", error=repr(e)[:300])

# kernel step sweep with round-0 binned inputs (all rays slot=-1: pure L0)
try:
    p0 = stage_bin(jnp.zeros(B, f32), jnp.ones(B, bool),
                   jnp.full(B, -1, i32), jnp.zeros(B, i32))
    jax.block_until_ready(p0["px"])
    for inner, l0s in ((100, 100), (100, 36), (48, 100), (48, 36), (32, 16)):
        t, _ = timeit(lambda pp: stage_kernel_j(pp, inner=inner, l0s=l0s),
                      p0, reps=3)
        out(kind="c_kernel_steps", inner=inner, l0=l0s, ms=round(t * 1e3, 1))
except Exception as e:
    out(kind="c_kernel_steps", error=repr(e)[:300])

# ------------------------------- D. mosaic gather forms (real errors now)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 200
for V in (8, 64, 256):
    try:
        def k_ax0(tab_ref, idx_ref, out_ref):
            def body(i, acc):
                g = jnp.take_along_axis(tab_ref[:],
                                        (idx_ref[:] + i) % V, axis=0)
                return acc + g
            out_ref[:] = jax.lax.fori_loop(
                0, REPS, body, jnp.zeros((V, 128), i32))

        tab = jnp.asarray(rng.integers(0, 100, (V, 128)).astype(np.int32))
        idx = jnp.asarray(rng.integers(0, V, (V, 128)).astype(np.int32))
        f = jax.jit(lambda t_, i_: pl.pallas_call(
            k_ax0,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, 128), i32))(t_, i_))
        t, _ = timeit(f, tab, idx, reps=5)
        out(kind="d_sublane_gather_ax0", V=V,
            ns_per_op=round(t / REPS * 1e9, 1))
    except Exception as e:
        out(kind="d_sublane_gather_ax0", V=V, error=repr(e)[:300])

try:
    def k_ax1(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            g = jnp.take_along_axis(tab_ref[:],
                                    (idx_ref[:] + i) % 128, axis=1)
            return acc + g
        out_ref[:] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((8, 128), i32))

    tab = jnp.asarray(rng.integers(0, 100, (8, 128)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)).astype(np.int32))
    f = jax.jit(lambda t_, i_: pl.pallas_call(
        k_ax1,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), i32))(t_, i_))
    t, _ = timeit(f, tab, idx, reps=5)
    out(kind="d_lane_gather_ax1", ns_per_op=round(t / REPS * 1e9, 1))
except Exception as e:
    out(kind="d_lane_gather_ax1", error=repr(e)[:300])
