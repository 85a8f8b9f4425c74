"""Pallas TPU traversal kernel — the speed-of-light path.

The XLA while_loop kernel (``traverse.py``) round-trips every ray's state
through HBM each iteration (~100+ B/ray/iter).  This kernel keeps all per-ray
state in registers/VMEM for a (8,128) ray tile and reduces the hot loop to
ONE int32 gather per ray per iteration:

* The node table is collapsed to a single *packed word* per node:
  ``packed[i] = (effective_child_base << 1) | (value != 0)`` where
  ``effective_child_base`` is already zeroed for non-branch tags (the tag
  lives in the parent's mask in the SoA table; per node it is static, so it
  folds into the table).  Traversal needs nothing else: the hit decode
  (value/normal/voxel pos) runs as an XLA epilogue using the full SoA table.
* The Laine-Karras stack is a (stack_depth, 8, 128) VMEM scratch swept with
  per-row masked selects — VPU work, zero HBM traffic.
* The packed table lives whole in VMEM (v5e: 128 MiB), which covers scenes
  up to ~25M nodes (a 16M-node 1024^3 terrain world uses 64 MB).  Larger
  worlds fall back to the XLA kernel; multi-chip brick sharding is the
  scale-out path.

Bit-for-bit the same traversal semantics as traverse.py / the scalar oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import constants as C
from .traverse import HitResult, _bits, _float, _find_msb

f32 = jnp.float32
i32 = jnp.int32

import numpy as np

MAX_SCALE = C.MAX_SCALE
# plain numpy scalar: a jnp scalar here would be a captured device constant,
# which pallas kernels reject
_EPS = np.float32(C.EPSILON)

TILE = 1024  # rays per kernel instance: one (8, 128) vreg tile
#: VMEM budget for the packed node table (v5e has 128 MiB/core).
VMEM_TABLE_BYTES = 100 * 1024 * 1024


@jax.jit
def make_packed_table(tree_arrays):
    """(N,) int32: (effective child base << 1) | value_nonzero.

    A node's 2-bit type tag is stored in its parent's mask; fold it into the
    node's own word: non-branch tags force child base 0 exactly like
    extractLeaf/extractSubdividableLeaf/extractNonSurfaceLeaf
    (svotrace.comp:103-130).
    """
    child, mask, value, normal = tree_arrays
    n = child.shape[0]
    tags = jnp.zeros(n, i32)
    is_branch = child != 0
    base = jnp.where(is_branch, child, n)  # n = dropped scatter sentinel
    for k in range(8):
        tags = tags.at[base + k].set(
            jnp.where(is_branch, (mask >> (2 * k)) & 3, 0), mode="drop")
    eff_child = jnp.where(tags == C.TAG_BRANCH, child, 0)
    return (eff_child << 1) | (value != 0).astype(i32)


def _traverse_kernel(tbl_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     md_ref, cone_ref, act_ref,
                     tmin_ref, tmax_ref, scale_ref, exp2_ref, px_ref, py_ref,
                     pz_ref, idx_ref, parent_ref, iters_ref, octant_ref,
                     stack_ref, *, stack_depth, max_iterations):
    shape = ox_ref.shape  # (8, 128)

    def clamp(v):
        return jnp.where(jnp.abs(v) < _EPS, jnp.where(v >= 0, _EPS, -_EPS), v)

    dx = clamp(dx_ref[:])
    dy = clamp(dy_ref[:])
    dz = clamp(dz_ref[:])
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]

    cx = f32(1.0) / -jnp.abs(dx)
    cy = f32(1.0) / -jnp.abs(dy)
    cz = f32(1.0) / -jnp.abs(dz)
    bx = cx * ox
    by = cy * oy
    bz = cz * oz

    octant = jnp.zeros(shape, i32)
    octant = jnp.where(dx > 0, octant ^ 1, octant)
    octant = jnp.where(dy > 0, octant ^ 2, octant)
    octant = jnp.where(dz > 0, octant ^ 4, octant)
    bx = jnp.where(dx > 0, f32(3.0) * cx - bx, bx)
    by = jnp.where(dy > 0, f32(3.0) * cy - by, by)
    bz = jnp.where(dz > 0, f32(3.0) * cz - bz, bz)

    t_min = jnp.maximum(jnp.maximum(f32(2.0) * cx - bx, f32(2.0) * cy - by),
                        f32(2.0) * cz - bz)
    t_max = jnp.minimum(jnp.minimum(cx - bx, cy - by), cz - bz)
    t_min = jnp.maximum(t_min, f32(0.0))

    idx = jnp.zeros(shape, i32)
    px = jnp.full(shape, 1.0, f32)
    py = jnp.full(shape, 1.0, f32)
    pz = jnp.full(shape, 1.0, f32)
    for cond, bit in ((f32(1.5) * cx - bx > t_min, 1),
                      (f32(1.5) * cy - by > t_min, 2),
                      (f32(1.5) * cz - bz > t_min, 4)):
        idx = jnp.where(cond, idx ^ bit, idx)
    px = jnp.where(f32(1.5) * cx - bx > t_min, f32(1.5), px)
    py = jnp.where(f32(1.5) * cy - by > t_min, f32(1.5), py)
    pz = jnp.where(f32(1.5) * cz - bz > t_min, f32(1.5), pz)

    finite = (jnp.isfinite(ox) & jnp.isfinite(oy) & jnp.isfinite(oz)
              & jnp.isfinite(dx_ref[:]) & jnp.isfinite(dy_ref[:])
              & jnp.isfinite(dz_ref[:]))
    done0 = ~(act_ref[:] != 0) | ~finite

    for r in range(stack_depth):
        stack_ref[r] = jnp.zeros(shape, i32)

    stack_lo = i32(MAX_SCALE - stack_depth)
    cone = cone_ref[0, 0] != 0

    state = dict(
        t_min=t_min, t_max=t_max, h=t_max, idx=idx, px=px, py=py, pz=pz,
        parent=jnp.zeros(shape, i32),
        scale=jnp.full(shape, MAX_SCALE - 1, i32),
        scale_exp2=jnp.full(shape, 0.5, f32),
        max_depth=jnp.full(shape, md_ref[0, 0], i32),
        done=done0, iters=jnp.zeros(shape, i32),
        n=jnp.asarray(0, i32),
    )

    def cond_fn(s):
        return jnp.logical_and(jnp.any(~s["done"]),
                               s["n"] < i32(max_iterations))

    def body_fn(s):
        act = ~s["done"]
        iters = s["iters"] + act.astype(i32)
        t_min, t_max, hh = s["t_min"], s["t_max"], s["h"]
        idx, scale, scale_exp2 = s["idx"], s["scale"], s["scale_exp2"]
        px, py, pz = s["px"], s["py"], s["pz"]
        parent = s["parent"]

        max_depth_v = jnp.where(jnp.logical_and(cone, t_min > f32(0.05)),
                                i32(11), s["max_depth"])

        tx_corner = px * cx - bx
        ty_corner = py * cy - by
        tz_corner = pz * cz - bz
        tc_max = jnp.minimum(jnp.minimum(tx_corner, ty_corner), tz_corner)

        child_shift = idx ^ octant
        # THE gather: parent's packed word fetch was folded into the PUSH, so
        # only the child word is fetched per iteration
        parent_word = jnp.take(tbl_ref[:], parent, axis=0)
        ci = (parent_word >> 1) + child_shift
        cword = jnp.take(tbl_ref[:], ci, axis=0)
        cvalue_nz = (cword & 1) != 0
        ccp = cword >> 1

        hit_cond = act & cvalue_nz & (t_min <= t_max)
        depth_break = hit_cond & (MAX_SCALE - scale == max_depth_v)

        tv_max = jnp.minimum(t_max, tc_max)
        half = scale_exp2 * f32(0.5)
        descend = hit_cond & ~depth_break & (t_min <= tv_max)
        leaf_break = descend & (ccp == 0)
        push = descend & ~leaf_break

        # --- PUSH ---
        do_store = push & (tc_max < hh)
        for r in range(stack_depth):
            row_scale = stack_lo + i32(r)
            sel = do_store & (scale == row_scale)
            stack_ref[r] = jnp.where(sel, parent, stack_ref[r])
        hh = jnp.where(push, tc_max, hh)
        parent = jnp.where(push, ci, parent)

        tx_center = half * cx + tx_corner
        ty_center = half * cy + ty_corner
        tz_center = half * cz + tz_corner
        pidx = jnp.zeros(shape, i32)
        pidx = jnp.where(tx_center > t_min, pidx ^ 1, pidx)
        pidx = jnp.where(ty_center > t_min, pidx ^ 2, pidx)
        pidx = jnp.where(tz_center > t_min, pidx ^ 4, pidx)
        ppx = jnp.where(tx_center > t_min, px + half, px)
        ppy = jnp.where(ty_center > t_min, py + half, py)
        ppz = jnp.where(tz_center > t_min, pz + half, pz)

        idx = jnp.where(push, pidx, idx)
        px = jnp.where(push, ppx, px)
        py = jnp.where(push, ppy, py)
        pz = jnp.where(push, ppz, pz)
        scale = jnp.where(push, scale - 1, scale)
        scale_exp2 = jnp.where(push, half, scale_exp2)
        t_max = jnp.where(push, tv_max, t_max)

        # --- ADVANCE ---
        adv = act & ~depth_break & ~leaf_break & ~push
        sx = adv & (tx_corner <= tc_max)
        sy = adv & (ty_corner <= tc_max)
        sz = adv & (tz_corner <= tc_max)
        step_mask = (sx.astype(i32) | (sy.astype(i32) << 1)
                     | (sz.astype(i32) << 2))
        apx = jnp.where(sx, px - scale_exp2, px)
        apy = jnp.where(sy, py - scale_exp2, py)
        apz = jnp.where(sz, pz - scale_exp2, pz)
        t_min = jnp.where(adv, tc_max, t_min)
        idx = jnp.where(adv, idx ^ step_mask, idx)

        # --- POP ---
        pop = adv & ((idx & step_mask) != 0)
        zero_u = jnp.zeros(shape, jnp.uint32)
        differing = jnp.where(sx, _bits(apx) ^ _bits(apx + scale_exp2), zero_u)
        differing |= jnp.where(sy, _bits(apy) ^ _bits(apy + scale_exp2), zero_u)
        differing |= jnp.where(sz, _bits(apz) ^ _bits(apz + scale_exp2), zero_u)
        new_scale = _find_msb(differing)
        new_exp2 = _float(((new_scale - MAX_SCALE + 127).astype(jnp.uint32)
                           << 23))
        safe_scale = jnp.clip(new_scale, 0, MAX_SCALE)

        pop_parent = jnp.zeros(shape, i32)
        for r in range(stack_depth):
            row_scale = stack_lo + i32(r)
            pop_parent = jnp.where(safe_scale == row_scale, stack_ref[r],
                                   pop_parent)

        su = safe_scale.astype(jnp.uint32)
        shx = _bits(apx) >> su
        shy = _bits(apy) >> su
        shz = _bits(apz) >> su
        pop_px = _float(shx << su)
        pop_py = _float(shy << su)
        pop_pz = _float(shz << su)
        pop_idx = ((shx & 1) | ((shy & 1) << 1) | ((shz & 1) << 2)).astype(i32)

        scale = jnp.where(pop, new_scale, scale)
        scale_exp2 = jnp.where(pop, new_exp2, scale_exp2)
        parent = jnp.where(pop, pop_parent, parent)
        # parent cube exit t recomputed from truncation to scale+1 (see
        # traverse.py POP notes)
        up = (safe_scale + 1).astype(jnp.uint32)
        par_px = _float((_bits(apx) >> up) << up)
        par_py = _float((_bits(apy) >> up) << up)
        par_pz = _float((_bits(apz) >> up) << up)
        pop_tmax = jnp.minimum(jnp.minimum(par_px * cx - bx, par_py * cy - by),
                               par_pz * cz - bz)
        t_max = jnp.where(pop, pop_tmax, t_max)
        px = jnp.where(pop, pop_px, apx)
        py = jnp.where(pop, pop_py, apy)
        pz = jnp.where(pop, pop_pz, apz)
        idx = jnp.where(pop, pop_idx, idx)
        hh = jnp.where(pop, f32(0.0), hh)

        done = s["done"] | leaf_break | depth_break | (act & (scale >= MAX_SCALE))

        return dict(t_min=t_min, t_max=t_max, h=hh, idx=idx, px=px, py=py,
                    pz=pz, parent=parent, scale=scale, scale_exp2=scale_exp2,
                    max_depth=max_depth_v, done=done, iters=iters,
                    n=s["n"] + 1)

    s = jax.lax.while_loop(cond_fn, body_fn, state)

    tmin_ref[:] = s["t_min"]
    tmax_ref[:] = s["t_max"]
    # rays not done (iteration cap) and pre-retired rays are misses: force
    # scale out of range like the early `return false` (svotrace.comp:264-266)
    scale_ref[:] = jnp.where(s["done"] & ~done0, s["scale"], i32(MAX_SCALE))
    exp2_ref[:] = s["scale_exp2"]
    px_ref[:] = s["px"]
    py_ref[:] = s["py"]
    pz_ref[:] = s["pz"]
    idx_ref[:] = s["idx"]
    parent_ref[:] = s["parent"]
    iters_ref[:] = s["iters"]
    octant_ref[:] = octant


@functools.partial(jax.jit, static_argnames=("max_iterations", "stack_depth"))
def _traverse_tiles(packed, ox, oy, oz, dx, dy, dz, max_depth, cone, active,
                    max_iterations, stack_depth):
    n_tiles = ox.shape[0] // 8
    shp = (n_tiles * 8, 128)
    tile_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    kernel = functools.partial(_traverse_kernel, stack_depth=stack_depth,
                               max_iterations=max_iterations)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[tbl_spec] + [tile_spec] * 6 + [smem_spec, smem_spec]
        + [tile_spec],
        out_specs=tuple([tile_spec] * 11),
        out_shape=tuple(
            jax.ShapeDtypeStruct(shp, t) for t in
            (f32, f32, i32, f32, f32, f32, f32, i32, i32, i32, i32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_TABLE_BYTES + 16 * 1024 * 1024),
        scratch_shapes=[pltpu.VMEM((stack_depth, 8, 128), i32)],
    )(packed, ox, oy, oz, dx, dy, dz,
      jnp.asarray([[max_depth]], i32), jnp.asarray([[cone]], i32),
      active)
    return outs


def intersect_octree(tree_arrays, origin, direction, max_depth=C.MAX_DEPTH,
                     cone_trace=False,
                     max_iterations=C.MAX_RAYCAST_ITERATIONS, active=None,
                     stack_depth=C.MAX_DEPTH, packed=None):
    """Drop-in Pallas version of traverse.intersect_octree.

    ``packed`` (from :func:`make_packed_table`) can be precomputed once per
    tree; it must fit VMEM (see VMEM_TABLE_BYTES).  The hit decode runs as an
    XLA epilogue over the full SoA table.
    """
    child_t, mask_t, value_t, normal_t = tree_arrays
    if packed is None:
        packed = make_packed_table(tree_arrays)

    B = origin.shape[0]
    pad = (-B) % TILE
    n_tiles = (B + pad) // TILE

    def tile_f32(a):
        a = jnp.pad(a.astype(f32), (0, pad))
        return a.reshape(n_tiles * 8, 128)

    o = origin.astype(f32)
    d = direction.astype(f32)
    ox, oy, oz = tile_f32(o[:, 0]), tile_f32(o[:, 1]), tile_f32(o[:, 2])
    dx, dy, dz = tile_f32(d[:, 0]), tile_f32(d[:, 1]), tile_f32(d[:, 2])
    if active is None:
        act = jnp.ones(B, bool)
    else:
        act = active
    act = jnp.pad(act.astype(i32), (0, pad)).reshape(n_tiles * 8, 128)

    (t_min, t_max, scale, scale_exp2, px, py, pz, idx, parent, iters,
     octant) = _traverse_tiles(packed, ox, oy, oz, dx, dy, dz,
                               int(max_depth), int(bool(cone_trace)), act,
                               int(max_iterations), int(stack_depth))

    def untile(a):
        return a.reshape(-1)[:B]

    t_min, t_max = untile(t_min), untile(t_max)
    scale, scale_exp2 = untile(scale), untile(scale_exp2)
    px, py, pz = untile(px), untile(py), untile(pz)
    idx, parent, iters = untile(idx), untile(parent), untile(iters)
    octant = untile(octant)

    # --- XLA hit decode epilogue (same as traverse.py) ---
    dxo, dyo, dzo = d[:, 0], d[:, 1], d[:, 2]
    child_shift = idx ^ octant
    ci = child_t[parent] + child_shift
    tag = (mask_t[parent] >> (2 * child_shift)) & 3
    cvalue = value_t[ci]

    raw = jnp.where(tag == C.TAG_SURFACE_LEAF, normal_t[ci],
                    jnp.where(tag == C.TAG_NON_SURFACE_LEAF, i32(0),
                              mask_t[ci]))
    nx = ((raw % 10) - 5).astype(f32)
    ny = (((raw % 100) - (raw % 10)) // 10 - 5).astype(f32)
    nz = ((raw - (raw % 100)) // 100 - 5).astype(f32)
    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    has_normal = raw != 0
    nx = jnp.where(has_normal, nx / nlen, f32(0.0))
    ny = jnp.where(has_normal, ny / nlen, f32(0.0))
    nz = jnp.where(has_normal, nz / nlen, f32(0.0))
    normal = jnp.stack([nx, ny, nz], axis=-1)

    hit = (scale < MAX_SCALE) & (t_min <= t_max)
    hit_pos = o + t_min[:, None] * d + normal * (scale_exp2 * 2)[:, None]

    vx = jnp.where(dxo > 0, f32(3.0) - px - scale_exp2, px)
    vy = jnp.where(dyo > 0, f32(3.0) - py - scale_exp2, py)
    vz = jnp.where(dzo > 0, f32(3.0) - pz - scale_exp2, pz)
    voxel_pos = (jnp.stack([vx, vy, vz], axis=-1)
                 + normal * (scale_exp2 * 2 * f32(1.74))[:, None])

    return HitResult(
        hit=hit, value=jnp.where(hit, cvalue, 0), t=t_min, iters=iters,
        scale_exp2=scale_exp2, depth=(MAX_SCALE - scale), normal=normal,
        hit_pos=hit_pos, voxel_pos=voxel_pos,
        node=jnp.where(hit, ci, -1),
    )
