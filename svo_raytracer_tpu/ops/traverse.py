"""Batched ESVO ray traversal — jitted XLA implementation.

The reference runs the Laine-Karras stack traversal one GL thread per pixel
with data-dependent `while`/`break` (``src/shaders/svotrace.comp:211-432``).
On a lock-step vector machine that becomes: a single ``lax.while_loop`` whose
body advances *every ray in the batch* one traversal step, with per-ray active
masks instead of ``break`` (SURVEY.md §2.2 row 1).  All per-ray state is
structure-of-arrays ``(B,)`` vectors (TPU lanes want the batch on the last
dim); node fetches are XLA gathers into the SoA node table.

The float-mantissa POP trick (svotrace.comp:347-368) carries over unchanged:
it is pure int32/float32 bit math (``bitcast_convert_type`` + ``clz``).

This version is the correctness workhorse: state round-trips through HBM every
iteration, so it is bandwidth-bound at roughly state_bytes x iterations.  The
Pallas kernel (``traverse_pallas.py``) keeps ray state in VMEM and is the
speed-of-light path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import constants as C

f32 = jnp.float32
i32 = jnp.int32

MAX_SCALE = C.MAX_SCALE
_EPS = f32(C.EPSILON)


class HitResult(NamedTuple):
    """Batched castResult (svotrace.comp:186-197); fields are (B,) / (B-,3)."""

    hit: jax.Array         # bool — scale < MAX_SCALE && t_min <= t_max
    value: jax.Array       # i32 material of hit node
    t: jax.Array           # f32 hit distance (t_min)
    iters: jax.Array       # i32 traversal iterations spent
    scale_exp2: jax.Array  # f32 edge length of the hit cube
    depth: jax.Array       # i32 MAX_SCALE - scale
    normal: jax.Array      # f32 (B,3) decoded digit-packed normal
    hit_pos: jax.Array     # f32 (B,3) origin + t*dir + normal*scale_exp2*2
    voxel_pos: jax.Array   # f32 (B,3) un-mirrored cube corner + normal offset
    node: jax.Array        # i32 SoA index of hit node (-1-free; mask with hit)


def _bits(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _float(b):
    return jax.lax.bitcast_convert_type(b.astype(jnp.uint32), jnp.float32)


def _find_msb(x):
    """findMSB on uint32: 31 - clz (svotrace.comp:352)."""
    return i32(31) - jax.lax.clz(x.astype(jnp.uint32)).astype(i32)


@functools.partial(jax.jit,
                   static_argnames=("max_iterations", "stack_depth"))
def intersect_octree(tree_arrays, origin, direction, max_depth=C.MAX_DEPTH,
                     cone_trace=False, max_iterations=C.MAX_RAYCAST_ITERATIONS,
                     active=None, stack_depth=C.MAX_DEPTH):
    """Trace a batch of rays.  origin/direction: (B, 3) float32.

    ``tree_arrays`` is the (child, mask, value, normal) tuple of int32 device
    arrays from :meth:`Octree.arrays`.  Returns a :class:`HitResult` of (B,)
    arrays.  ``max_depth``/``cone_trace`` may be python or traced scalars.

    ``active`` (optional bool (B,)): rays marked inactive are never stepped
    and report a miss — the "dead rays culled" strategy (benchmarks.md:5-6).
    Inactive or NaN rays otherwise spin ADVANCE with an empty step mask until
    the 1500-iteration cap, stalling the whole lock-step batch.
    """
    child_t, mask_t, value_t, normal_t = tree_arrays
    if isinstance(max_depth, int) and max_depth > stack_depth:
        raise ValueError(f"max_depth={max_depth} exceeds the static "
                         f"stack_depth={stack_depth} stack window")
    o = origin.astype(f32)
    d = direction.astype(f32)
    B = o.shape[0]

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    def clamp(v):
        return jnp.where(jnp.abs(v) < _EPS, jnp.where(v >= 0, _EPS, -_EPS), v)

    dx, dy, dz = clamp(dx), clamp(dy), clamp(dz)

    cx = f32(1.0) / -jnp.abs(dx)
    cy = f32(1.0) / -jnp.abs(dy)
    cz = f32(1.0) / -jnp.abs(dz)
    bx = cx * ox
    by = cy * oy
    bz = cz * oz

    octant = jnp.zeros(B, i32)
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
    h = t_max

    idx = jnp.zeros(B, i32)
    px = jnp.full(B, 1.0, f32)
    py_ = jnp.full(B, 1.0, f32)
    pz = jnp.full(B, 1.0, f32)
    cond_x = f32(1.5) * cx - bx > t_min
    cond_y = f32(1.5) * cy - by > t_min
    cond_z = f32(1.5) * cz - bz > t_min
    idx = jnp.where(cond_x, idx ^ 1, idx)
    idx = jnp.where(cond_y, idx ^ 2, idx)
    idx = jnp.where(cond_z, idx ^ 4, idx)
    px = jnp.where(cond_x, f32(1.5), px)
    py_ = jnp.where(cond_y, f32(1.5), py_)
    pz = jnp.where(cond_z, f32(1.5), pz)

    parent = jnp.zeros(B, i32)
    parent_mask = jnp.broadcast_to(mask_t[0], (B,)).astype(i32)
    scale = jnp.full(B, MAX_SCALE - 1, i32)
    scale_exp2 = jnp.full(B, 0.5, f32)
    max_depth_v = jnp.broadcast_to(jnp.asarray(max_depth, i32), (B,))
    cone = jnp.broadcast_to(jnp.asarray(cone_trace, bool), (B,))

    # Only parent node ids are stacked.  The reference also stacks t_max
    # (svotrace.comp:317,357), but the stored value always equals the exit t
    # of the popped cube, which is recomputable from the truncated corner
    # position: per-axis t = pos*coef - bias is monotone in pos, so the
    # min-chain through PUSH clippings telescopes to min over the cube's own
    # three axis ts — bit-exactly (verified against the oracle).
    # The stack is indexed by scale, but pushes only ever land in scales
    # [MAX_SCALE - stack_depth, MAX_SCALE - 1] (the depth cutoff at
    # svotrace.comp:300-302 stops descent), so the carried stack is a
    # stack_depth-row window — per-iteration stack traffic scales with the
    # LOD depth, not the full 24 float-mantissa scales.  ``max_depth`` stays
    # a cheap traced value; ``stack_depth`` is its static upper bound.
    stack_lo = i32(MAX_SCALE - stack_depth)
    stack_node = jnp.zeros((stack_depth, B), i32)

    # NaN origins/directions never satisfy any step comparison and would
    # spin to the iteration cap; retire them immediately as misses.
    finite = (jnp.isfinite(ox) & jnp.isfinite(oy) & jnp.isfinite(oz)
              & jnp.isfinite(dx) & jnp.isfinite(dy) & jnp.isfinite(dz))
    dead0 = ~finite if active is None else (~active | ~finite)
    done = dead0
    iters = jnp.zeros(B, i32)
    # Stack reads/writes index by the per-ray scale.  A gather/scatter there
    # serializes on CPU and is slow on TPU; instead compare a broadcast iota
    # against the scale vector and do masked elementwise selects over the
    # stack window — pure VPU work.
    scale_iota = (jnp.arange(stack_depth, dtype=i32)[:, None]
                  + stack_lo)  # (stack_depth, 1) of absolute scales

    state = dict(
        t_min=t_min, t_max=t_max, h=h, idx=idx, px=px, py=py_, pz=pz,
        parent=parent, parent_mask=parent_mask, scale=scale,
        scale_exp2=scale_exp2, max_depth=max_depth_v,
        stack_node=stack_node, done=done, iters=iters,
        n=jnp.asarray(0, i32),
    )

    def cond_fn(s):
        return jnp.logical_and(jnp.any(~s["done"]),
                               s["n"] < jnp.asarray(max_iterations, i32))

    def body_fn(s):
        act = ~s["done"]
        iters = s["iters"] + act.astype(i32)
        t_min, t_max, hh = s["t_min"], s["t_max"], s["h"]
        idx, scale, scale_exp2 = s["idx"], s["scale"], s["scale_exp2"]
        px, py_, pz = s["px"], s["py"], s["pz"]
        parent, parent_mask = s["parent"], s["parent_mask"]

        # cone-trace LOD clamp (svotrace.comp:275-277) — sticky like the
        # shader's in-place maxDepth assignment
        max_depth_v = jnp.where(jnp.logical_and(cone, t_min > f32(0.05)),
                                i32(11), s["max_depth"])

        tx_corner = px * cx - bx
        ty_corner = py_ * cy - by
        tz_corner = pz * cz - bz
        tc_max = jnp.minimum(jnp.minimum(tx_corner, ty_corner), tz_corner)

        child_shift = idx ^ octant
        ci = child_t[parent] + child_shift
        tag = (parent_mask >> (2 * child_shift)) & 3
        cvalue = value_t[ci]
        ccp = jnp.where(tag == C.TAG_BRANCH, child_t[ci], i32(0))

        hit_cond = act & (cvalue != 0) & (t_min <= t_max)
        depth_break = hit_cond & (MAX_SCALE - scale == max_depth_v)

        tv_max = jnp.minimum(t_max, tc_max)
        half = scale_exp2 * f32(0.5)
        descend = hit_cond & ~depth_break & (t_min <= tv_max)
        leaf_break = descend & (ccp == 0)
        push = descend & ~leaf_break

        # --- PUSH (svotrace.comp:315-334) ---
        do_store = push & (tc_max < hh)
        at_scale = scale_iota == scale[None, :]            # (24, B) one-hot
        store_row = at_scale & do_store[None, :]
        stack_node = jnp.where(store_row, parent[None, :], s["stack_node"])
        hh = jnp.where(push, tc_max, hh)

        new_parent = jnp.where(push, ci, parent)
        parent_mask = jnp.where(push, mask_t[ci], parent_mask)
        parent = new_parent

        tx_center = half * cx + tx_corner
        ty_center = half * cy + ty_corner
        tz_center = half * cz + tz_corner
        pidx = jnp.zeros(B, i32)
        pidx = jnp.where(tx_center > t_min, pidx ^ 1, pidx)
        pidx = jnp.where(ty_center > t_min, pidx ^ 2, pidx)
        pidx = jnp.where(tz_center > t_min, pidx ^ 4, pidx)
        ppx = jnp.where(tx_center > t_min, px + half, px)
        ppy = jnp.where(ty_center > t_min, py_ + half, py_)
        ppz = jnp.where(tz_center > t_min, pz + half, pz)

        idx = jnp.where(push, pidx, idx)
        px = jnp.where(push, ppx, px)
        py_ = jnp.where(push, ppy, py_)
        pz = jnp.where(push, ppz, pz)
        scale = jnp.where(push, scale - 1, scale)
        scale_exp2 = jnp.where(push, half, scale_exp2)
        t_max = jnp.where(push, tv_max, t_max)

        # --- ADVANCE (svotrace.comp:337-344) ---
        adv = act & ~depth_break & ~leaf_break & ~push
        sx = adv & (tx_corner <= tc_max)
        sy = adv & (ty_corner <= tc_max)
        sz = adv & (tz_corner <= tc_max)
        step_mask = (sx.astype(i32) | (sy.astype(i32) << 1)
                     | (sz.astype(i32) << 2))
        apx = jnp.where(sx, px - scale_exp2, px)
        apy = jnp.where(sy, py_ - scale_exp2, py_)
        apz = jnp.where(sz, pz - scale_exp2, pz)
        t_min = jnp.where(adv, tc_max, t_min)
        idx = jnp.where(adv, idx ^ step_mask, idx)

        # --- POP (svotrace.comp:347-368) ---
        pop = adv & ((idx & step_mask) != 0)
        zero_u = jnp.zeros(B, jnp.uint32)
        differing = jnp.where(sx, _bits(apx) ^ _bits(apx + scale_exp2), zero_u)
        differing |= jnp.where(sy, _bits(apy) ^ _bits(apy + scale_exp2), zero_u)
        differing |= jnp.where(sz, _bits(apz) ^ _bits(apz + scale_exp2), zero_u)
        new_scale = _find_msb(differing)
        new_exp2 = _float(((new_scale - MAX_SCALE + 127).astype(jnp.uint32)
                           << 23))
        safe_scale = jnp.clip(new_scale, 0, MAX_SCALE)
        at_pop = scale_iota == safe_scale[None, :]
        pop_parent = jnp.sum(jnp.where(at_pop, stack_node, 0), axis=0)

        shx = _bits(apx) >> safe_scale.astype(jnp.uint32)
        shy = _bits(apy) >> safe_scale.astype(jnp.uint32)
        shz = _bits(apz) >> safe_scale.astype(jnp.uint32)
        pop_px = _float(shx << safe_scale.astype(jnp.uint32))
        pop_py = _float(shy << safe_scale.astype(jnp.uint32))
        pop_pz = _float(shz << safe_scale.astype(jnp.uint32))
        pop_idx = ((shx & 1) | ((shy & 1) << 1) | ((shz & 1) << 2)).astype(i32)

        scale = jnp.where(pop, new_scale, scale)
        scale_exp2 = jnp.where(pop, new_exp2, scale_exp2)
        parent = jnp.where(pop, pop_parent, parent)
        parent_mask = jnp.where(pop, mask_t[jnp.clip(pop_parent, 0, None)],
                                parent_mask)
        # The stack entry at scale s holds the cube at scale s+1 (the parent
        # above the popped cell, svotrace.comp:316-317), so the stored t_max
        # equals that parent cube's exit t — recompute it from pos truncated
        # to scale+1 mantissa bits.
        up = (safe_scale + 1).astype(jnp.uint32)
        par_px = _float((_bits(apx) >> up) << up)
        par_py = _float((_bits(apy) >> up) << up)
        par_pz = _float((_bits(apz) >> up) << up)
        pop_tmax = jnp.minimum(jnp.minimum(par_px * cx - bx, par_py * cy - by),
                               par_pz * cz - bz)
        t_max = jnp.where(pop, pop_tmax, t_max)
        px = jnp.where(pop, pop_px, apx)
        py_ = jnp.where(pop, pop_py, apy)
        pz = jnp.where(pop, pop_pz, apz)
        idx = jnp.where(pop, pop_idx, idx)
        hh = jnp.where(pop, f32(0.0), hh)

        done = s["done"] | leaf_break | depth_break | (act & (scale >= MAX_SCALE))

        return dict(t_min=t_min, t_max=t_max, h=hh, idx=idx, px=px, py=py_,
                    pz=pz, parent=parent, parent_mask=parent_mask, scale=scale,
                    scale_exp2=scale_exp2, max_depth=max_depth_v,
                    stack_node=stack_node, done=done,
                    iters=iters, n=s["n"] + 1)

    s = jax.lax.while_loop(cond_fn, body_fn, state)

    # --- hit decode (svotrace.comp:380-431) ---
    t_min, t_max = s["t_min"], s["t_max"]
    idx, scale, scale_exp2 = s["idx"], s["scale"], s["scale_exp2"]
    parent, parent_mask = s["parent"], s["parent_mask"]

    child_shift = idx ^ octant
    ci = child_t[parent] + child_shift
    tag = (parent_mask >> (2 * child_shift)) & 3
    cvalue = value_t[ci]

    # effective raw normal field (tag-dependent; see octree.effective_normal_raw)
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

    # Rays still active at the iteration cap are misses, matching the
    # early `return false` at svotrace.comp:264-266; pre-retired rays
    # (inactive/NaN) are misses too.
    hit = s["done"] & (scale < MAX_SCALE) & (t_min <= t_max) & ~dead0
    hit_pos = o + t_min[:, None] * d + normal * (scale_exp2 * 2)[:, None]

    vx = jnp.where(dx > 0, f32(3.0) - s["px"] - scale_exp2, s["px"])
    vy = jnp.where(dy > 0, f32(3.0) - s["py"] - scale_exp2, s["py"])
    vz = jnp.where(dz > 0, f32(3.0) - s["pz"] - scale_exp2, s["pz"])
    voxel_pos = (jnp.stack([vx, vy, vz], axis=-1)
                 + normal * (scale_exp2 * 2 * f32(1.74))[:, None])

    return HitResult(
        hit=hit, value=jnp.where(hit, cvalue, 0), t=t_min, iters=s["iters"],
        scale_exp2=scale_exp2, depth=(MAX_SCALE - scale), normal=normal,
        hit_pos=hit_pos, voxel_pos=voxel_pos,
        node=jnp.where(hit, ci, -1),
    )
