"""Scalar NumPy ESVO ray traversal — the correctness oracle.

A direct, readable re-statement of the Laine-Karras stack traversal as the
reference GPU kernel executes it (``src/shaders/svotrace.comp:211-432``),
operating on the SoA node table instead of the byte buffer.  All float math is
float32 to match the GPU.  This is deliberately slow (one Python loop per ray
step); the batched XLA/Pallas kernels are verified against it.

Algorithm phases (svotrace.comp line refs):
  * mirror the ray into the octant where all direction components are negative
    (octant_mask, t-coefficient/bias setup, :226-245)
  * descend from the root cube [1,2]^3 at scale = MAX_SCALE-1 (:249-257)
  * loop: child fetch (:294), hit tests + depth cutoff (:295-313),
    PUSH (:315-334), ADVANCE (:337-344), POP via float-mantissa differing
    bits + findMSB (:347-368)
  * hit decode: digit-packed normal (:380-388), voxel position un-mirroring
    (:410-421)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils import constants as C
from ..core.octree import Octree

f32 = np.float32

MAX_SCALE = C.MAX_SCALE
EPS = f32(C.EPSILON)


def _bits(x: np.float32) -> int:
    return int(np.float32(x).view(np.uint32))


def _from_bits(b: int) -> np.float32:
    return np.uint32(b & 0xFFFFFFFF).view(np.float32)


def _find_msb(x: int) -> int:
    return x.bit_length() - 1 if x > 0 else -1


@dataclasses.dataclass
class CastResult:
    """Hit record (castResult, svotrace.comp:186-197)."""

    hit: bool = False
    value: int = 0
    t: float = 0.0
    iters: int = 0
    scale_exp2: float = 0.0  # res.scale: edge length of the hit cube
    depth: int = 0
    normal: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, f32))
    hit_pos: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, f32))
    voxel_pos: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, f32))
    node: int = -1  # SoA index of the hit node (for gradients / edits)


def _child_fields(tree, parent_idx, parent_mask, k):
    """Fetch child k's (index, value, effective cp, tag).

    In the SoA table child k is the single slot child[parent]+k; its 2-bit tag
    comes from the parent's mask.  Non-branch tags force cp=0 exactly like
    extractLeaf/extractSubdividableLeaf/extractNonSurfaceLeaf
    (svotrace.comp:103-130).
    """
    ci = int(tree.child[parent_idx]) + k
    tag = (parent_mask >> (2 * k)) & 3
    cp = int(tree.child[ci]) if tag == C.TAG_BRANCH else 0
    return ci, int(tree.value[ci]), cp, tag


def _normal_raw(tree, ci, tag) -> int:
    """Raw field decoded as a normal at hit time (svotrace.comp:381-388).

    The shader always re-extracts the node and reads its leafMask field: for a
    surface leaf that field holds the packed normal; for a branch or a
    subdividable leaf it holds the node's own mask bytes; for a non-surface
    leaf it is zero.
    """
    if tag == C.TAG_SURFACE_LEAF:
        return int(tree.normal[ci])
    if tag == C.TAG_NON_SURFACE_LEAF:
        return 0
    return int(tree.mask[ci])


def intersect_octree(tree: Octree, origin, direction, max_depth: int = C.MAX_DEPTH,
                     cone_trace: bool = False,
                     max_iterations: int = C.MAX_RAYCAST_ITERATIONS) -> CastResult:
    """Trace one ray against the octree spanning the world cube [1,2]^3."""
    res = CastResult()
    o = np.asarray(origin, f32).copy()
    d = np.asarray(direction, f32).copy()

    # Per-ray traversal stack (octstack[MAX_SCALE+1], svotrace.comp:199-202).
    # A fresh GPU invocation starts with undefined (in practice zeroed) locals;
    # we zero-init so the batched kernels can match the oracle bit-for-bit.
    stack_nodes = [(0, 0)] * (MAX_SCALE + 1)
    stack_tmax = [f32(0.0)] * (MAX_SCALE + 1)

    for ax in range(3):
        if abs(d[ax]) < EPS:
            d[ax] = EPS * (f32(1.0) if d[ax] >= 0 else f32(-1.0))

    t_coef = np.array([f32(1.0) / -abs(d[ax]) for ax in range(3)], f32)
    t_bias = t_coef * o

    octant_mask = 0
    for ax, bit in ((0, 1), (1, 2), (2, 4)):
        if d[ax] > 0.0:
            octant_mask ^= bit
            t_bias[ax] = f32(3.0) * t_coef[ax] - t_bias[ax]

    t_min = max(f32(2.0) * t_coef[0] - t_bias[0],
                f32(2.0) * t_coef[1] - t_bias[1],
                f32(2.0) * t_coef[2] - t_bias[2])
    t_max = min(t_coef[0] - t_bias[0], t_coef[1] - t_bias[1],
                t_coef[2] - t_bias[2])
    t_min = max(t_min, f32(0.0))
    h = t_max

    parent = 0
    parent_mask = int(tree.mask[0])
    idx = 0
    pos = np.array([1.0, 1.0, 1.0], f32)
    scale = MAX_SCALE - 1
    scale_exp2 = f32(0.5)
    # child_descriptor==0 in the shader means "not cached"; in the SoA table a
    # zero child base is the leaf sentinel, so we track validity separately.
    iters = 0
    child_shift = 0

    for ax, bit in ((0, 1), (1, 2), (2, 4)):
        if f32(1.5) * t_coef[ax] - t_bias[ax] > t_min:
            idx ^= bit
            pos[ax] = f32(1.5)

    while scale < MAX_SCALE:
        iters += 1
        if iters > max_iterations:
            res.iters = iters
            return res

        if cone_trace and t_min > f32(0.05):
            max_depth = 11  # svotrace.comp:275-277

        t_corner = pos * t_coef - t_bias
        tc_max = min(t_corner[0], t_corner[1], t_corner[2])

        child_shift = idx ^ octant_mask
        ci, cvalue, ccp, ctag = _child_fields(tree, parent, parent_mask, child_shift)

        if cvalue != 0 and t_min <= t_max:
            if MAX_SCALE - scale == max_depth:
                break  # LOD cutoff hit (svotrace.comp:300-302)

            tv_max = min(t_max, tc_max)
            half = scale_exp2 * f32(0.5)
            t_center = half * t_coef + t_corner

            if t_min <= tv_max:
                if ccp == 0:
                    break  # leaf hit (svotrace.comp:311-313)

                # PUSH (svotrace.comp:315-334)
                if tc_max < h:
                    stack_nodes[scale] = (parent, parent_mask)
                    stack_tmax[scale] = t_max
                h = tc_max

                parent = ci
                parent_mask = int(tree.mask[ci])

                idx = 0
                scale -= 1
                scale_exp2 = half
                for ax, bit in ((0, 1), (1, 2), (2, 4)):
                    if t_center[ax] > t_min:
                        idx ^= bit
                        pos[ax] = f32(pos[ax] + scale_exp2)
                t_max = tv_max
                continue

        # ADVANCE (svotrace.comp:337-344)
        step_mask = 0
        for ax, bit in ((0, 1), (1, 2), (2, 4)):
            if t_corner[ax] <= tc_max:
                step_mask ^= bit
                pos[ax] = f32(pos[ax] - scale_exp2)
        t_min = tc_max
        idx ^= step_mask

        # POP (svotrace.comp:347-368)
        if idx & step_mask:
            differing = 0
            for ax, bit in ((0, 1), (1, 2), (2, 4)):
                if step_mask & bit:
                    differing |= _bits(pos[ax]) ^ _bits(f32(pos[ax] + scale_exp2))
            scale = _find_msb(differing)
            scale_exp2 = _from_bits((scale - MAX_SCALE + 127) << 23)

            parent, parent_mask = stack_nodes[scale]
            t_max = stack_tmax[scale]

            sh = [_bits(pos[ax]) >> scale for ax in range(3)]
            for ax in range(3):
                pos[ax] = _from_bits(sh[ax] << scale)
            idx = (sh[0] & 1) | ((sh[1] & 1) << 1) | ((sh[2] & 1) << 2)
            h = f32(0.0)

    res.iters = iters
    if scale >= MAX_SCALE:
        return res  # miss

    # Hit decode (svotrace.comp:380-431)
    ci, cvalue, _, ctag = _child_fields(tree, parent, parent_mask, child_shift)
    raw = _normal_raw(tree, ci, ctag)
    norm = np.zeros(3, f32)
    if raw != 0:
        nx = f32((raw % 10) - 5)
        ny = f32(((raw % 100) - (raw % 10)) // 10 - 5)
        nz = f32((raw - (raw % 100)) // 100 - 5)
        v = np.array([nx, ny, nz], f32)
        with np.errstate(invalid="ignore"):
            # raw==555 encodes the zero vector; GLSL normalize(0) is undefined
            # (NaN in practice) and we keep that exact behavior for parity.
            norm = (v / f32(np.sqrt(np.sum(v * v)))).astype(f32)

    res.hit = t_min <= t_max
    res.value = cvalue
    res.node = ci
    res.t = float(t_min)
    res.scale_exp2 = float(scale_exp2)
    res.depth = MAX_SCALE - scale
    res.normal = norm
    res.hit_pos = (o + f32(t_min) * d + norm * f32(scale_exp2 * 2)).astype(f32)

    vp = pos.copy()
    for ax in range(3):
        if d[ax] > 0:
            vp[ax] = f32(3.0) - vp[ax] - scale_exp2
    vp = (vp + norm * f32(scale_exp2 * 2 * 1.74)).astype(f32)
    res.voxel_pos = vp
    return res
