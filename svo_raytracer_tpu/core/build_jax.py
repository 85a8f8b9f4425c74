"""Device-side octree construction — jitted bottom-up build.

The reference builds each chunk's octree with a recursive CPU scan over the
dense voxel grid (``src/engine/Octree.java:511-670``), O(size^3) re-scans per
node, parallelized with 8 host threads (``OctreeThread.java``).  The TPU-native
re-design (SURVEY.md §7 delta 3) is a *level-synchronous* build:

  Phase A — bottom-up statistics, one fused pass per level: per-cell
    homogeneity via min/max 2x pooling chains, the reference's quirky
    "value" pick (corner if nonzero else first-nonzero in (z,y,x) scan
    order), voxel exposure via a 3^3 air dilation, digit-packed normals via
    separable shifted sums, and the corner-probe big-node exposure test.
  Phase B — top-down level-order allocation: branch ranks by prefix sum,
    children of rank-r branch occupy slots base + 8r .. base + 8r + 7, and
    per-level masked scatters emit value/mask/normal/child arrays.

Semantics are bit-equal to the NumPy oracle (``build_np.py``) — including the
reference's corner-probe exposure quirk — and the emitted graph serializes to
identical ``.svo`` bytes (allocation order differs: level-order here, DFS in
the oracle; ``svo_format.export_svo`` canonicalizes both to BFS).

Everything is shape-static given (grid size, max_lod, capacity): jit once per
chunk size, reuse for every chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import constants as C
from .octree import Octree

i32 = jnp.int32


def _pool2_min_max(mn, mx):
    """2x2x2 min/max reduction of [x,y,z]-indexed level stats."""
    def pool(a, op):
        n = a.shape[0] // 2
        a = a.reshape(n, 2, n, 2, n, 2)
        return op(op(op(a, 1), 2), 3)  # reduce the three '2' axes
    return (pool(mn, lambda a, ax: jnp.min(a, axis=ax)),
            pool(mx, lambda a, ax: jnp.max(a, axis=ax)))


def _first_nonzero_scan(v, s):
    """Per-cell first nonzero voxel in the reference's (z, y, x)-raster scan
    order (z slowest, x fastest; Octree.java:534-536) for cell size s."""
    n = v.shape[0] // s
    cells = v.reshape(n, s, n, s, n, s)            # (xc, xo, yc, yo, zc, zo)
    cells = cells.transpose(0, 2, 4, 5, 3, 1)       # (xc, yc, zc, zo, yo, xo)
    flat = cells.reshape(n, n, n, s * s * s)
    nz = flat != 0
    idx = jnp.argmax(nz, axis=-1)
    val = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    return jnp.where(jnp.any(nz, axis=-1), val, 0)


def _voxel_exposure_and_normals(v):
    """Per-voxel (exposed, packed_normal): air dilation + separable offset
    sums over the 3^3 neighborhood, grid-clipped (out-of-grid is never air;
    Octree.java:620-649)."""
    air = (v == 0).astype(i32)

    def shift_sum3(a, axis):
        """a[i-1] + a[i] + a[i+1] along axis with zero padding."""
        lo = jnp.concatenate([jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=axis)),
                              jax.lax.slice_in_dim(a, 0, -1, axis=axis)], axis=axis)
        hi = jnp.concatenate([jax.lax.slice_in_dim(a, 1, None, axis=axis),
                              jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=axis))],
                             axis=axis)
        return lo + a + hi

    def shift_diff(a, axis):
        """a[i+1] - a[i-1] along axis (the -1/0/+1 offset weighting)."""
        lo = jnp.concatenate([jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=axis)),
                              jax.lax.slice_in_dim(a, 0, -1, axis=axis)], axis=axis)
        hi = jnp.concatenate([jax.lax.slice_in_dim(a, 1, None, axis=axis),
                              jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=axis))],
                             axis=axis)
        return hi - lo

    yz = shift_sum3(shift_sum3(air, 1), 2)
    xz = shift_sum3(shift_sum3(air, 0), 2)
    xy = shift_sum3(shift_sum3(air, 0), 1)
    nx = shift_diff(yz, 0)
    ny = shift_diff(xz, 1)
    nz_ = shift_diff(xy, 2)
    count = shift_sum3(yz, 0)
    exposed = count > 0

    def trunc_half(a):
        """Java int division by 2 truncates toward zero."""
        return jnp.where(a < 0, -((-a) // 2), a // 2)

    dx = trunc_half(nx) + 5
    dy = trunc_half(ny) + 5
    dz = trunc_half(nz_) + 5
    packed = dx + dy * 10 + dz * 100
    return exposed, packed.astype(i32)


def _big_node_exposure(v, s):
    """Corner-probe exposure for cells of size s (Octree.java:651-670): the
    <=27 probe points with all three coords in {c-1, c+s, c+s+1}, clipped to
    the grid (out-of-grid probes are skipped, i.e. not air)."""
    S = v.shape[0]
    n = S // s
    base = jnp.arange(n, dtype=i32) * s
    offs = jnp.asarray([-1, s, s + 1], i32)
    coords = base[:, None] + offs[None, :]          # (n, 3)
    valid = (coords >= 0) & (coords < S)
    cc = jnp.clip(coords, 0, S - 1)

    exposed = jnp.zeros((n, n, n), bool)
    for a in range(3):
        for b in range(3):
            for c in range(3):
                probe = v[cc[:, a][:, None, None], cc[:, b][None, :, None],
                          cc[:, c][None, None, :]] == 0
                ok = (valid[:, a][:, None, None] & valid[:, b][None, :, None]
                      & valid[:, c][None, None, :])
                exposed = exposed | (probe & ok)
    return exposed


@functools.partial(jax.jit, static_argnames=("max_lod", "capacity"))
def build_octree_jax(voxels, max_lod: int | None = None,
                     capacity: int = 1 << 20):
    """Build the SoA node table from a dense [x,y,z] voxel grid on device.

    Returns (child, mask, value, normal, n_nodes) int32 arrays of length
    ``capacity`` (+ scalar count).  If the tree exceeds ``capacity`` the count
    is still correct — check ``n_nodes <= capacity`` and rebuild bigger.
    """
    v = jnp.asarray(voxels, i32)
    S = v.shape[0]
    levels = int(np.log2(S))
    if max_lod is None:
        max_lod = levels
    max_lod = min(max_lod, levels)

    # ---- Phase A: per-level stats (bottom-up) ----
    mins, maxs = {levels: v}, {levels: v}
    for d in range(levels - 1, -1, -1):
        mins[d], maxs[d] = _pool2_min_max(mins[d + 1], maxs[d + 1])

    exposed1, packed_normals = _voxel_exposure_and_normals(v)

    stats = {}
    for d in range(1, max_lod + 1):
        s = S >> d
        corner = v[::s, ::s, ::s]
        if d == max_lod:
            leaf = jnp.ones_like(corner, dtype=bool)
            value = corner
        else:
            homog = mins[d] == maxs[d]
            first_nz = _first_nonzero_scan(v, s)
            leaf = homog
            value = jnp.where(homog, corner,
                              jnp.where(corner != 0, corner, first_nz))
        if s == 1:
            exp_ = exposed1
            normal = packed_normals
            big = jnp.zeros_like(leaf)
        else:
            exp_ = jnp.zeros_like(leaf)
            normal = jnp.zeros_like(corner)
            big = _big_node_exposure(v, s)

        # tag decision (Octree.java:556-599)
        if s == 1:
            tag = jnp.where(
                leaf & (value != 0),
                jnp.where(exp_, C.TAG_SURFACE_LEAF, C.TAG_NON_SURFACE_LEAF),
                jnp.where(leaf, C.TAG_NON_SURFACE_LEAF, C.TAG_BRANCH))
        else:
            tag = jnp.where(
                leaf & (value != 0),
                jnp.where(big, C.TAG_BRANCH, C.TAG_SUBDIV_LEAF),
                jnp.where(leaf, C.TAG_SUBDIV_LEAF, C.TAG_BRANCH))
        stats[d] = dict(tag=tag.astype(i32), value=value.astype(i32),
                        normal=jnp.where(tag == C.TAG_SURFACE_LEAF,
                                         normal, 0).astype(i32))

    # ---- Phase B: level-order allocation + emission ----
    child = jnp.zeros(capacity, i32)
    mask = jnp.zeros(capacity, i32)
    value_arr = jnp.zeros(capacity, i32)
    normal_arr = jnp.zeros(capacity, i32)
    value_arr = value_arr.at[0].set(1)  # root (dummy head, Octree.java:97-100)

    # slot grid at level d: SoA index of each existing cell (-1 = absent)
    slot = jnp.zeros((1, 1, 1), i32)  # root
    # children of the root start at slot 8 (the oracle reserves 0..7)
    level_base = 8
    n_nodes = jnp.asarray(8, i32)

    for d in range(1, max_lod + 1):
        nd = 1 << d
        st = stats[d]
        parent_slot = slot                                   # (nd/2,)^3
        parent_exists = parent_slot >= 0

        # branch cells at the parent level: the root is implicitly branch;
        # others were tagged at their own level
        if d == 1:
            parent_branch = jnp.ones((1, 1, 1), bool)
        else:
            parent_branch = (stats[d - 1]["tag"] == C.TAG_BRANCH)
        pb = parent_exists & parent_branch

        rank = jnp.cumsum(pb.reshape(-1).astype(i32)) - pb.reshape(-1).astype(i32)
        rank = rank.reshape(pb.shape)
        n_branch = jnp.sum(pb.astype(i32))

        child_base = level_base + 8 * rank                   # per parent cell
        # write parent child pointers + masks
        cmask = jnp.zeros(pb.shape, i32)
        for k, (ox, oy, oz) in enumerate(C.CHILD_OFFSETS):
            cmask = cmask | (st["tag"][ox::2, oy::2, oz::2] << (2 * k))
        # absent cells scatter to index `capacity`, which mode="drop"
        # discards (negative sentinels are not reliably dropped)
        pslots = jnp.where(pb, parent_slot, capacity).reshape(-1)
        child = child.at[pslots].set(
            jnp.where(pb, child_base, 0).reshape(-1), mode="drop")
        mask = mask.at[pslots].set(cmask.reshape(-1), mode="drop")

        # emit the children themselves
        cslot = jnp.full((nd, nd, nd), -1, i32)
        for k, (ox, oy, oz) in enumerate(C.CHILD_OFFSETS):
            cs = jnp.where(pb, child_base + k, -1)
            cslot = cslot.at[ox::2, oy::2, oz::2].set(cs)
        flat_slots = cslot.reshape(-1)
        safe_slots = jnp.where(flat_slots >= 0, flat_slots, capacity)
        value_arr = value_arr.at[safe_slots].set(st["value"].reshape(-1),
                                                 mode="drop")
        normal_arr = normal_arr.at[safe_slots].set(st["normal"].reshape(-1),
                                                   mode="drop")
        level_base = level_base + 8 * n_branch
        n_nodes = n_nodes + 8 * n_branch
        slot = cslot

    return child, mask, value_arr, normal_arr, n_nodes


def build_octree(voxels, max_lod: int | None = None,
                 capacity: int = 1 << 20, world_size: int | None = None) -> Octree:
    """Host-friendly wrapper returning an :class:`Octree` on device."""
    S = int(voxels.shape[0])
    child, mask, value, normal, n = build_octree_jax(
        voxels, max_lod=max_lod, capacity=capacity)
    n = int(n)
    if n > capacity:
        raise MemoryError(
            f"octree needs {n} node slots but capacity is {capacity}; "
            f"rebuild with capacity>={n}")
    return Octree(child=child, mask=mask, value=value, normal=normal,
                  n_nodes=n, world_size=world_size or S)
