"""Empty-space skip grid: per-ray VMEM DDA prepass seeding ESVO traversal.

The reference shortens fine rays with a 1-per-4x4-tile coarse beam prepass
(svobeam.comp:618-636) that itself walks the octree.  On TPU the octree
walk is HBM-gather-bound, so the skip must not touch the node table at all:
instead a G^3 occupancy grid (G <= 32, one bit per cell) lives in VMEM and every ray DDA-marches it (ops/brick_dda.py) to find
a conservative entry distance to the first potentially-solid cell.  Rays
whose march exits the grid without meeting an occupied cell are definite
misses and skip the ESVO traversal entirely (sky/bounce-to-sky rays become
gather-free).

Grid <-> world mapping: the octree spans the world cube [1,2]^3
(README.md), so cell (i,j,k) of the G^3 grid spans 1 + i/G .. 1 + (i+1)/G
per axis, and a DDA distance t_g in grid units equals t_g / G along the
same (unit or not) direction vector in world units.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import brick_dda

#: safety margin (world units) backed off the conservative entry distance
#: before restarting ESVO, covering the DDA's own entry nudge (1e-4 grid
#: units) and float re-parameterization slop
_EPS_WORLD = 1e-4


def build_skip_grid(tree, grid_size: int = 32) -> np.ndarray:
    """Occupancy of a G^3 cell grid from the SoA node table (host NumPy).

    A cell is occupied iff its world cube contains any non-air leaf.  The
    walk descends level-order only to cell size: an air leaf marks nothing,
    a solid leaf marks its whole span, and any *branch* surviving at cell
    size must contain solid somewhere (homogeneous regions are collapsed to
    leaves by every builder — build_np.py / build_jax.py), so it marks its
    cell.  Returns packed words for :func:`brick_dda.table_rows`.
    """
    child = np.asarray(tree.child[:tree.n_nodes])
    mask = np.asarray(tree.mask[:tree.n_nodes])
    value = np.asarray(tree.value[:tree.n_nodes])
    G = grid_size
    ws = tree.world_size
    if ws < G:
        # worlds smaller than the grid: cells are sub-voxel; scale up
        G = ws
    cell = ws // G
    occ = np.zeros((G, G, G), bool)

    # frontier: node indices + cell-unit origins, one level at a time
    nodes = np.array([0], np.int64)
    xs = np.array([0], np.int64)
    ys = np.array([0], np.int64)
    zs = np.array([0], np.int64)
    size = ws  # voxels spanned by frontier nodes

    while True:
        span = size // cell  # cells spanned by a frontier node
        is_branch = child[nodes] != 0
        solid_leaf = ~is_branch & (value[nodes] != 0)
        if span <= 1:
            hit = is_branch | solid_leaf
            occ[xs[hit], ys[hit], zs[hit]] = True
            break
        # solid leaves mark their whole span
        for xi, yi, zi in zip(xs[solid_leaf], ys[solid_leaf], zs[solid_leaf]):
            occ[xi:xi + span, yi:yi + span, zi:zi + span] = True
        if not is_branch.any():
            break
        bn = nodes[is_branch]
        bx, by, bz = xs[is_branch], ys[is_branch], zs[is_branch]
        k = np.arange(8, dtype=np.int64)
        nodes = (child[bn][:, None] + k[None, :]).reshape(-1)
        half = span // 2
        xs = (bx[:, None] + (k[None, :] & 1) * half).reshape(-1)
        ys = (by[:, None] + ((k[None, :] >> 1) & 1) * half).reshape(-1)
        zs = (bz[:, None] + ((k[None, :] >> 2) & 1) * half).reshape(-1)
        size //= 2

    return brick_dda.pack_occupancy(occ)


def _auto_interpret(interpret):
    """Pallas compiles only on TPU; CPU (tests, virtual meshes) interprets."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


@functools.partial(jax.jit, static_argnames=("grid_size", "interpret"))
def skip_distances(occ_table, origins, dirs, grid_size=32, active=None,
                   interpret=None):
    """(skip_t, maybe_hit): world-unit skip distance along ``dirs`` and a
    conservative may-hit mask for a ray batch in world coordinates."""
    interpret = _auto_interpret(interpret)
    G = grid_size
    o_g = (origins.astype(jnp.float32) - 1.0) * np.float32(G)
    out = brick_dda.coarse_dda(occ_table, o_g, dirs, grid_size=G,
                               active=active, interpret=interpret)
    skip = jnp.maximum(out["t"] / np.float32(G) - np.float32(_EPS_WORLD), 0.0)
    return jnp.where(out["hit"], skip, 0.0), out["hit"]


def make_skipping_isect(isect, occ_table, grid_size=32, interpret=None):
    """Wrap a traversal function with the DDA empty-space skip.

    ``isect(origins, dirs, ..., active=...)`` -> HitResult.  The wrapper
    moves each ray's origin forward by the skip distance, drops definite
    misses from the traversal batch, and adds the skip back onto ``t``
    (``hit_pos``/``voxel_pos`` are computed from the moved origin and need
    no fixup).  Semantically the skip is the beam prepass generalized to
    per-ray exactness — same conservative-undershoot contract
    (svotrace.comp:656-658) — so hits match the unskipped traversal up to
    the usual restarted-ray FP variance.
    """

    def wrapped(origins, dirs, *args, active=None, **kwargs):
        skip, maybe = skip_distances(occ_table, origins, dirs,
                                     grid_size=grid_size, active=active,
                                     interpret=interpret)
        act = maybe if active is None else (maybe & active)
        o2 = origins + skip[:, None] * dirs
        res = isect(o2, dirs, *args, active=act, **kwargs)
        return res._replace(t=jnp.where(res.hit, res.t + skip, res.t))

    return wrapped
