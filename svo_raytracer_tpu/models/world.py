"""Chunked world builds — the constructCompleteOctree analog.

The reference builds big worlds as a fixed top tree of interior nodes down to
chunk level (``fillEmptyChildren``, ``Octree.java:481-502``), then per chunk:
GPU noise dispatch -> 1 GB readback -> 8 host threads building sub-octrees ->
byte-buffer splice (``Octree.java:250-343``).  Here each chunk's voxels are
generated *and* reduced to a node table on device (no readback), and splicing
is an index-remapped array append.

Known graph delta vs the reference (renders identically): the reference
unconditionally creates the 8 sub-octree heads of every chunk as interior
nodes (``Octree.java:317-343``), even over homogeneous regions; our
whole-chunk build lets a homogeneous half-chunk collapse to a subdividable
leaf.  Exposure/normal clipping at chunk borders matches the reference
exactly (each chunk sees only its own grid; cross-chunk neighbors are
treated as solid — the same border artifact).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..core import build_jax
from ..core.octree import Octree, ROOT
from ..utils import constants as C


def chunk_layout(world_size: int, chunk_size: int):
    """Top-of-tree layout: (top_tree_arrays, [(origin, chunk_slot), ...]).

    Replicates fillEmptyChildren (Octree.java:481-502): a full branch tree
    of interior (value 1) nodes down to chunk level, chunks enumerated in
    DFS octant order.
    """
    levels = int(np.log2(world_size // chunk_size))
    cap = 8
    for d in range(1, levels + 1):
        cap += 8 ** d
    cap += 8  # root block padding
    child = np.zeros(cap, np.int32)
    mask = np.zeros(cap, np.int32)
    value = np.zeros(cap, np.int32)
    normal = np.zeros(cap, np.int32)
    n = [8]
    value[ROOT] = 1
    chunks: list[tuple[tuple[int, int, int], int]] = []

    def fill(parent: int, lvl: int, pos):
        if lvl == 0:
            chunks.append((tuple(int(p) for p in pos), parent))
            return
        csize = chunk_size << (lvl - 1)
        base = n[0]
        n[0] += 8
        child[parent] = base
        mask[parent] = 0  # all children are branches (tag 0)
        for k, off in enumerate(C.CHILD_OFFSETS):
            value[base + k] = 1
        for k, off in enumerate(C.CHILD_OFFSETS):
            cpos = (pos[0] + off[0] * csize, pos[1] + off[1] * csize,
                    pos[2] + off[2] * csize)
            fill(base + k, lvl - 1, cpos)

    fill(ROOT, levels, (0, 0, 0))
    top = Octree(child=child[:n[0]], mask=mask[:n[0]], value=value[:n[0]],
                 normal=normal[:n[0]], n_nodes=n[0], world_size=world_size)
    return top, chunks


def splice_chunk(world: Octree, chunk_slot: int, chunk: Octree) -> Octree:
    """Graft a chunk tree under ``chunk_slot`` — the TPU-native version of the
    byte-buffer splice at Octree.java:317-343 (append + pointer remap)."""
    chunk = chunk.to_numpy()
    offset = world.n_nodes
    m = chunk.n_nodes - 8  # drop the chunk root block (slots 0..7)

    def grow(a, extra):
        return np.concatenate([np.asarray(a), extra])

    ch = np.asarray(chunk.child[8:chunk.n_nodes]).copy()
    ch = np.where(ch > 0, ch + (offset - 8), 0).astype(np.int32)
    new = Octree(
        child=grow(world.child[:world.n_nodes], ch),
        mask=grow(world.mask[:world.n_nodes],
                  np.asarray(chunk.mask[8:chunk.n_nodes])),
        value=grow(world.value[:world.n_nodes],
                   np.asarray(chunk.value[8:chunk.n_nodes])),
        normal=grow(world.normal[:world.n_nodes],
                    np.asarray(chunk.normal[8:chunk.n_nodes])),
        n_nodes=world.n_nodes + m,
        world_size=world.world_size,
    )
    # the chunk slot adopts the chunk root's payload
    root_child = int(chunk.child[ROOT])
    new.child[chunk_slot] = (offset + root_child - 8) if root_child else 0
    new.mask[chunk_slot] = int(chunk.mask[ROOT])
    new.value[chunk_slot] = int(chunk.value[ROOT])
    return new


def build_world(world_size: int, chunk_size: int,
                gen_fn: Callable[[tuple[int, int, int]], np.ndarray],
                max_lod: int | None = None,
                chunk_capacity: int = 1 << 20,
                world_offset=(0, 0, 0),
                verbose: bool = False) -> Octree:
    """Build a chunked world octree.

    ``gen_fn(origin) -> (chunk_size^3) voxel grid`` (device or host array).
    ``max_lod`` is depth *within a chunk* (reference: 1 + maxLOD(9) = 10
    levels for a 1024 chunk = full voxel res; pass 10 or None for the same).
    ``world_offset`` shifts generation coordinates (Constants.WORLD_OFFSET /
    the rootPos arg of Octree.java:358).
    """
    if world_size == chunk_size:
        v = np.asarray(gen_fn(tuple(world_offset)))
        return build_jax.build_octree(v, max_lod=max_lod,
                                      capacity=chunk_capacity,
                                      world_size=world_size)

    world, chunks = chunk_layout(world_size, chunk_size)
    for i, (origin, slot) in enumerate(chunks):
        gpos = (origin[0] + world_offset[0], origin[1] + world_offset[1],
                origin[2] + world_offset[2])
        v = gen_fn(gpos)
        chunk = build_jax.build_octree(v, max_lod=max_lod,
                                       capacity=chunk_capacity,
                                       world_size=chunk_size)
        world = splice_chunk(world, slot, chunk)
        if verbose:
            print(f"chunk {i + 1}/{len(chunks)} at {gpos}: "
                  f"{chunk.n_nodes} nodes, world total {world.n_nodes}")
    return world
