"""Octree builder semantics tests.

The analog of the reference's ByteCacheTest leaf-mask arithmetic checks
(src/tests/ByteCacheTest.java:37-47) plus the structural properties the
reference only ever verified by eyeball.
"""

import numpy as np
import pytest

from svo_raytracer_tpu.core import build_np, octree
from svo_raytracer_tpu.utils import constants as C
from conftest import make_sphere_voxels


def _walk_leaves(tree, parent=octree.ROOT, pos=(0, 0, 0), size=None, out=None):
    """Collect (pos, size, tag, value) for every child slot reachable."""
    if size is None:
        size = tree.world_size
    if out is None:
        out = []
    base = int(tree.child[parent])
    if base == 0:
        return out
    m = int(tree.mask[parent])
    cs = size // 2
    for k in range(8):
        off = C.CHILD_OFFSETS[k]
        cpos = (pos[0] + off[0] * cs, pos[1] + off[1] * cs, pos[2] + off[2] * cs)
        tag = (m >> (2 * k)) & 3
        ci = base + k
        if tag == C.TAG_BRANCH and int(tree.child[ci]) != 0:
            _walk_leaves(tree, ci, cpos, cs, out)
        else:
            out.append((cpos, cs, tag, int(tree.value[ci])))
    return out


def reconstruct_voxels(tree):
    """Rasterize the octree back to a dense grid (leaf values fill cells)."""
    S = tree.world_size
    grid = np.zeros((S, S, S), np.int32)
    for (x, y, z), cs, tag, val in _walk_leaves(tree):
        grid[x:x + cs, y:y + cs, z:z + cs] = val
    return grid


def test_sphere_roundtrip(sphere_voxels, sphere_tree):
    """Leaf rasterization must reproduce the dense grid exactly at full LOD."""
    recon = reconstruct_voxels(sphere_tree)
    np.testing.assert_array_equal(recon, sphere_voxels.astype(np.int32))


def test_terrain_roundtrip(terrain_voxels, terrain_tree):
    recon = reconstruct_voxels(terrain_tree)
    np.testing.assert_array_equal(recon, terrain_voxels.astype(np.int32))


def test_node_types_present(sphere_tree):
    """A solid ball must produce all four node types."""
    counts = sphere_tree.node_counts()
    assert counts["interior"] > 0
    assert counts["surface_leaf"] > 0
    assert counts["non_surface_leaf"] > 0
    assert counts["subdividable_leaf"] > 0


def test_surface_normals_point_outward(sphere_tree):
    """Surface-leaf normals on a ball point away from the center (toward air)."""
    from svo_raytracer_tpu.utils.mathutil import unpack_normal

    center = np.array([16.0, 16.0, 16.0])
    tree = sphere_tree

    def walk_idx(parent, pos, size, out):
        base = int(tree.child[parent])
        if base == 0:
            return
        m = int(tree.mask[parent])
        cs = size // 2
        for k in range(8):
            off = C.CHILD_OFFSETS[k]
            cpos = (pos[0] + off[0] * cs, pos[1] + off[1] * cs,
                    pos[2] + off[2] * cs)
            ci = base + k
            tag = (m >> (2 * k)) & 3
            if tag == C.TAG_BRANCH and int(tree.child[ci]) != 0:
                walk_idx(ci, cpos, cs, out)
            elif tag == C.TAG_SURFACE_LEAF:
                out.append((cpos, ci))
    surf = []
    walk_idx(octree.ROOT, (0, 0, 0), tree.world_size, surf)
    agree = 0
    for (pos, ci) in surf:
        raw = int(tree.normal[ci])
        n = unpack_normal(raw)
        radial = np.array(pos, float) - center
        if np.dot(n, radial) > 0:
            agree += 1
    assert agree / len(surf) > 0.9


def test_lod_capped_build():
    """max_lod < full depth: leaves are corner samples (Octree.java:533)."""
    v = make_sphere_voxels(32)
    tree = build_np.build_octree_np(v, max_lod=3)  # cells of 4^3
    recon = reconstruct_voxels(tree)
    corner = v[::4, ::4, ::4]
    expected = np.repeat(np.repeat(np.repeat(corner, 4, 0), 4, 1), 4, 2)
    # Only cells whose parent path was fully subdivided match corner sampling;
    # homogeneous big cells keep their (identical) value. Both equal expected
    # wherever expected is constant per 4-cell — which corner-sampling is.
    # The reconstruction at LOD 3 must agree with corner downsampling.
    np.testing.assert_array_equal(recon, expected.astype(np.int32))


def test_empty_grid_is_air():
    v = np.zeros((8, 8, 8), np.uint8)
    tree = build_np.build_octree_np(v)
    # Root's children must all be air leaves; nothing deeper.
    m = int(tree.mask[octree.ROOT])
    for k in range(8):
        tag = (m >> (2 * k)) & 3
        assert tag in (C.TAG_SUBDIV_LEAF, C.TAG_NON_SURFACE_LEAF)
        assert int(tree.value[int(tree.child[octree.ROOT]) + k]) == 0


def test_full_grid_has_no_surface_inside():
    v = np.ones((8, 8, 8), np.uint8)
    tree = build_np.build_octree_np(v)
    counts = tree.node_counts()
    # A completely full grid: exposure probes outside the grid are skipped,
    # so everything collapses to subdividable leaves (no surface leaves).
    assert counts["surface_leaf"] == 0
