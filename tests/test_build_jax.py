"""Device-side builder vs NumPy oracle — graph-exact equivalence.

``svo_format.export_svo`` canonicalizes both builders' allocation orders to
BFS, so byte equality of the exports proves the *graphs* (structure, tags,
values, masks, normals) are identical.
"""

import numpy as np
import pytest

from svo_raytracer_tpu.core import build_jax, build_np, svo_format
from conftest import make_sphere_voxels, make_terrain_voxels


def assert_same_graph(voxels, max_lod=None):
    ref = build_np.build_octree_np(voxels, max_lod=max_lod)
    dev = build_jax.build_octree(voxels, max_lod=max_lod,
                                 capacity=max(ref.n_nodes * 2, 1024))
    assert dev.n_nodes == ref.n_nodes, (
        f"node count {dev.n_nodes} != oracle {ref.n_nodes}")
    assert svo_format.export_svo(dev.to_numpy()) == svo_format.export_svo(ref)


def test_sphere(sphere_voxels):
    assert_same_graph(sphere_voxels)


def test_terrain(terrain_voxels):
    assert_same_graph(terrain_voxels)


def test_checkerboard():
    v = (np.indices((16, 16, 16)).sum(0) % 2).astype(np.uint8)
    assert_same_graph(v)


def test_empty_and_full():
    assert_same_graph(np.zeros((16, 16, 16), np.uint8))
    assert_same_graph(np.ones((16, 16, 16), np.uint8))


def test_multi_material():
    rng = np.random.default_rng(11)
    v = rng.integers(0, 4, (16, 16, 16)).astype(np.uint8)
    v[:8] = 0
    v[8:, :8] = 2  # homogeneous sub-blocks of several materials
    assert_same_graph(v)


def test_lod_capped():
    assert_same_graph(make_sphere_voxels(32), max_lod=3)
    assert_same_graph(make_terrain_voxels(32), max_lod=4)


def test_single_voxel():
    v = np.zeros((8, 8, 8), np.uint8)
    v[3, 4, 2] = 5
    assert_same_graph(v)


def test_edge_touching_solid():
    """Solids at grid borders exercise the out-of-grid clipping in both
    exposure tests."""
    v = np.zeros((16, 16, 16), np.uint8)
    v[0, :, :] = 1
    v[:, 15, :] = 2
    v[7, 0, 15] = 3
    assert_same_graph(v)


def test_capacity_overflow_detected():
    v = make_sphere_voxels(32)
    with pytest.raises(MemoryError):
        build_jax.build_octree(v, capacity=64)
