"""Native (C++) vs Python .svo codec cross-checks."""

import numpy as np
import pytest

from svo_raytracer_tpu.core import build_np, svo_format
from svo_raytracer_tpu.runtime import native
from conftest import make_sphere_voxels, make_terrain_voxels


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native codec unavailable (no g++?)")


@pytest.mark.parametrize("maker", [make_sphere_voxels, make_terrain_voxels])
def test_export_matches_python(maker):
    tree = build_np.build_octree_np(maker(32))
    assert native.export_svo(tree) == svo_format.export_svo(tree)


def test_import_matches_python(sphere_tree):
    data = svo_format.export_svo(sphere_tree)
    a = native.import_svo(data, world_size=32)
    b = svo_format.import_svo(data, world_size=32)
    assert a.n_nodes == b.n_nodes
    for x, y in zip(a.arrays(), b.arrays()):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_native_roundtrip(terrain_tree):
    data = native.export_svo(terrain_tree)
    back = native.import_svo(data, world_size=terrain_tree.world_size)
    assert native.export_svo(back) == data


def test_truncated_input_rejected(sphere_tree):
    data = svo_format.export_svo(sphere_tree)
    with pytest.raises(ValueError):
        native.import_svo(data[:20])


def test_native_is_fast(sphere_tree):
    """The point of the native codec: >10x the Python importer on real trees."""
    import time

    data = svo_format.export_svo(sphere_tree)
    t0 = time.perf_counter()
    for _ in range(20):
        native.import_svo(data, world_size=32)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    svo_format.import_svo(data, world_size=32)
    python_t = time.perf_counter() - t0
    assert native_t / 20 < python_t, "native import should beat python"
