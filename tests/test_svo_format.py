"""`.svo` codec tests: SoA table <-> reference byte format round-trips.

The analog of the reference's serialization smoke test (ByteCacheTest.eoTest,
src/tests/ByteCacheTest.java:29-35) but with real assertions: graph-exact
round-trips and a byte-level decode of hand-built buffers in the reference
layout (Octree.java:68-95).
"""

import struct

import numpy as np

from svo_raytracer_tpu.core import svo_format, octree
from svo_raytracer_tpu.utils import constants as C
from test_octree_build import reconstruct_voxels


def test_roundtrip_sphere(sphere_tree, sphere_voxels):
    data = svo_format.export_svo(sphere_tree)
    tree2 = svo_format.import_svo(data, world_size=sphere_tree.world_size)
    np.testing.assert_array_equal(
        reconstruct_voxels(tree2), sphere_voxels.astype(np.int32))
    # Normals and masks survive too: re-export must be byte-identical.
    assert svo_format.export_svo(tree2) == data


def test_roundtrip_terrain(terrain_tree, terrain_voxels):
    data = svo_format.export_svo(terrain_tree)
    tree2 = svo_format.import_svo(data, world_size=terrain_tree.world_size)
    np.testing.assert_array_equal(
        reconstruct_voxels(tree2), terrain_voxels.astype(np.int32))
    assert svo_format.export_svo(tree2) == data


def test_file_roundtrip(tmp_path, sphere_tree):
    """Header format: 4-byte big-endian length (Octree.java:974-993)."""
    path = str(tmp_path / "debug.svo")
    svo_format.write_svo_file(sphere_tree, path)
    raw = open(path, "rb").read()
    (length,) = struct.unpack(">i", raw[:4])
    assert length == len(raw) - 4
    tree2 = svo_format.read_svo_file(path, world_size=sphere_tree.world_size)
    assert svo_format.export_svo(tree2) == svo_format.export_svo(sphere_tree)


def test_hand_built_buffer_decodes():
    """Decode a hand-assembled reference buffer: root with 8 children —
    child 0 a surface leaf (value 2, normal 159), children 1-6 non-surface
    air leaves, child 7 a subdividable leaf (value 3)."""
    mask = (C.TAG_SURFACE_LEAF << 0) | (C.TAG_SUBDIV_LEAF << 14)
    for k in range(1, 7):
        mask |= C.TAG_NON_SURFACE_LEAF << (2 * k)
    out = bytearray()
    out += bytes([1]) + struct.pack(">i", 7) + struct.pack(">H", mask)  # root
    out += bytes([2, 159 & 0xFF, 159 >> 8])  # surface leaf, LE normal
    out += bytes([0]) * 6  # six 1-byte air leaves
    out += bytes([3]) + bytes(6)  # subdividable leaf
    tree = svo_format.import_svo(bytes(out), world_size=2)
    base = int(tree.child[octree.ROOT])
    assert base != 0
    m = int(tree.mask[octree.ROOT])
    assert (m >> 0) & 3 == C.TAG_SURFACE_LEAF
    assert (m >> 14) & 3 == C.TAG_SUBDIV_LEAF
    assert int(tree.value[base + 0]) == 2
    assert int(tree.normal[base + 0]) == 159
    assert int(tree.value[base + 7]) == 3
    for k in range(1, 7):
        assert int(tree.value[base + k]) == 0
    # Round-trip back to identical bytes.
    assert svo_format.export_svo(tree) == bytes(out)
