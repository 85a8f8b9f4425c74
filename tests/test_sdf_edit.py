"""SDF brush edit tests: add/subtract spheres and boxes, dirty-range
tracking, and render-level verification of edits."""

import numpy as np
import jax.numpy as jnp
import pytest

from svo_raytracer_tpu.core import build_np, sdf
from svo_raytracer_tpu.ops import traverse
from conftest import make_sphere_voxels
from test_octree_build import reconstruct_voxels


@pytest.fixture
def flat_world():
    """32^3 world with a floor slab."""
    v = np.zeros((32, 32, 32), np.uint8)
    v[:, :8, :] = 1
    return build_np.build_octree_np(v)


def test_add_sphere_creates_solid(flat_world):
    tree = flat_world
    ball = sdf.Sphere((16, 16, 16), 6)
    new, cb = sdf.use_sdf_brush(tree, ball, 2, max_lod=5)
    assert new.n_nodes > tree.n_nodes
    assert cb.start1 == tree.n_nodes and cb.end1 == new.n_nodes
    recon = reconstruct_voxels(new.to_numpy())
    # the ball region is now solid with value 2
    assert recon[16, 16, 16] == 2
    assert recon[16, 13, 16] == 2
    # far away unchanged
    assert recon[2, 2, 2] == 1
    assert recon[2, 30, 2] == 0


def test_subtract_sphere_carves_floor(flat_world):
    tree = flat_world
    ball = sdf.Sphere((16, 7, 16), 4)
    new, cb = sdf.use_sdf_brush(tree, ball, 0, max_lod=5)
    recon = reconstruct_voxels(new.to_numpy())
    assert recon[16, 6, 16] == 0  # carved
    assert recon[2, 6, 2] == 1    # floor intact away from the ball


def test_edit_traversal_consistency(flat_world):
    """Rays against the edited tree hit the new sphere."""
    tree = flat_world
    ball = sdf.Sphere((16, 20, 16), 5)
    new, _ = sdf.use_sdf_brush(tree, ball, 3, max_lod=5)
    dev = new.to_device()
    o = jnp.asarray([[1.5, 1.95, 1.5]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    res = traverse.intersect_octree(dev.arrays(), o, d)
    assert bool(res.hit[0])
    assert int(res.value[0]) == 3
    # hits the sphere top (~y=25/32) before the floor
    assert float(res.t[0]) < 0.3


def test_noop_edit_outside_world(flat_world):
    tree = flat_world
    far = sdf.Sphere((1000, 1000, 1000), 5)
    new, cb = sdf.use_sdf_brush(tree, far, 1, max_lod=5)
    assert new.n_nodes == tree.n_nodes
    assert cb.start1 == cb.end1


def test_same_value_paint_is_noop_on_leaf():
    v = np.ones((16, 16, 16), np.uint8)
    tree = build_np.build_octree_np(v)
    n0 = tree.n_nodes
    ball = sdf.Sphere((8, 8, 8), 3)
    new, cb = sdf.use_sdf_brush(tree, ball, 1, max_lod=4)
    # painting value 1 into homogeneous value-1 leaves: subdivide short-
    # circuits on equal values (Octree.java:833-835)
    assert new.n_nodes == n0


def test_tombstones_on_full_containment(flat_world):
    """A brush fully containing a branch node promotes it to a subdividable
    leaf and tombstones its direct children with DELETE_VALUE."""
    tree = flat_world
    # huge additive ball swallowing the lower half of the world
    ball = sdf.Sphere((16, 0, 16), 26)
    new, _ = sdf.use_sdf_brush(tree, ball, 2, max_lod=5)
    from svo_raytracer_tpu.utils.constants import DELETE_VALUE
    vals = np.asarray(new.value[:new.n_nodes])
    assert (vals == DELETE_VALUE).any()


def test_box_brush_is_inert_quirk(flat_world):
    """Reference quirk preserved: Box.distance adds the interior scalar m to
    every component *inside* length() (Box.java:42-44), so the box interior
    has positive distance — containsVolume never fires and the box brush
    changes no leaf voxels (it only splits boundary nodes).  Pin exactly
    that behavior."""
    tree = flat_world
    box = sdf.Box((16, 12, 16), 5, 3, 4)
    assert box.distance((16, 12, 16)) > 0  # center is "outside"(!)
    assert box.distance((16, 15, 16)) == 0  # shell
    new, _ = sdf.use_sdf_brush(tree, box, 2, max_lod=5)
    recon = reconstruct_voxels(new.to_numpy())
    v = np.zeros((32, 32, 32), np.int32)
    v[:, :8, :] = 1
    np.testing.assert_array_equal(recon, v)


def test_dirty_ranges_cover_changes(flat_world):
    """Every slot that differs between old and new trees must fall inside
    one of the two dirty ranges."""
    tree = flat_world
    ball = sdf.Sphere((16, 10, 16), 5)
    new, cb = sdf.use_sdf_brush(tree, ball, 2, max_lod=5)
    old_n = tree.n_nodes
    for name in ("child", "mask", "value", "normal"):
        a = np.asarray(getattr(tree, name)[:old_n])
        b = np.asarray(getattr(new, name)[:old_n])
        diff = np.nonzero(a != b)[0]
        for s in diff:
            assert cb.start0 <= s < cb.end0, (
                f"{name}[{s}] changed outside existing-range "
                f"[{cb.start0},{cb.end0})")
    assert new.n_nodes == cb.end1
