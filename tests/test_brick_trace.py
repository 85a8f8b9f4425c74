"""Brick-wavefront traversal vs the batched ESVO kernel.

The batched kernel is itself pinned to the scalar oracle
(test_traverse_batch.py), so agreement here chains back to the oracle.
The brick path resolves to the finest leaf by construction, so parity is
checked at full depth.  Contract: hit masks agree on >=99% of rays
(grazing rays may flip under DDA vs stack-walk FP); on agreeing hits,
value/depth agree exactly and normal/t within FP slop on >=98%.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import make_sphere_voxels, make_terrain_voxels
from svo_raytracer_tpu.core import build_np
from svo_raytracer_tpu.ops import brick_scene, brick_trace, traverse
from test_traverse_batch import random_rays


def _compare(tree, origins, dirs, min_hit_agree=0.99, min_strict=0.98):
    dev = tree.to_device()
    ref = traverse.intersect_octree(dev.arrays(), jnp.asarray(origins),
                                    jnp.asarray(dirs))
    scene = brick_scene.brickify(tree).to_device()
    got = brick_trace.intersect_bricks(scene, jnp.asarray(origins),
                                       jnp.asarray(dirs))
    ref = {k: np.asarray(v) for k, v in ref._asdict().items()}
    got = {k: np.asarray(v) for k, v in got._asdict().items()}
    n = origins.shape[0]
    hit_agree = (ref["hit"] == got["hit"]).mean()
    assert hit_agree >= min_hit_agree, (
        f"hit masks agree on {hit_agree:.3f} < {min_hit_agree}")
    both = ref["hit"] & got["hit"]
    if not both.any():
        return
    strict = np.ones(n, bool)
    strict &= ~both | (ref["value"] == got["value"])
    strict &= ~both | (ref["depth"] == got["depth"])
    strict &= ~both | (np.abs(ref["t"] - got["t"]) <= 2e-4)
    strict &= ~both | (np.abs(ref["normal"] - got["normal"]).max(-1) <= 1e-5)
    strict &= ~both | (np.abs(ref["voxel_pos"] - got["voxel_pos"]).max(-1)
                       <= 1e-3)
    frac = strict[both].mean()
    assert frac >= min_strict, (
        f"strict agreement {frac:.3f} < {min_strict}; "
        f"first bad ray {np.nonzero(both & ~strict)[0][:5]}")


def test_sphere_32(sphere_tree):
    o, d = random_rays(256, seed=1)
    _compare(sphere_tree, o, d)


def test_terrain_32(terrain_tree):
    o, d = random_rays(256, seed=2)
    _compare(terrain_tree, o, d)


def test_terrain_64():
    vox = make_terrain_voxels(64, seed=5)
    tree = build_np.build_octree_np(vox)
    o, d = random_rays(256, seed=3)
    _compare(tree, o, d)


def test_sphere_64_multibrick():
    vox = make_sphere_voxels(64, radius=24)
    tree = build_np.build_octree_np(vox)
    o, d = random_rays(256, seed=4)
    _compare(tree, o, d)


def test_uniform_solid_brick_entry():
    """A fully solid 64^3 world: every brick is uniform; rays must hit the
    cube faces at the slab entry distance with the leaf's attributes."""
    vox = np.ones((64, 64, 64), np.uint8)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree).to_device()
    o = np.array([[0.5, 1.5, 1.5], [1.5, 2.7, 1.5]], np.float32)
    d = np.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], np.float32)
    res = brick_trace.intersect_bricks(scene, jnp.asarray(o), jnp.asarray(d))
    assert bool(res.hit[0]) and bool(res.hit[1])
    assert abs(float(res.t[0]) - 0.5) < 1e-3
    assert abs(float(res.t[1]) - 0.7) < 1e-3
    assert int(res.value[0]) == 1


def test_miss_everything():
    vox = make_sphere_voxels(64)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree).to_device()
    o = np.array([[1.5, 2.5, 1.5], [0.2, 0.2, 0.2]], np.float32)
    d = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, -1.0]], np.float32)
    res = brick_trace.intersect_bricks(scene, jnp.asarray(o), jnp.asarray(d))
    assert not bool(res.hit[0]) and not bool(res.hit[1])


def test_inactive_and_nonfinite_retired():
    vox = make_sphere_voxels(64)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree).to_device()
    o = np.array([[0.5, 1.5, 1.5], [np.nan, 1.5, 1.5], [0.5, 1.5, 1.5]],
                 np.float32)
    d = np.array([[1.0, 0.0, 0.0]] * 3, np.float32)
    act = jnp.asarray(np.array([True, True, False]))
    res = brick_trace.intersect_bricks(scene, jnp.asarray(o), jnp.asarray(d),
                                       active=act)
    assert bool(res.hit[0])
    assert not bool(res.hit[1])
    assert not bool(res.hit[2])


def test_brickify_small_world_rejected():
    vox = make_sphere_voxels(16)
    tree = build_np.build_octree_np(vox)
    with pytest.raises(ValueError):
        brick_scene.brickify(tree)
