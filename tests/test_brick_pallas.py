"""Pallas brick-wavefront path vs the XLA brick reference.

Run in Pallas interpret mode on CPU (the kernel itself is exercised
compiled on TPU by the bench/driver).  The two paths share the scene
format and decode, so fields should agree to FP slop; hit masks exact.
"""

import numpy as np

import jax.numpy as jnp

from conftest import make_sphere_voxels, make_terrain_voxels
from svo_raytracer_tpu.core import build_np
from svo_raytracer_tpu.ops import brick_pallas, brick_scene, brick_trace
from test_traverse_batch import random_rays


def _compare(tree, origins, dirs, min_hit_agree=0.995, min_strict=0.98):
    scene = brick_scene.brickify(tree).to_device()
    ref = brick_trace.intersect_bricks(scene, jnp.asarray(origins),
                                       jnp.asarray(dirs))
    got = brick_pallas.intersect_bricks_tpu(scene, jnp.asarray(origins),
                                            jnp.asarray(dirs),
                                            interpret=True)
    ref = {k: np.asarray(v) for k, v in ref._asdict().items()}
    got = {k: np.asarray(v) for k, v in got._asdict().items()}
    agree = (ref["hit"] == got["hit"]).mean()
    assert agree >= min_hit_agree, f"hit agreement {agree}"
    both = ref["hit"] & got["hit"]
    if not both.any():
        return
    strict = np.ones(origins.shape[0], bool)
    strict &= ~both | (ref["value"] == got["value"])
    strict &= ~both | (ref["depth"] == got["depth"])
    strict &= ~both | (np.abs(ref["t"] - got["t"]) <= 2e-4)
    strict &= ~both | (np.abs(ref["normal"] - got["normal"]).max(-1) <= 1e-5)
    frac = strict[both].mean()
    assert frac >= min_strict, (
        f"strict {frac:.3f}; bad {np.nonzero(both & ~strict)[0][:5]}")


def test_sphere_64():
    vox = make_sphere_voxels(64, radius=24)
    tree = build_np.build_octree_np(vox)
    o, d = random_rays(192, seed=11)
    _compare(tree, o, d)


def test_terrain_64():
    vox = make_terrain_voxels(64, seed=7)
    tree = build_np.build_octree_np(vox)
    o, d = random_rays(192, seed=12)
    _compare(tree, o, d)


def test_active_mask_and_nan():
    vox = make_sphere_voxels(64, radius=24)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree).to_device()
    o = np.array([[0.5, 1.5, 1.5], [np.nan, 1.5, 1.5], [0.5, 1.5, 1.5]],
                 np.float32)
    d = np.array([[1.0, 0.0, 0.0]] * 3, np.float32)
    act = jnp.asarray(np.array([True, True, False]))
    res = brick_pallas.intersect_bricks_tpu(scene, jnp.asarray(o),
                                            jnp.asarray(d), active=act,
                                            interpret=True)
    assert bool(res.hit[0])
    assert not bool(res.hit[1])
    assert not bool(res.hit[2])


def test_overflow_slack_punts():
    """A tiny slack forces group-padding overflow; punted rays must still
    resolve in later rounds (correctness is schedule-independent)."""
    vox = make_terrain_voxels(64, seed=9)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree).to_device()
    o, d = random_rays(128, seed=13)
    ref = brick_trace.intersect_bricks(scene, jnp.asarray(o), jnp.asarray(d))
    got = brick_pallas.intersect_bricks_tpu(scene, jnp.asarray(o),
                                            jnp.asarray(d), interpret=True,
                                            slack=1024, max_rounds=64)
    assert (np.asarray(ref.hit) == np.asarray(got.hit)).mean() >= 0.99
