"""Wavefront-v2 Pallas path vs the XLA brick reference.

Runs in Pallas interpret mode on CPU (compiled-mode correctness is
exercised on TPU by the .tpu_jobs regression gate).  The two paths share
the scene format and decode, so fields should agree to FP slop; hit
masks exact.
"""

import numpy as np

import jax.numpy as jnp

from conftest import make_sphere_voxels, make_terrain_voxels
from svo_raytracer_tpu.core import build_np
from svo_raytracer_tpu.ops import brick_scene, brick_trace, wavefront
from test_traverse_batch import random_rays


def _compare(tree, origins, dirs, min_hit_agree=0.995, min_strict=0.98,
             **kw):
    scene = brick_scene.brickify(tree).to_device()
    ws = wavefront.prepare(scene)
    ref = brick_trace.intersect_bricks(scene, jnp.asarray(origins),
                                       jnp.asarray(dirs))
    got = wavefront.intersect_wavefront(ws, jnp.asarray(origins),
                                        jnp.asarray(dirs), interpret=True,
                                        **kw)
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


def test_terrain_64_no_early_exit():
    vox = make_terrain_voxels(64, seed=3)
    tree = build_np.build_octree_np(vox)
    o, d = random_rays(128, seed=13)
    _compare(tree, o, d, early_exit=False)


def test_active_mask_and_nan():
    vox = make_sphere_voxels(64, radius=24)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree).to_device()
    ws = wavefront.prepare(scene)
    o = np.array([[0.5, 1.5, 1.5], [np.nan, 1.5, 1.5], [0.5, 1.5, 1.5]],
                 np.float32)
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (3, 1))
    act = jnp.asarray([True, True, False])
    res = wavefront.intersect_wavefront(ws, jnp.asarray(o), jnp.asarray(d),
                                        active=act, interpret=True)
    hit = np.asarray(res.hit)
    assert hit[0] and not hit[1] and not hit[2]


def test_profile_and_compaction():
    vox = make_terrain_voxels(64, seed=5)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree).to_device()
    ws = wavefront.prepare(scene)
    o, d = random_rays(4096, seed=14)
    prof = {}
    res = wavefront.intersect_wavefront(ws, jnp.asarray(o), jnp.asarray(d),
                                        interpret=True, profile=prof)
    rounds = prof["rounds"]
    assert rounds[0]["r"] == 0
    # exact actives must be non-increasing over the sorted rounds and the
    # working size must compact (round "1L" is the sort-free pixel round)
    acts = [r["active"] for r in rounds if isinstance(r["r"], int)
            and r["r"] >= 1]
    assert all(a >= b for a, b in zip(acts, acts[1:])), acts
    assert rounds[-1]["size"] <= rounds[1]["size"]
    assert bool(np.asarray(res.hit).any())
