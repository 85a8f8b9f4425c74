"""Incremental brickify (brick_scene.brickify_patch + wavefront.apply_patch)
vs a from-scratch brickify after an SDF edit — semantic equality per brick
cell (slot numbering legitimately differs: the patch appends, a rebuild
re-enumerates; orphaned slots are tombstones like Octree.java:954-956).
"""

import copy

import numpy as np

import jax.numpy as jnp

from conftest import make_terrain_voxels
from svo_raytracer_tpu.core import build_np, sdf
from svo_raytracer_tpu.ops import brick_scene, wavefront
from test_traverse_batch import random_rays


def _edit(tree, value, center=(40, 30, 40), radius=10):
    ball = sdf.Sphere(np.asarray(center), radius)
    new_tree, _cb = sdf.use_sdf_brush(tree, ball, value)
    return new_tree, ball


def _assert_semantic_equal(scene, full):
    G = scene.grid_size
    assert full.grid_size == G
    for c in range(G * G * G):
        s_a, s_b = int(scene.brick_slot[c]), int(full.brick_slot[c])
        assert (s_a < 0) == (s_b < 0), f"cell {c} mixedness"
        if s_a < 0:
            assert scene.brick_attr[c] == full.brick_attr[c], f"cell {c}"
        else:
            np.testing.assert_array_equal(scene.occ_words[s_a],
                                          full.occ_words[s_b],
                                          err_msg=f"cell {c} occ")
            np.testing.assert_array_equal(scene.attrs[s_a],
                                          full.attrs[s_b],
                                          err_msg=f"cell {c} attrs")
    np.testing.assert_array_equal(scene.l0_table, full.l0_table)


def test_patch_matches_full_rebuild():
    vox = make_terrain_voxels(64, seed=7)
    tree = build_np.build_octree_np(vox)
    scene = brickify_copy = brick_scene.brickify(tree)
    scene = copy.deepcopy(brickify_copy)

    tree2, ball = _edit(tree, value=1)
    patch = brick_scene.brickify_patch(tree2, scene, ball.min, ball.max)
    full = brick_scene.brickify(tree2)
    _assert_semantic_equal(scene, full)
    assert patch.n_mixed == scene.n_mixed

    # second edit: subtract (exercises solid->air transitions)
    tree3, ball2 = _edit(tree2, value=0, center=(40, 34, 40), radius=12)
    patch2 = brick_scene.brickify_patch(tree3, scene, ball2.min, ball2.max)
    full3 = brick_scene.brickify(tree3)
    _assert_semantic_equal(scene, full3)
    assert patch2.n_mixed >= full3.n_mixed  # orphans never reclaimed


def test_apply_patch_device_render():
    vox = make_terrain_voxels(64, seed=9)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree)
    ws0 = wavefront.prepare(copy.deepcopy(scene))

    tree2, ball = _edit(tree, value=1, center=(32, 36, 32), radius=9)
    patch = brick_scene.brickify_patch(tree2, scene, ball.min, ball.max)
    ws1 = wavefront.apply_patch(ws0, scene, patch)
    ws_full = wavefront.prepare(brick_scene.brickify(tree2))

    o, d = random_rays(512, seed=3)
    a = wavefront.intersect_wavefront(ws1, jnp.asarray(o), jnp.asarray(d),
                                      interpret=True)
    b = wavefront.intersect_wavefront(ws_full, jnp.asarray(o),
                                      jnp.asarray(d), interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    h = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(a.value)[h],
                                  np.asarray(b.value)[h])
    np.testing.assert_allclose(np.asarray(a.t)[h], np.asarray(b.t)[h],
                               atol=1e-5)
