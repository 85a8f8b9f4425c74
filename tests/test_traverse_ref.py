"""Scalar traversal oracle tests — independent geometric ground truth.

The reference never tested its traversal (SURVEY.md §4: "correctness is judged
by eyeball"); here the oracle is pinned down against analytic ray-box and
ray-sphere geometry before the batched kernels are verified against the oracle.
World convention: the octree spans the cube [1,2]^3; voxel (i,j,k) of an S-grid
spans [1+i/S, 1+(i+1)/S] per axis (Util.toVoxelSpace, Util.java:11-18).
"""

import numpy as np
import pytest

from svo_raytracer_tpu.core import build_np
from svo_raytracer_tpu.ops import traverse_ref


def single_voxel_tree(size=8, at=(3, 4, 2)):
    v = np.zeros((size, size, size), np.uint8)
    v[at] = 5
    return build_np.build_octree_np(v), v


def test_axis_ray_hits_single_voxel():
    size = 8
    at = (3, 4, 2)
    tree, _ = single_voxel_tree(size, at)
    # Ray along +x at the voxel's center height/depth.
    cy = 1 + (at[1] + 0.5) / size
    cz = 1 + (at[2] + 0.5) / size
    origin = [0.5, cy, cz]
    res = traverse_ref.intersect_octree(tree, origin, [1.0, 0.0, 0.0])
    assert res.hit
    assert res.value == 5
    x_enter = 1 + at[0] / size
    np.testing.assert_allclose(res.t, x_enter - 0.5, atol=1e-5)
    assert res.scale_exp2 == pytest.approx(1.0 / size)


def test_axis_ray_misses_offset_voxel():
    size = 8
    tree, _ = single_voxel_tree(size, (3, 4, 2))
    cy = 1 + (6 + 0.5) / size  # wrong row
    cz = 1 + (2 + 0.5) / size
    res = traverse_ref.intersect_octree(tree, [0.5, cy, cz], [1.0, 0.0, 0.0])
    assert not res.hit


def test_negative_direction_hits():
    size = 8
    at = (3, 4, 2)
    tree, _ = single_voxel_tree(size, at)
    cy = 1 + (at[1] + 0.5) / size
    cz = 1 + (at[2] + 0.5) / size
    res = traverse_ref.intersect_octree(tree, [2.5, cy, cz], [-1.0, 0.0, 0.0])
    assert res.hit and res.value == 5
    x_exit = 1 + (at[0] + 1) / size
    np.testing.assert_allclose(res.t, 2.5 - x_exit, atol=1e-5)


def test_sphere_hit_distance_matches_analytic(sphere_tree):
    """Rays at the sphere from many directions: voxel-grid hit distance must be
    within one voxel diagonal of the analytic sphere hit."""
    S = sphere_tree.world_size  # 32, ball radius 8 at center 16
    center = np.array([1.5, 1.5, 1.5])
    radius = 8.5 / S  # voxelized ball includes dist<=0 → ~radius+0.5 voxels
    rng = np.random.default_rng(1)
    hits = 0
    for _ in range(40):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        origin = center - d * 0.45
        res = traverse_ref.intersect_octree(tree=sphere_tree, origin=origin,
                                            direction=d)
        assert res.hit, f"ray {d} should hit the ball"
        analytic_t = 0.45 - radius
        assert abs(res.t - analytic_t) < 2.0 * np.sqrt(3) / S
        hits += 1
    assert hits == 40


def test_ray_away_from_sphere_misses(sphere_tree):
    res = traverse_ref.intersect_octree(sphere_tree, [1.5, 1.5, 1.95],
                                        [0.0, 0.0, 1.0])
    assert not res.hit


def test_sphere_normals_radial(sphere_tree):
    rng = np.random.default_rng(2)
    agree = total = 0
    for _ in range(20):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        res = traverse_ref.intersect_octree(sphere_tree, [1.5, 1.5, 1.5] - d * 0.45, d)
        if not res.hit or np.allclose(res.normal, 0):
            continue
        total += 1
        if np.dot(res.normal, -d) > 0.3:
            agree += 1
    assert total >= 15 and agree / total > 0.8


def test_depth_cutoff_hits_coarser_cube():
    """maxDepth stops descent: hit cube edge >= world/2^maxDepth
    (svotrace.comp:300-302)."""
    size = 32
    v = np.zeros((size, size, size), np.uint8)
    v[:, :8, :] = 1  # slab floor
    tree = build_np.build_octree_np(v)
    origin = [1.5, 1.9, 1.5]
    d = np.array([0.05, -1.0, 0.03])
    d /= np.linalg.norm(d)
    fine = traverse_ref.intersect_octree(tree, origin, d, max_depth=13)
    coarse = traverse_ref.intersect_octree(tree, origin, d, max_depth=2)
    assert fine.hit and coarse.hit
    assert coarse.scale_exp2 >= 0.25 - 1e-6
    assert fine.scale_exp2 <= coarse.scale_exp2
    assert coarse.iters <= fine.iters


def test_iteration_cap_terminates():
    size = 32
    v = (np.indices((size, size, size)).sum(0) % 2).astype(np.uint8)  # 3D checker
    tree = build_np.build_octree_np(v)
    d = np.array([0.57, 0.31, 0.41])
    d /= np.linalg.norm(d)
    res = traverse_ref.intersect_octree(tree, [0.2, 1.01, 1.02], d,
                                        max_iterations=30)
    assert res.iters <= 31


def test_ray_from_inside_octree(sphere_tree):
    """Origin inside the world cube but outside the ball still hits."""
    res = traverse_ref.intersect_octree(sphere_tree, [1.02, 1.5, 1.5],
                                        [1.0, 0.0, 0.0])
    assert res.hit
    np.testing.assert_allclose(res.t, (1.5 - 8.5 / 32) - 1.02, atol=0.1)
