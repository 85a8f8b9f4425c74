"""Differentiable rendering tests: autodiff vs finite differences, training
convergence, and gradient locality (only visible voxels get gradients)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svo_raytracer_tpu.core import build_np
from svo_raytracer_tpu.diff import render_diff as rd
from svo_raytracer_tpu.utils.camera import Camera
from conftest import make_sphere_voxels


@pytest.fixture(scope="module")
def scene():
    v = make_sphere_voxels(16, radius=5)
    tree = build_np.build_octree_np(v).to_device()
    cam = Camera(pos=np.array([1.5, 1.5, 2.2]))
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)
    return tree, cam5


def test_forward_render_finite(scene):
    tree, cam5 = scene
    params = rd.init_params(tree.arrays())
    img = rd.render_diff(params, tree.arrays(), cam5, 32, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_grad_matches_finite_difference(scene):
    tree, cam5 = scene
    W = H = 24
    params = rd.init_params(tree.arrays())
    # target: a darkened render so gradients are nonzero
    target = rd.render_diff(params, tree.arrays(), cam5, W, H) * 0.5

    grads = jax.grad(rd.pixel_loss)(params, tree.arrays(), cam5, target, W, H)
    ga = np.asarray(grads.albedo)
    nz = np.nonzero(np.abs(ga[:, 0]) > 1e-5)[0]
    assert nz.size > 3, "some visible voxels must receive albedo gradients"
    for node in nz[:3]:
        fd = rd.finite_difference_grad(params, tree.arrays(), cam5, target,
                                       W, H, int(node), 0)
        assert np.isclose(ga[node, 0], fd, rtol=5e-2, atol=1e-6), (
            f"node {node}: autodiff {ga[node, 0]} vs fd {fd}")
    # density gradients exist too
    gd = np.asarray(grads.density)
    assert (np.abs(gd) > 1e-6).any()


def test_gradients_are_local(scene):
    """Voxels never hit by any ray must get exactly zero gradient."""
    tree, cam5 = scene
    W = H = 24
    params = rd.init_params(tree.arrays())
    target = jnp.zeros((H, W, 3), jnp.float32)
    grads = jax.grad(rd.pixel_loss)(params, tree.arrays(), cam5, target, W, H)
    ga = np.asarray(grads.albedo)
    # air nodes (value 0) are never hit -> zero grads
    value = np.asarray(tree.value)
    air = value == 0
    assert np.all(ga[air] == 0.0)


def test_training_recovers_albedo(scene):
    """Perturb albedo, train against the clean render, loss must fall and
    albedo must move back toward the original."""
    tree, cam5 = scene
    W = H = 32
    params0 = rd.init_params(tree.arrays())
    target = rd.render_diff(params0, tree.arrays(), cam5, W, H)

    key = jax.random.PRNGKey(0)
    noisy = rd.VoxelParams(
        albedo=params0.albedo + 0.3 * jax.random.normal(key,
                                                        params0.albedo.shape),
        density=params0.density,
    )
    params = noisy
    losses = []
    # sparse per-voxel grads are diluted by the per-pixel mean -> big lr
    for _ in range(40):
        params, loss = rd.train_step(params, tree.arrays(), cam5, target,
                                     W, H, lr=300.0)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, f"loss did not fall: {losses}"


def test_sky_only_zero_grads():
    v = np.zeros((8, 8, 8), np.uint8)
    tree = build_np.build_octree_np(v).to_device()
    cam5 = jnp.asarray(Camera().uniform(), jnp.float32)
    params = rd.init_params(tree.arrays())
    target = jnp.zeros((8, 8, 3), jnp.float32)
    grads = jax.grad(rd.pixel_loss)(params, tree.arrays(), cam5, target, 8, 8)
    assert np.all(np.asarray(grads.albedo) == 0.0)
    assert np.all(np.asarray(grads.density) == 0.0)
