"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The driver separately dry-runs __graft_entry__.dryrun_multichip; these tests
pin the semantics: sharded render == single-device render, sharded training
step == unsharded step (gradient psum correctness)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svo_raytracer_tpu.core import build_np
from svo_raytracer_tpu.diff import render_diff as rd
from svo_raytracer_tpu.parallel import mesh as mesh_mod
from svo_raytracer_tpu.parallel import render_sharded
from svo_raytracer_tpu.ops import shade
from svo_raytracer_tpu.utils.camera import Camera
from conftest import make_sphere_voxels


@pytest.fixture(scope="module")
def scene():
    v = make_sphere_voxels(16, radius=5)
    v[:, :2, :] = 1
    tree = build_np.build_octree_np(v).to_device()
    cam = Camera(pos=np.array([1.5, 1.5, 2.2]))
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)
    return tree, cam5


def test_eight_devices_available():
    assert len(jax.devices()) == 8, (
        "tests need XLA_FLAGS=--xla_force_host_platform_device_count=8")


@pytest.mark.parametrize("mode", [1, 2, 3])
def test_sharded_render_matches_single(scene, mode):
    tree, cam5 = scene
    W, H = 32, 32
    m = mesh_mod.tile_mesh(8)
    render = render_sharded.make_sharded_render(m, W, H, render_mode=mode)
    sharded = np.asarray(render(tree.arrays(), cam5))
    single, _, _ = shade.render_image(tree.arrays(), cam5, W, H,
                                      render_mode=mode)
    np.testing.assert_allclose(sharded, np.asarray(single), atol=2e-5)


def test_sharded_train_step_matches_unsharded(scene):
    tree, cam5 = scene
    W = H = 32
    params = rd.init_params(tree.arrays())
    target = rd.render_diff(params, tree.arrays(), cam5, W, H) * 0.7

    m = mesh_mod.tile_mesh(8)
    step = render_sharded.make_sharded_train_step(m, W, H, lr=1.0)
    p_sh, loss_sh = step(params, tree.arrays(), cam5, target)
    p_un, loss_un = rd.train_step(params, tree.arrays(), cam5, target, W, H,
                                  lr=1.0)
    np.testing.assert_allclose(float(loss_sh), float(loss_un), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_sh.albedo),
                               np.asarray(p_un.albedo), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_sh.density),
                               np.asarray(p_un.density), atol=1e-5)


def test_sharded_train_loss_decreases(scene):
    tree, cam5 = scene
    W = H = 32
    m = mesh_mod.tile_mesh(4)
    params0 = rd.init_params(tree.arrays())
    target = rd.render_diff(params0, tree.arrays(), cam5, W, H)
    key = jax.random.PRNGKey(1)
    params = rd.VoxelParams(
        albedo=params0.albedo + 0.3 * jax.random.normal(key,
                                                        params0.albedo.shape),
        density=params0.density)
    step = render_sharded.make_sharded_train_step(m, W, H, lr=300.0)
    losses = []
    for _ in range(15):
        params, loss = step(params, tree.arrays(), cam5, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5


def test_uneven_height_rejected(scene):
    tree, cam5 = scene
    m = mesh_mod.tile_mesh(8)
    with pytest.raises(AssertionError):
        render_sharded.make_sharded_render(m, 32, 36)
