"""Differentiable rendering — analytic pixel gradients w.r.t. per-voxel
albedo/density.

The reference renderer has no gradients (SURVEY.md §7 delta 4: "no-op
gradients -> full reverse-mode").  Design: the *traversal* is geometric and
non-differentiable — it returns hit records (node index, t, normal); the
*shading* is a differentiable function of per-node parameters gathered at the
hit node.  JAX autodiff turns the forward gather into a backward scatter-add,
which is exactly the "scatter dL/d(albedo,density) per hit voxel" plan —
no traversal replay needed, the hit records are the residuals.

Model (single-hit alpha compositing, PlenOctrees-style):

  alpha = 1 - exp(-softplus(density[node]) * ds)   (ds = hit cube edge)
  pixel = alpha * albedo[node] * light(normal)  +  (1 - alpha) * sky(dir)

Parameters live in node-table-shaped arrays, so gradients aggregate over all
pixels hitting the same voxel and all-reduce cleanly across ray-tile shards
(see parallel/render_sharded.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import shade, traverse
from ..utils import constants as C

f32 = jnp.float32


class VoxelParams(NamedTuple):
    """Learnable per-node appearance parameters (node-table aligned)."""

    albedo: jax.Array   # f32 (capacity, 3)
    density: jax.Array  # f32 (capacity,) — softplus-activated opacity rate


def init_params(tree_arrays, init_density: float = 10.0) -> VoxelParams:
    """Initialize from the reference's hardcoded palette
    (svotrace.comp:577-586) so an untrained render matches mode 2's albedo."""
    child, mask, value, normal = tree_arrays
    cap = value.shape[0]
    albedo = jnp.full((cap, 3), 0.5, f32)
    for v, rgb in shade._PALETTE.items():
        albedo = jnp.where((value == v)[:, None], jnp.asarray(rgb, f32),
                           albedo)
    density = jnp.full((cap,), init_density, f32)
    return VoxelParams(albedo=albedo, density=density)


def render_diff(params: VoxelParams, tree_arrays, cam5, width: int,
                height: int, max_depth: int = C.MAX_DEPTH,
                max_iterations: int = C.MAX_RAYCAST_ITERATIONS):
    """Differentiable forward render -> (H, W, 3).

    Only ``params`` carries gradients; the octree geometry is constant.
    Light is diffuse-from-sun like render mode 2 plus a floor, so gradients
    w.r.t. albedo are well-conditioned everywhere the voxel is visible.
    """
    cam5 = jnp.asarray(cam5, f32)
    dirs = shade.pixel_dirs_device(cam5, width, height)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam5[0], dirs.shape)

    res = traverse.intersect_octree(tree_arrays, origins, dirs,
                                    max_depth=max_depth,
                                    max_iterations=max_iterations)
    node = jnp.where(res.hit, res.node, 0)  # safe gather index
    alb = params.albedo[node]
    den = jax.nn.softplus(params.density[node])
    alpha = 1.0 - jnp.exp(-den * res.scale_exp2)

    normal = jnp.nan_to_num(res.normal)
    light = jnp.clip(jnp.sum(normal * shade.SUN_DIR_DIRECT[None, :], axis=-1),
                     0.0, 1.0) * 0.7 + 0.3
    surf = alb * light[:, None]
    bg = shade.sky(dirs)
    col = jnp.where(res.hit[:, None],
                    alpha[:, None] * surf + (1.0 - alpha[:, None]) * bg,
                    bg)
    return col.reshape(height, width, 3)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def pixel_loss(params: VoxelParams, tree_arrays, cam5, target, width: int,
               height: int):
    """L2 image loss vs a target render."""
    img = render_diff(params, tree_arrays, cam5, width, height)
    return jnp.mean((img - target) ** 2)


@functools.partial(jax.jit, static_argnames=("width", "height", "lr"))
def train_step(params: VoxelParams, tree_arrays, cam5, target, width: int,
               height: int, lr: float = 0.5):
    """One SGD step on (albedo, density) — the "training step" the multichip
    dry run shards over ray tiles with gradient all-reduce."""
    loss, grads = jax.value_and_grad(pixel_loss)(params, tree_arrays, cam5,
                                                 target, width, height)
    new = VoxelParams(
        albedo=params.albedo - lr * grads.albedo,
        density=params.density - lr * grads.density,
    )
    return new, loss


def finite_difference_grad(params: VoxelParams, tree_arrays, cam5, target,
                           width: int, height: int, node: int, channel: int,
                           eps: float = 1e-3) -> float:
    """Central finite difference of the loss w.r.t. one albedo entry — the
    gradient-allclose harness's independent check."""
    import numpy as np

    def loss_with(delta):
        a = params.albedo.at[node, channel].add(delta)
        return float(pixel_loss(VoxelParams(a, params.density), tree_arrays,
                                cam5, target, width, height))

    return (loss_with(eps) - loss_with(-eps)) / (2 * eps)
