"""Heightmap-driven world generation (chunkgen-heightmap.comp).

The reference samples a 16-bit heightmap + material-index map per column:
solid iff ``posY <= height/65536*2048``; the top 4 voxels take the surface
material, everything below is stone (``chunkgen-heightmap.comp:13-31``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk_size", "height_scale"))
def generate_chunk_heightmap(heightmap, matmap, origin, chunk_size: int = 1024,
                             height_scale: int = 2048):
    """Voxel grid [x,y,z] for the chunk at ``origin``.

    heightmap: (H, W) uint16 — sampled at world (x, z); matmap: (H, W) int
    material ids.  Out-of-map columns are empty.
    """
    origin = jnp.asarray(origin, jnp.int32)
    ax = jnp.arange(chunk_size, dtype=jnp.int32)
    wx = ax[:, None] + origin[0]              # (X, 1)
    wz = ax[None, :] + origin[2]              # (1, Z)
    H, W = heightmap.shape
    inside = (wx >= 0) & (wx < H) & (wz >= 0) & (wz < W)
    cx = jnp.clip(wx, 0, H - 1)
    cz = jnp.clip(wz, 0, W - 1)

    hm = heightmap[cx, cz].astype(jnp.float32)
    # int(sample / 65536.0 * height_scale) — chunkgen-heightmap.comp:16-19
    height = (hm / 65536.0 * height_scale).astype(jnp.int32)
    height = jnp.where(inside, height, -1)
    surf_mat = matmap[cx, cz].astype(jnp.int32)

    wy = ax[None, :, None] + origin[1]        # (1, Y, 1)
    h = height[:, None, :]                    # (X, 1, Z)
    m = surf_mat[:, None, :]
    solid = wy <= h
    near_surface = (h - wy) <= 4
    value = jnp.where(solid, jnp.where(near_surface, m, 1), 0)
    return value.astype(jnp.uint8)
