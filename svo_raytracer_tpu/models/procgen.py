"""Procedural world generation — the chunkgen pipeline.

Replaces the reference's GPU chunkgen dispatch + 1 GB texture readback + CPU
octree build (``Octree.java:274-315``) with: jitted noise evaluation over the
voxel grid directly feeding the on-device octree builder — the voxel grid
never leaves the device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import noise


@functools.partial(jax.jit, static_argnames=("chunk_size", "kind"))
def generate_chunk(origin, chunk_size: int = 1024, kind: str = "perlin"):
    """Material grid for the chunk at ``origin`` (a 3-int array), indexed
    [x, y, z] — the analog of dispatching chunkgen.comp over 8^3 workgroups
    (chunkgen.comp:228-233) with the chunk-origin uniforms (:4-6)."""
    origin = jnp.asarray(origin, jnp.int32)
    ax = jnp.arange(chunk_size, dtype=jnp.int32)
    x = ax[:, None, None] + origin[0]
    y = ax[None, :, None] + origin[1]
    z = ax[None, None, :] + origin[2]
    if kind == "perlin":
        return noise.sample_perlin_terrain(x, y, z)
    if kind == "sphere":
        return noise.sample_sphere(x, y, z)
    if kind == "box":
        return noise.sample_box(x, y, z)
    raise ValueError(f"unknown generator kind {kind!r}")
