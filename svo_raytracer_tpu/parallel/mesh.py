"""Device mesh helpers.

The reference is single-process/single-GPU (SURVEY.md §2.2); its scaling axes
map to a JAX device mesh here:

  ``tiles`` — image-row (ray-tile) data parallelism: every device traces its
  rows against a replicated octree; the analog of the 8x8 workgroup grid
  writ large across chips.  Voxel-parameter gradients all-reduce over this
  axis (ICI), overlapped with backward by XLA's collective scheduler.

Octree brick sharding + halo exchange (for worlds larger than one chip's HBM)
ride the same mesh on a second axis in a later stage.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def tile_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over ray tiles."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("tiles",))


def grid_mesh(n_tiles: int, n_bricks: int, devices=None) -> Mesh:
    """2-D ``(tiles, bricks)`` mesh: image rows shard over ``tiles``, the
    octree brick decomposition over ``bricks`` (parallel/bricks.py)."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: n_tiles * n_bricks]).reshape(n_tiles,
                                                              n_bricks)
    return Mesh(devices, axis_names=("tiles", "bricks"))
