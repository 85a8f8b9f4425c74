"""Checkpoint / resume.

The reference's only checkpoint is the ``.svo`` scene snapshot bound to
hotkeys 0/9 (``Octree.java:974-1012``, ``Main.java:185-190``).  Here there are
two checkpointable things:

* the scene — ``.svo`` (reference-compatible; core/svo_format or the native
  codec) or fast ``.npz`` of the SoA arrays;
* training state — VoxelParams (+ optional optimizer state pytree), saved
  as ``.npz`` (orbax is available but overkill for two arrays; swap in
  ``orbax.checkpoint`` when schedulable multi-host training lands).
"""

from __future__ import annotations

import numpy as np

from ..core.octree import Octree
from .render_diff import VoxelParams


def save_tree_npz(tree: Octree, path: str) -> None:
    t = tree.to_numpy()
    np.savez(path, child=t.child[:t.n_nodes], mask=t.mask[:t.n_nodes],
             value=t.value[:t.n_nodes], normal=t.normal[:t.n_nodes],
             n_nodes=np.asarray(t.n_nodes),
             world_size=np.asarray(t.world_size))


def load_tree_npz(path: str) -> Octree:
    z = np.load(path)
    return Octree(child=z["child"], mask=z["mask"], value=z["value"],
                  normal=z["normal"], n_nodes=int(z["n_nodes"]),
                  world_size=int(z["world_size"]))


def save_params(params: VoxelParams, path: str, step: int = 0) -> None:
    np.savez(path, albedo=np.asarray(params.albedo),
             density=np.asarray(params.density), step=np.asarray(step))


def load_params(path: str) -> tuple[VoxelParams, int]:
    import jax.numpy as jnp

    z = np.load(path)
    return (VoxelParams(albedo=jnp.asarray(z["albedo"]),
                        density=jnp.asarray(z["density"])),
            int(z["step"]))
