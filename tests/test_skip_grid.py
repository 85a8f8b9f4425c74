"""Empty-space skip grid (ops/skip_grid.py): conservativeness + hit parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from svo_raytracer_tpu.core import build_np
from svo_raytracer_tpu.ops import brick_dda, skip_grid, traverse


@pytest.fixture(scope="module")
def scene():
    S = 64
    rng = np.random.default_rng(7)
    x, y, z = np.meshgrid(*(np.arange(S),) * 3, indexing="ij")
    vox = ((np.sin(x * 0.31) + np.cos(y * 0.23) + np.sin(z * 0.17)) > 1.2)
    vox |= (np.sqrt((x - 40.0) ** 2 + (y - 20.0) ** 2 + (z - 40.0) ** 2) < 9)
    tree = build_np.build_octree_np(vox.astype(np.uint8))
    return vox, tree


def _rays(B, seed=0):
    rng = np.random.default_rng(seed)
    o = np.full((B, 3), 1.5, np.float32)
    o += (rng.random((B, 3)).astype(np.float32) - 0.5) * 0.9
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_grid_occupancy_matches_voxels(scene):
    vox, tree = scene
    G = 16
    words = skip_grid.build_skip_grid(tree, grid_size=G)
    got = np.zeros((G, G, G), bool)
    w = np.asarray(words).view(np.uint32)
    W = -(-G // 32)
    for i in range(G):
        for j in range(G):
            for k in range(G):
                got[i, j, k] = (w[(i * G + j) * W + (k // 32)]
                                >> np.uint32(k % 32)) & 1
    cell = vox.shape[0] // G
    want = vox.reshape(G, cell, G, cell, G, cell).any((1, 3, 5))
    assert (got == want).all()


def test_skip_preserves_hits(scene):
    vox, tree = scene
    dev = tree.to_device()
    G = 16
    tab = brick_dda.table_rows(skip_grid.build_skip_grid(tree, G))
    o, d = _rays(512)

    base = traverse.intersect_octree(dev.arrays(), jnp.asarray(o),
                                     jnp.asarray(d))

    import functools
    isect = functools.partial(traverse.intersect_octree, dev.arrays())
    skipped = skip_grid.make_skipping_isect(isect, tab, grid_size=G,
                                            interpret=True)(
        jnp.asarray(o), jnp.asarray(d))

    bh = np.asarray(base.hit)
    sh = np.asarray(skipped.hit)
    # hit classification must match exactly: the skip is conservative
    assert (bh == sh).all(), f"{(bh != sh).sum()} rays changed hit class"
    # hit distances agree to restarted-ray FP tolerance
    bt, st = np.asarray(base.t)[bh], np.asarray(skipped.t)[bh]
    assert np.allclose(bt, st, atol=2e-3), np.abs(bt - st).max()
    # same voxel values
    assert (np.asarray(base.value)[bh] == np.asarray(skipped.value)[bh]).all()
    # the skip must actually save work on this scene
    assert int(np.asarray(skipped.iters)[bh].sum()) < \
        int(np.asarray(base.iters)[bh].sum())


def test_definite_misses_marked_inactive(scene):
    vox, tree = scene
    G = 16
    tab = brick_dda.table_rows(skip_grid.build_skip_grid(tree, G))
    # rays pointing straight up from above the world cube: guaranteed miss
    B = 64
    o = np.tile(np.array([[1.5, 2.5, 1.5]], np.float32), (B, 1))
    d = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (B, 1))
    skip, maybe = skip_grid.skip_distances(tab, jnp.asarray(o),
                                           jnp.asarray(d), grid_size=G,
                                           interpret=True)
    assert not bool(np.asarray(maybe).any())
    assert (np.asarray(skip) == 0).all()
