"""Render-mode tests: sky/sun, fog, shadows, GI energy, beam prepass.

The reference had no shading tests (visual-only, SURVEY.md §4); these pin the
re-expressed shading math with property checks and small golden renders.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svo_raytracer_tpu.core import build_np
from svo_raytracer_tpu.ops import shade
from svo_raytracer_tpu.utils.camera import Camera
from conftest import make_sphere_voxels


@pytest.fixture(scope="module")
def ball_scene():
    v = make_sphere_voxels(32)
    v[:, :4, :] = 1  # floor slab so shadows exist
    return build_np.build_octree_np(v).to_device()


def _cam():
    cam = Camera(pos=np.array([1.5, 1.6, 2.3]))
    cam.rotate(-0.3, 0.0)
    return jnp.asarray(cam.uniform(), jnp.float32)


def test_mode3_normals_render(ball_scene):
    col, depth, iters = shade.render_image(ball_scene.arrays(), _cam(),
                                           64, 64, render_mode=3)
    col = np.asarray(col)
    hit = np.asarray(depth) > 0
    assert hit.any() and (~hit).any()
    assert np.all(col[~hit] == 0.0)
    # hit pixels encode unit normals: |2c-1| ~ 1
    n = col[hit] * 2 - 1
    lens = np.linalg.norm(n, axis=-1)
    valid = ~np.isnan(lens)
    assert valid.mean() > 0.95
    np.testing.assert_allclose(lens[valid], 1.0, atol=1e-3)


def test_mode2_sky_matches_formula(ball_scene):
    """Miss pixels must equal skycolor - dir.y * (0.4,0.4,0.25) exactly
    (svotrace.comp:629-631)."""
    cam5 = _cam()
    W = H = 32
    col, depth, _ = shade.render_image(ball_scene.arrays(), cam5, W, H,
                                       render_mode=2)
    col, depth = np.asarray(col), np.asarray(depth)
    dirs = np.asarray(shade.pixel_dirs_device(cam5, W, H))
    dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = dirs.reshape(H, W, 3)
    miss = depth == 0
    assert miss.any()
    expected = (np.array([0.6725, 0.8784, 1.0], np.float32)
                - dirs[..., 1:2] * np.array([0.4, 0.4, 0.25], np.float32))
    np.testing.assert_allclose(col[miss], expected[miss], atol=1e-6)


def test_mode2_fog_pushes_to_white():
    """Distant floor pixels trend toward the white fog color
    (svotrace.comp:595-604)."""
    v = np.zeros((32, 32, 32), np.uint8)
    v[:, :4, :] = 1
    tree = build_np.build_octree_np(v).to_device()
    cam = Camera(pos=np.array([1.5, 1.3, 1.99]))
    cam.rotate(-0.25, 0.0)
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)
    col, depth, _ = shade.render_image(tree.arrays(), cam5, 32, 32,
                                       render_mode=2)
    col, depth = np.asarray(col), np.asarray(depth)
    hit = depth > 0
    assert hit.sum() > 20
    near = col[hit][depth[hit] < np.percentile(depth[hit], 20)]
    far = col[hit][depth[hit] > np.percentile(depth[hit], 80)]
    assert far.mean() > near.mean()  # fog brightens toward white


def test_mode2_shadow_darkens(ball_scene):
    """Floor pixels in the ball's shadow (sun from +x+y+z) are darker than
    equally-lit floor pixels elsewhere."""
    cam = Camera(pos=np.array([1.5, 1.7, 2.2]))
    cam.rotate(-0.6, 0.0)
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)
    col, depth, _ = shade.render_image(ball_scene.arrays(), cam5, 64, 64,
                                       render_mode=2)
    col = np.asarray(col)
    depth = np.asarray(depth)
    hit = depth > 0
    lum = col.mean(-1)
    # the darkest hit pixels should be ~0.2 below the brightest floor pixels
    assert hit.any()
    assert lum[hit].max() - lum[hit].min() > 0.15


def test_mode1_heatmap(ball_scene):
    col, depth, iters = shade.render_image(ball_scene.arrays(), _cam(),
                                           32, 32, render_mode=1)
    iters = np.asarray(iters)
    assert (iters > 0).all()
    col = np.asarray(col)
    # grayscale: all three channels equal
    np.testing.assert_allclose(col[..., 0], col[..., 1])
    hit = np.asarray(depth) > 0
    np.testing.assert_allclose(col[hit, 0], 0.005 * iters[hit], atol=1e-6)
    np.testing.assert_allclose(col[~hit, 0], 0.01 * iters[~hit], atol=1e-6)


def test_mode0_sky_only():
    """All-air world: mode 0 must be exactly the sky gradient."""
    v = np.zeros((8, 8, 8), np.uint8)
    tree = build_np.build_octree_np(v).to_device()
    cam5 = _cam()
    W = H = 16
    col, depth, _ = shade.render_image(tree.arrays(), cam5, W, H,
                                       render_mode=0, frame_number=1)
    col = np.asarray(col)
    dirs = np.asarray(shade.pixel_dirs_device(cam5, W, H))
    dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
    expected = (np.array([0.6725, 0.8784, 1.0], np.float32)
                - dirs[:, 1:2] * np.array([0.4, 0.4, 0.25], np.float32))
    np.testing.assert_allclose(col.reshape(-1, 3), expected, atol=1e-6)
    assert np.all(np.asarray(depth) == -1.0)


def test_mode0_deterministic_per_frame(ball_scene):
    a, _, _ = shade.render_image(ball_scene.arrays(), _cam(), 32, 32,
                                 render_mode=0, frame_number=3)
    b, _, _ = shade.render_image(ball_scene.arrays(), _cam(), 32, 32,
                                 render_mode=0, frame_number=3)
    c, _, _ = shade.render_image(ball_scene.arrays(), _cam(), 32, 32,
                                 render_mode=0, frame_number=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_mode0_energy_reasonable(ball_scene):
    col, _, _ = shade.render_image(ball_scene.arrays(), _cam(), 32, 32,
                                   render_mode=0, frame_number=1)
    col = np.asarray(col)
    assert np.isfinite(col).all()
    assert (col >= 0).all()
    # sun disk radiance 7 + ambient on a white-ish bounce: stays bounded
    assert col.max() < 10.0


def test_beam_prepass_conservative(ball_scene):
    """Beam-seeded renders must agree with non-beam renders: the coarse seed
    distance never overshoots a fine hit (unnormalized-dir quirk)."""
    cam5 = _cam()
    col_a, depth_a, _ = shade.render_image(ball_scene.arrays(), cam5, 64, 64,
                                           render_mode=2, use_beam=False)
    col_b, depth_b, _ = shade.render_image(ball_scene.arrays(), cam5, 64, 64,
                                           render_mode=2, use_beam=True)
    hit_a = np.asarray(depth_a) > 0
    hit_b = np.asarray(depth_b) > 0
    # near-identical hit coverage; silhouette-edge tiles can flip because the
    # coarse ray samples the tile corner only — the reference has the same
    # artifact (svobeam.comp:620 traces px*4, not per-pixel)
    assert (hit_a == hit_b).mean() > 0.97
    both = hit_a & hit_b
    # colors nearly identical away from edges (fog uses t + beamDist)
    diff = np.abs(np.asarray(col_a)[both] - np.asarray(col_b)[both])
    assert diff.mean() < 1e-2


def test_threefry_mode_runs(ball_scene):
    import jax
    col, _, _ = shade.render_image(ball_scene.arrays(), _cam(), 16, 16,
                                   render_mode=0, frame_number=1,
                                   rng_mode="threefry",
                                   rng_key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(col)).all()


def _plain_frame(tree_arrays, cam5, W, H, mode):
    """Reference frame from MATERIALIZED dirs + the plain while_loop kernel
    — the inputs render_frame_staged sees, without the staged machinery."""
    import functools

    from svo_raytracer_tpu.ops import traverse

    dirs_un = shade.pixel_dirs_device(cam5, W, H)
    dirs = jax.block_until_ready(
        dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True))
    origins = jnp.broadcast_to(cam5[0], dirs.shape)
    isect = functools.partial(traverse.intersect_octree, tree_arrays)
    if mode == 0:
        px = jnp.tile(jnp.arange(W, dtype=jnp.float32), H)
        py = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)
        c, d, it = shade.shade_gi(tree_arrays, origins, dirs, px, py, 1, 1)
    elif mode == 2:
        c, d, it = shade.shade_direct(tree_arrays, origins, dirs)
    elif mode == 3:
        c, d, it = shade.shade_normals(tree_arrays, origins, dirs)
    return (np.asarray(c).reshape(H, W, 3), np.asarray(d).reshape(H, W),
            np.asarray(it).reshape(H, W))


def test_render_frame_staged_matches_plain(terrain_tree):
    """The host-driven staged frame path vs the plain kernel on the same
    materialized inputs.  Setup/decode compile as different programs in the
    two paths (FMA contraction drifts by ulps), so integer step counts can
    flip on grazing pixels; colors/depths must still agree to float
    tolerance and step counts to a small drift bound."""
    dev = terrain_tree.to_device()
    cam = Camera(pos=np.array([1.5, 1.7, 1.85]))
    cam.rotate(-0.5, 0.25)
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)
    W, H = 48, 24
    for mode in (2, 3):
        ref = _plain_frame(dev.arrays(), cam5, W, H, mode)
        got = shade.render_frame_staged(dev.arrays(), cam5, W, H,
                                        render_mode=mode, use_beam=False,
                                        row_block=8, round_steps=32)
        for a, b, name in zip(ref, got, ("color", "depth")):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
                err_msg=f"mode={mode} {name}")
        assert np.abs(np.asarray(got[2]).astype(np.int64)
                      - np.asarray(ref[2])).max() <= 8, f"mode={mode} iters"


def test_render_frame_staged_near_render_image(terrain_tree):
    """Cross-check vs the fully-jitted render_image.  Only a statistical
    bound holds: render_image fuses the dir-normalize into traversal setup
    (FMA contraction) so its rays differ by ulps from any path that
    materializes dirs — integer step counts and the binary GI sun-disk test
    then flip on grazing pixels.  (Verified: plain intersect_octree on
    materialized dirs shows the identical drift vs render_image.)"""
    dev = terrain_tree.to_device()
    cam = Camera(pos=np.array([1.5, 1.7, 1.85]))
    cam.rotate(-0.5, 0.25)
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)
    W, H = 48, 24
    for mode, beam, frac in ((2, True, 0.95), (2, False, 0.99),
                             (3, False, 0.99), (0, False, 0.70)):
        ref = shade.render_image(dev.arrays(), cam5, W, H, render_mode=mode,
                                 use_beam=beam)
        got = shade.render_frame_staged(dev.arrays(), cam5, W, H,
                                        render_mode=mode, use_beam=beam,
                                        row_block=8, round_steps=32)
        close = np.isclose(np.asarray(got[0]), np.asarray(ref[0]),
                           rtol=1e-3, atol=1e-3).all(axis=-1)
        assert close.mean() >= frac, \
            f"mode={mode} beam={beam} color: {close.mean():.3f}"
