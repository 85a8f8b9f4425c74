"""Wavefront-v2 Pallas path vs the XLA brick reference.

Runs in Pallas interpret mode on CPU (compiled-mode correctness is
exercised on TPU by the .tpu_jobs regression gate).  The two paths share
the scene format and decode, so fields should agree to FP slop; hit
masks exact.
"""

import numpy as np

import jax.numpy as jnp

from conftest import make_sphere_voxels, make_terrain_voxels
from svo_raytracer_tpu.core import build_np
from svo_raytracer_tpu.ops import brick_scene, brick_trace, wavefront
from test_traverse_batch import random_rays
import pytest


def _compare(tree, origins, dirs, min_hit_agree=0.995, min_strict=0.98,
             **kw):
    scene = brick_scene.brickify(tree).to_device()
    ws = wavefront.prepare(scene)
    ref = brick_trace.intersect_bricks(scene, jnp.asarray(origins),
                                       jnp.asarray(dirs))
    got = wavefront.intersect_wavefront(ws, jnp.asarray(origins),
                                        jnp.asarray(dirs), interpret=True,
                                        **kw)
    ref = {k: np.asarray(v) for k, v in ref._asdict().items()}
    got = {k: np.asarray(v) for k, v in got._asdict().items()}
    agree = (ref["hit"] == got["hit"]).mean()
    assert agree >= min_hit_agree, f"hit agreement {agree}"
    both = ref["hit"] & got["hit"]
    if not both.any():
        return
    strict = np.ones(origins.shape[0], bool)
    strict &= ~both | (ref["value"] == got["value"])
    strict &= ~both | (ref["depth"] == got["depth"])
    strict &= ~both | (np.abs(ref["t"] - got["t"]) <= 2e-4)
    strict &= ~both | (np.abs(ref["normal"] - got["normal"]).max(-1) <= 1e-5)
    frac = strict[both].mean()
    assert frac >= min_strict, (
        f"strict {frac:.3f}; bad {np.nonzero(both & ~strict)[0][:5]}")


def test_sphere_64():
    vox = make_sphere_voxels(64, radius=24)
    tree = build_np.build_octree_np(vox)
    o, d = random_rays(192, seed=11)
    _compare(tree, o, d)


def test_terrain_64():
    vox = make_terrain_voxels(64, seed=7)
    tree = build_np.build_octree_np(vox)
    o, d = random_rays(192, seed=12)
    _compare(tree, o, d)


@pytest.mark.slow
def test_terrain_64_no_early_exit():
    vox = make_terrain_voxels(64, seed=3)
    tree = build_np.build_octree_np(vox)
    o, d = random_rays(128, seed=13)
    _compare(tree, o, d, early_exit=False)


def test_active_mask_and_nan():
    vox = make_sphere_voxels(64, radius=24)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree).to_device()
    ws = wavefront.prepare(scene)
    o = np.array([[0.5, 1.5, 1.5], [np.nan, 1.5, 1.5], [0.5, 1.5, 1.5]],
                 np.float32)
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (3, 1))
    act = jnp.asarray([True, True, False])
    res = wavefront.intersect_wavefront(ws, jnp.asarray(o), jnp.asarray(d),
                                        active=act, interpret=True)
    hit = np.asarray(res.hit)
    assert hit[0] and not hit[1] and not hit[2]


@pytest.mark.slow
def test_static_schedule_replay():
    """A recorded schedule replayed as one jitted dispatch must agree
    with the dynamic trace exactly (same kernels, same round count)."""
    vox = make_terrain_voxels(64, seed=5)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree).to_device()
    ws = wavefront.prepare(scene)
    o, d = random_rays(2048, seed=21)
    o, d = jnp.asarray(o), jnp.asarray(d)
    prof = {}
    ref = wavefront.intersect_wavefront(ws, o, d, interpret=True,
                                        profile=prof, schedule_slack=2)
    got, n_left = wavefront.intersect_wavefront(
        ws, o, d, interpret=True, schedule=prof["schedule"])
    assert int(n_left) == 0
    for k in ("hit", "value", "t", "normal", "depth"):
        a = np.asarray(getattr(ref, k))
        b = np.asarray(getattr(got, k))
        assert np.array_equal(a, b), k


@pytest.mark.slow
def test_camera_mode_matches_explicit():
    """Camera mode (5-operand sort, in-kernel ray derivation) must match
    the explicit path bit-for-bit in interpret mode — the kernel mirrors
    shade.pixel_dirs_rows op-for-op."""
    from svo_raytracer_tpu.ops import shade
    from svo_raytracer_tpu.utils.camera import Camera

    vox = make_terrain_voxels(64, seed=9)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree).to_device()
    ws = wavefront.prepare(scene)
    cam = Camera(pos=np.array([1.4, 1.7, 1.3]))
    cam.rotate(-0.5, 0.8)
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)
    W, H = 64, 32
    dun = shade.pixel_dirs_device(cam5, W, H)
    d = dun / jnp.linalg.norm(dun, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam5[0], d.shape)
    ref = wavefront.intersect_wavefront(ws, o, d, interpret=True)
    got = wavefront.intersect_wavefront(ws, o, d, interpret=True,
                                        camera=(cam5, W, H))
    assert np.array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    both = np.asarray(ref.hit) & np.asarray(got.hit)
    assert np.array_equal(np.asarray(ref.value)[both],
                          np.asarray(got.value)[both])
    assert np.allclose(np.asarray(ref.t)[both], np.asarray(got.t)[both],
                       atol=1e-5)
    # static replay composes with camera mode
    prof = {}
    _ = wavefront.intersect_wavefront(ws, o, d, interpret=True,
                                      camera=(cam5, W, H), profile=prof,
                                      schedule_slack=2)
    got2, n_left = wavefront.intersect_wavefront(
        ws, o, d, interpret=True, camera=(cam5, W, H),
        schedule=prof["schedule"])
    assert int(n_left) == 0
    assert np.array_equal(np.asarray(got.hit), np.asarray(got2.hit))


@pytest.mark.slow
def test_extra_dynamic_continuation():
    """extra>0 (in-kernel DMA continuation) must agree exactly with
    extra=0 and converge in fewer sorted rounds (serve disabled so the
    ladder actually exercises the per-round continuation)."""
    vox = make_terrain_voxels(64, seed=7)
    tree = build_np.build_octree_np(vox)
    ws = wavefront.prepare(brick_scene.brickify(tree))
    o, d = random_rays(2048, seed=5)
    o, d = jnp.asarray(o), jnp.asarray(d)
    p0, p2 = {}, {}
    r0 = wavefront.intersect_wavefront(ws, o, d, interpret=True, extra=0,
                                       profile=p0, serve=0)
    r2 = wavefront.intersect_wavefront(ws, o, d, interpret=True, extra=2,
                                       profile=p2, serve=0)
    assert np.array_equal(np.asarray(r0.hit), np.asarray(r2.hit))
    both = np.asarray(r0.hit)
    assert np.allclose(np.asarray(r0.t)[both], np.asarray(r2.t)[both],
                       atol=2e-4)
    assert np.array_equal(np.asarray(r0.value)[both],
                          np.asarray(r2.value)[both])
    # with KMAX=8 the static candidates already cover a 64^3 world's
    # entire G=2 grid, so extra can no longer SHORTEN the ladder — the
    # contract kept here is exact agreement (the serve loop and the v4
    # candidate-coverage loop supersede extra as the convergence
    # mechanism; +-1 round of ladder-length noise is expected from the
    # deferred active counts)
    assert len(p2["schedule"]) <= len(p0["schedule"]) + 1
    # static replay composes with extra
    got, n_left = wavefront.intersect_wavefront(
        ws, o, d, interpret=True, extra=2, serve=0, schedule=p2["schedule"])
    assert int(n_left) == 0
    assert np.array_equal(np.asarray(r2.hit), np.asarray(got.hit))


def test_serve_loop_drains_incoherent_rays():
    """The in-kernel serve loop must (a) agree exactly with the serve=0
    ladder, and (b) drain incoherent random rays in the local round so
    the recorded ladder is just the tail — the round-exhaustion failure
    mode behind the r2 gate (hit_agree 0.784) cannot recur."""
    vox = make_terrain_voxels(64, seed=7)
    tree = build_np.build_octree_np(vox)
    ws = wavefront.prepare(brick_scene.brickify(tree))
    o, d = random_rays(2048, seed=5)
    o, d = jnp.asarray(o), jnp.asarray(d)
    p0, ps = {}, {}
    r0 = wavefront.intersect_wavefront(ws, o, d, interpret=True, serve=0,
                                       profile=p0)
    rs_ = wavefront.intersect_wavefront(ws, o, d, interpret=True,
                                        profile=ps)
    assert np.array_equal(np.asarray(r0.hit), np.asarray(rs_.hit))
    both = np.asarray(r0.hit)
    assert np.allclose(np.asarray(r0.t)[both], np.asarray(rs_.t)[both],
                       atol=2e-4)
    assert np.array_equal(np.asarray(r0.value)[both],
                          np.asarray(rs_.value)[both])
    # serve drains everything by round 1L: no sorted rounds recorded
    # (and no over-provision tail — serve absorbs per-frame variation)
    assert ps["schedule"] == (), ps["schedule"]
    # static replay of the trivial ladder strands nothing
    got, n_left = wavefront.intersect_wavefront(
        ws, o, d, interpret=True, schedule=ps["schedule"])
    assert int(n_left) == 0
    assert np.array_equal(np.asarray(rs_.hit), np.asarray(got.hit))


@pytest.mark.slow
def test_serve_loop_bound_punts_to_ladder():
    """A tiny serve bound must not lose rays — lanes past the bound punt
    to the sorted rounds and still resolve to the same hits."""
    vox = make_terrain_voxels(64, seed=7)
    tree = build_np.build_octree_np(vox)
    ws = wavefront.prepare(brick_scene.brickify(tree))
    o, d = random_rays(1024, seed=6)
    o, d = jnp.asarray(o), jnp.asarray(d)
    r0 = wavefront.intersect_wavefront(ws, o, d, interpret=True, serve=0)
    r1 = wavefront.intersect_wavefront(ws, o, d, interpret=True, serve=2)
    assert np.array_equal(np.asarray(r0.hit), np.asarray(r1.hit))
    both = np.asarray(r0.hit)
    assert np.allclose(np.asarray(r0.t)[both], np.asarray(r1.t)[both],
                       atol=2e-4)


@pytest.mark.slow
def test_g64_world():
    """G=64 (2048^3) support: two-word L0 columns + slot-based hit pack.
    The scene is hand-built (a dense 2048^3 voxel grid is infeasible on
    CPU); oracle = brick_trace, which is G-general."""
    from svo_raytracer_tpu.ops.brick_dda import pack_occupancy

    G, ws_sz = 64, 2048
    rs = np.random.RandomState(3)
    occ3 = np.zeros((G, G, G), bool)
    brick_slot = np.full(G * G * G, -1, np.int32)
    brick_attr = np.zeros(G * G * G, np.int32)
    # mixed bricks along a diagonal band (including z>31 cells: the
    # second L0 word) with random half-filled occupancy
    mixed_cells = []
    for i in range(0, G, 3):
        c = (i * G + (G - 1 - i)) * G + i
        occ3[i, G - 1 - i, i] = True
        mixed_cells.append(c)
    n_mixed = len(mixed_cells)
    occ_words = np.zeros((n_mixed, 8, 128), np.int32)
    attrs = np.zeros((n_mixed, 256, 128), np.int32)
    for s, c in enumerate(mixed_cells):
        brick_slot[c] = s
        vox = rs.rand(32, 32, 32) < 0.3
        occ_words[s] = np.asarray(pack_occupancy(vox)).reshape(8, 128)
        attrs[s] = ((vox.reshape(256, 128) != 0)
                    * (2 + (559 << 8) + (11 << 24))).astype(np.int32)
    # a few uniform-solid bricks (slot -1, attr != 0), one with z>31
    for (ux, uy, uz) in ((4, 4, 40), (50, 50, 50)):
        occ3[ux, uy, uz] = True
        brick_attr[(ux * G + uy) * G + uz] = 1 + (559 << 8) + (6 << 24)
    l0 = np.asarray(pack_occupancy(occ3))
    scene = brick_scene.BrickScene(
        world_size=ws_sz, grid_size=G, n_mixed=n_mixed,
        l0_table=l0.reshape(-1, 128), brick_slot=brick_slot,
        brick_attr=brick_attr, occ_words=occ_words, attrs=attrs)
    ws = wavefront.prepare(scene)
    o, d = random_rays(256, seed=17)
    ref = brick_trace.intersect_bricks(scene.to_device(), jnp.asarray(o),
                                       jnp.asarray(d))
    got = wavefront.intersect_wavefront(ws, jnp.asarray(o), jnp.asarray(d),
                                        interpret=True)
    rh, gh = np.asarray(ref.hit), np.asarray(got.hit)
    assert (rh == gh).mean() >= 0.99, (rh.sum(), gh.sum())
    both = rh & gh
    assert both.any()
    assert (np.asarray(ref.value)[both]
            == np.asarray(got.value)[both]).mean() >= 0.98
    assert (np.abs(np.asarray(ref.t) - np.asarray(got.t))[both]
            <= 2e-4).mean() >= 0.98


def test_profile_and_compaction():
    vox = make_terrain_voxels(64, seed=5)
    tree = build_np.build_octree_np(vox)
    scene = brick_scene.brickify(tree).to_device()
    ws = wavefront.prepare(scene)
    o, d = random_rays(4096, seed=14)
    prof = {}
    res = wavefront.intersect_wavefront(ws, jnp.asarray(o), jnp.asarray(d),
                                        interpret=True, profile=prof)
    rounds = prof["rounds"]
    assert rounds[0]["r"] == 0
    # exact actives must be non-increasing over the sorted rounds and the
    # working size must compact (round "1L" is the sort-free pixel round)
    acts = [r["active"] for r in rounds if isinstance(r["r"], int)
            and r["r"] >= 1]
    assert all(a >= b for a, b in zip(acts, acts[1:])), acts
    assert rounds[-1]["size"] <= rounds[1]["size"]
    assert bool(np.asarray(res.hit).any())
