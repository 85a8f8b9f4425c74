"""Paged-L0 wavefront traversal (G > 64 — worlds above 2048^3).

The reference supports up to 8192^3 (README.md:7; world math
Octree.java:237-244).  The flat L0 coarse-refine tables stop at G=64, so
bigger worlds run the PAGED layout (ops/wavefront.py paged-L0 notes):
per-64^3-brick-page tables served as per-tile candidates, page-band keys
for punted lanes, slot-only packed hit records, optional int16 attrs.

The oracle (ops/brick_trace.intersect_bricks) is G-agnostic, so parity
is checked directly on a synthetic sparse 4096^3 scene.  Everything runs
interpret-mode on CPU (conftest pins cpu).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from svo_raytracer_tpu.ops import brick_dda, brick_scene, brick_trace
from svo_raytracer_tpu.ops import wavefront as wf


def _sparse_4096_scene():
    """Synthetic sparse 4096^3 BrickScene (G=128, P=2): a uniform-solid
    brick patch, half-filled mixed bricks above it, plus content in a
    second page so page crossings and band-key punts are exercised."""
    G, WS = 128, 4096

    def cid(x, y, z):
        return (x * G + y) * G + z

    brick_slot = np.full(G * G * G, -1, np.int32)
    brick_attr = np.zeros(G * G * G, np.int64)
    uni_attr = 1 | (555 << 8) | (7 << 24)
    for x in range(52, 76):
        for z in range(52, 76):
            brick_attr[cid(x, 40, z)] = uni_attr
    brick_attr[cid(20, 20, 20)] = uni_attr
    mixed_cells = [cid(x, 41, z) for x in range(56, 72, 2)
                   for z in range(56, 72, 2)]
    mixed_cells.append(cid(100, 100, 100))   # page (1,1,1)
    n_mixed = len(mixed_cells)
    brick_slot[np.asarray(mixed_cells)] = np.arange(n_mixed, dtype=np.int32)

    attrs = np.zeros((n_mixed, 32768), np.int32)
    vy = (np.arange(32768) // 32) % 32
    attrs[:, :] = np.where(vy < 16, 2 | (595 << 8) | (12 << 24), 0)[None]
    occ = brick_scene.occupancy_words(attrs)
    l0 = ((brick_attr & 0xFF) != 0) | (brick_slot >= 0)
    l0_table = np.asarray(brick_dda.table_rows(
        brick_dda.pack_occupancy(l0.reshape(G, G, G)))).astype(np.int32)
    return brick_scene.BrickScene(
        world_size=WS, grid_size=G, n_mixed=n_mixed, l0_table=l0_table,
        brick_slot=brick_slot, brick_attr=brick_attr.astype(np.int32),
        occ_words=occ, attrs=attrs.reshape(n_mixed, 256, 128))


@pytest.fixture(scope="module")
def paged_scene():
    scene = _sparse_4096_scene()
    return scene, scene.to_device(), wf.prepare(scene)


def _rand_rays(n, seed):
    rs = np.random.RandomState(seed)
    o = (rs.rand(n, 3) * 0.9 + 1.05).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


@pytest.mark.slow
def test_paged_matches_oracle(paged_scene):
    scene, dscene, W = paged_scene
    assert W.grid_size > wf.PAGE  # exercises the paged path
    o, d = _rand_rays(2048, 5)
    ref = brick_trace.intersect_bricks(dscene, jnp.asarray(o),
                                       jnp.asarray(d))
    got = wf.intersect_wavefront(W, jnp.asarray(o), jnp.asarray(d),
                                 interpret=True)
    rh, gh = np.asarray(ref.hit), np.asarray(got.hit)
    assert (rh == gh).all()
    both = rh & gh
    assert both.sum() > 10  # the scene is actually hit
    assert (np.abs(np.asarray(ref.t) - np.asarray(got.t))[both]
            <= 2e-4).all()
    assert (np.asarray(ref.value)[both]
            == np.asarray(got.value)[both]).all()
    # voxel coords (recomputed from t under the slot-only pack) agree
    for fld in ("voxel_pos",):
        rv = np.asarray(getattr(ref, fld))[both]
        gv = np.asarray(getattr(got, fld))[both]
        ok = np.isfinite(rv) & np.isfinite(gv)
        assert np.allclose(rv[ok], gv[ok], atol=2e-3)


@pytest.mark.slow
def test_paged_attr16_matches_int32(paged_scene):
    scene, _dscene, W = paged_scene
    W16 = wf.prepare(scene, attr16=True)
    assert W16.attr_comb.dtype == jnp.int16
    o, d = _rand_rays(1024, 7)
    a = wf.intersect_wavefront(W, jnp.asarray(o), jnp.asarray(d),
                               interpret=True)
    b = wf.intersect_wavefront(W16, jnp.asarray(o), jnp.asarray(d),
                               interpret=True)
    ah = np.asarray(a.hit)
    assert (ah == np.asarray(b.hit)).all()
    assert (np.asarray(a.value)[ah] == np.asarray(b.value)[ah]).all()
    assert (np.asarray(a.depth)[ah] == np.asarray(b.depth)[ah]).all()
    an = np.asarray(a.normal)[ah]
    bn = np.asarray(b.normal)[ah]
    fin = np.isfinite(an) & np.isfinite(bn)
    assert np.allclose(an[fin], bn[fin])


@pytest.mark.slow
def test_paged_attr2d_matches_flat(paged_scene):
    """attr2d=True (the auto layout for >2^31-element tables) must be
    ray-for-ray identical to the flat attr16 layout — same scene, same
    rays, only the attr_comb storage shape differs."""
    scene, _dscene, _W = paged_scene
    W16 = wf.prepare(scene, attr16=True)
    W2d = wf.prepare(scene, attr16=True, attr2d=True)
    assert W2d.attr_comb.ndim == 2
    assert W2d.attr_comb.shape[1] == 32768
    o, d = _rand_rays(1024, 7)
    a = wf.intersect_wavefront(W16, jnp.asarray(o), jnp.asarray(d),
                               interpret=True)
    b = wf.intersect_wavefront(W2d, jnp.asarray(o), jnp.asarray(d),
                               interpret=True)
    ah = np.asarray(a.hit)
    assert (ah == np.asarray(b.hit)).all()
    for fld in ("value", "depth", "t"):
        assert (np.asarray(getattr(a, fld))[ah]
                == np.asarray(getattr(b, fld))[ah]).all()


def test_attr16_roundtrip():
    """Encode/decode identity for every representable i32 attr word."""
    rs = np.random.RandomState(0)
    v = rs.randint(0, 4, 4096)
    raw = rs.randint(0, 1000, 4096)
    depth = rs.randint(5, 13, 4096)
    a32 = (v | (raw << 8) | (depth << 24)).astype(np.int64)
    a32[0] = 0  # air
    enc = wf._encode_attr16(a32, 12)
    a = enc.astype(np.int64) & 0xFFFF
    dec_v = a & 3
    dec_raw = (a >> 2) & 0x3FF
    dec_depth = 12 - ((a >> 12) & 7)
    nz = a32 != 0
    assert (dec_v[nz] == v[nz]).all()
    assert (dec_raw[nz] == raw[nz]).all()
    assert (dec_depth[nz] == depth[nz]).all()
    assert enc[0] == 0


def test_page_tables_layout():
    """Page-table rows decode back to the brick occupancy they encode."""
    scene = _sparse_4096_scene()
    tabs, prow = wf._page_tables_np(scene)
    G = scene.grid_size
    P = G // wf.PAGE
    assert tabs.shape == (P ** 3, wf.PAGE_ROWS, 128)
    occ3 = (((scene.brick_attr & 0xFF) != 0)
            | (scene.brick_slot >= 0)).reshape(G, G, G)
    pocc_bits = np.asarray(prow).view(np.uint32).reshape(-1)
    for pg in range(P ** 3):
        px, py, pz = pg // (P * P), (pg // P) % P, pg % P
        sub = occ3[px * 64:(px + 1) * 64, py * 64:(py + 1) * 64,
                   pz * 64:(pz + 1) * 64]
        assert bool((pocc_bits[pg // 32] >> (pg % 32)) & 1) == sub.any()
        if not sub.any():
            continue
        # spot-check byte-cell bits of this page against the occupancy
        bw = np.asarray(tabs[pg, :64]).view(np.uint32).reshape(-1)
        xs, ys, zs = np.nonzero(sub)
        for x, y, z in list(zip(xs, ys, zs))[:64]:
            c = ((x // 2) * 32 + (y // 2)) * 32 + (z // 2)
            byte = (bw[c // 4] >> ((c % 4) * 8)) & 0xFF
            bit = ((x & 1) << 2) | ((y & 1) << 1) | (z & 1)
            assert (byte >> bit) & 1


def test_cheby_distance_and_nibbles():
    """Distance-field supercell rows (r5): the chebyshev transform and
    the nibble packing/probe-decode layout agree with a brute force."""
    rs = np.random.RandomState(11)
    occ = rs.rand(8, 8, 8) < 0.06
    d = wf._cheby_dist(occ)
    pts = np.argwhere(occ)
    for cell in [(0, 0, 0), (3, 4, 5), (7, 7, 7), (2, 6, 1)]:
        if len(pts):
            exp = int(np.abs(pts - np.asarray(cell)).max(axis=1).min())
        else:
            exp = 15
        assert d[cell] == min(exp, 15)
    words = wf._pack_nibbles(d.reshape(1, -1))
    assert words.shape == (1, 128)
    flat = d.reshape(-1)
    for s in [0, 7, 8, 100, 511]:
        got = (int(words[0, s >> 3]) >> ((s & 7) * 4)) & 0xF
        assert got == flat[s]


@pytest.mark.slow
def test_paged_frame_render(paged_scene):
    """Frame-level render through render_wave on a paged (G=128) scene:
    the camera-mode ladder, schedule recording, and attr resolve all run
    the paged path end-to-end (r5; previously only ray-level parity)."""
    from svo_raytracer_tpu.ops import render_wave
    from svo_raytracer_tpu.utils.camera import Camera

    _, _, W = paged_scene
    cam = Camera(pos=np.array([1.5, 1.40, 1.5]))
    cam.rotate(-0.9, 0.3)
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)
    col, dep, it = render_wave.render_frame_wavefront(
        W, cam5, 96, 64, render_mode=3, frame_number=3, gi_bounces=1,
        interpret=True)
    dep = np.asarray(dep)
    assert 0.2 < (dep > 0).mean() < 0.9   # uniform patch fills the view
    assert np.isfinite(dep).all()
    # color over the uniform patch is NaN BY DESIGN (raw 555 decodes to
    # the zero vector; normalize(0) NaN is pinned GLSL parity) — assert
    # finiteness only where depth says no hit (sky shading path)
    assert np.isfinite(np.asarray(col)[dep == 0]).all()


def test_finish_big_attr_two_level_gather():
    """_finish's 2-D attr_comb branch (8192^3-class attr16 worlds):
    the flat aidx cannot be formed in int32, so prepare() stores the
    table 2-D and mixed/uniform hits resolve through a (row, col)
    two-level gather (reshaping in-jit instead cost a full 12.7 GB
    layout-change temp — the .tpu_jobs/237 OOM).  Craft a 2.3G-half-
    word attr_comb and check both decode paths bit-for-bit."""
    ws_, G, cap = 8192, 256, 70000
    full_depth = 13
    n_total = cap * 32768 + G * G * G
    assert n_total > (1 << 31) - 1
    attr_comb = np.zeros(n_total, np.int16)
    # mixed hit: slot=69999, voxel widx inside brick cell (3,4,5)
    slot, cell_m = 69999, (3 * G + 4) * G + 5
    vx = 3 * 32 + 7
    vy = 4 * 32 + 9
    vz = 5 * 32 + 11
    widx = (vx % 32) * 1024 + (vy % 32) * 32 + (vz % 32)
    a_m = 2 | (595 << 8) | (full_depth << 24)
    attr_comb[slot * 32768 + widx] = int(wf._encode_attr16(
        np.asarray([a_m]), full_depth)[0])
    # uniform hit: cell near the END of the tail (index > 2^31)
    cell_u = (200 * G + 100) * G + 50
    a_u = 1 | ((full_depth - 5) << 24)
    attr_comb[cap * 32768 + cell_u] = int(wf._encode_attr16(
        np.asarray([a_u]), full_depth)[0])
    slot_cell = np.zeros(cap, np.int32)
    slot_cell[slot] = cell_m
    # rays: t/origin/dir chosen so the voxel recompute lands in-brick
    o = np.asarray([[1.0 + (vx + 0.4) / ws_, 1.0 + (vy + 0.4) / ws_,
                     1.0 + (vz + 0.4) / ws_],
                    [1.0 + (200 * 32 + 5.4) / ws_,
                     1.0 + (100 * 32 + 6.4) / ws_,
                     1.0 + (50 * 32 + 7.4) / ws_]], np.float32)
    d = np.asarray([[0, 0, 1], [0, 0, 1]], np.float32)
    opack = jnp.asarray([(1 << 29) | slot, (1 << 30) | cell_u], jnp.int32)
    ot = jnp.zeros(2, jnp.float32)
    oit = jnp.zeros(2, jnp.int32)
    res = wf._finish(opack, ot, oit, jnp.zeros(2, jnp.int32),
                     jnp.asarray(slot_cell),
                     jnp.asarray(attr_comb.reshape(-1, 32768)),
                     jnp.asarray(o), jnp.asarray(d), ws_, 2, cap)
    v = np.asarray(res.value)
    dep = np.asarray(res.depth)
    assert v[0] == 2 and dep[0] == full_depth
    assert v[1] == 1 and dep[1] == full_depth - 5
