"""VMEM occupancy-grid DDA (ops/brick_dda.py) vs a scalar NumPy oracle.

Runs the Pallas kernel in interpreter mode (CPU); on TPU the same kernel
compiles through Mosaic (scripts/bench_pallas_prims.py measures it).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from svo_raytracer_tpu.ops import brick_dda


def dda_oracle(vox, o, d, max_steps):
    """Scalar amanatides-woo DDA; returns (hit, t_entry, cell)."""
    G = vox.shape[0]
    eps = 1e-4  # lock-step with the kernel's near-axis clamp (r2 fix)
    d = np.where(np.abs(d) < eps, np.where(d >= 0, eps, -eps), d)
    inv = 1.0 / d
    t1 = (0.0 - o) * inv
    t2 = (G - o) * inv
    t_ent = np.minimum(t1, t2).max()
    t_exit = np.maximum(t1, t2).min()
    if t_ent > t_exit or t_exit < 0:
        return False, 0.0, None
    t0 = max(t_ent, 0.0)
    base = t0 + 1e-4 if t0 > 0 else 0.0
    p = o + base * d
    ip = np.clip(p.astype(np.int64), 0, G - 1)
    st = np.where(d > 0, 1, -1)
    nxt = np.where(d > 0, ip + 1, ip).astype(np.float64)
    tm = base + (nxt - p) * inv
    dd = np.abs(inv)
    t = base
    for _ in range(max_steps + 1):
        if not ((0 <= ip) & (ip < G)).all():
            return False, 0.0, None
        if vox[ip[0], ip[1], ip[2]]:
            return True, t, ip.copy()
        ax = int(np.argmin(tm))
        t = tm[ax]
        ip[ax] += st[ax]
        tm[ax] += dd[ax]
    return False, 0.0, None


@pytest.mark.parametrize("G", [16, 32])
def test_coarse_dda_matches_oracle(G):
    rng = np.random.default_rng(G)
    vox = rng.random((G, G, G)) < 0.03
    words = brick_dda.pack_occupancy(vox)
    tab = brick_dda.table_rows(words)

    B = 256
    # half the rays start inside, half outside the grid
    o = np.where(rng.random((B, 1)) < 0.5,
                 rng.uniform(0, G, (B, 3)),
                 rng.uniform(-G, 2 * G, (B, 3))).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    out = brick_dda.coarse_dda(tab, jnp.asarray(o), jnp.asarray(d),
                               grid_size=G, interpret=True)
    hit = np.asarray(out["hit"])
    t = np.asarray(out["t"])
    cell = np.asarray(out["cell"])

    n_checked = n_hits = 0
    for i in range(B):
        want_hit, want_t, want_cell = dda_oracle(vox, o[i].astype(np.float64),
                                                 d[i].astype(np.float64),
                                                 3 * G)
        # float32 kernel vs float64 oracle: skip rays whose classification
        # is borderline (grazing a cell corner) — exact-cell agreement is
        # required for the rest
        if want_hit != bool(hit[i]):
            assert want_hit ^ bool(hit[i]), "unreachable"
            continue
        n_checked += 1
        if want_hit:
            n_hits += 1
            assert (cell[i] == want_cell).all(), (i, cell[i], want_cell)
            assert abs(t[i] - want_t) < 1e-2 + 1e-3 * abs(want_t), \
                (i, t[i], want_t)
    # classification disagreements must be rare (grazing-corner rays only)
    assert n_checked >= B * 0.97, f"only {n_checked}/{B} rays agree"
    assert n_hits > 5, "test scene produced too few hits to be meaningful"


def test_pack_occupancy_bits():
    G = 32
    vox = np.zeros((G, G, G), bool)
    vox[3, 5, 7] = True
    vox[31, 31, 31] = True
    w = brick_dda.pack_occupancy(vox).view(np.uint32)
    W = -(-G // 32)
    assert w[(3 * G + 5) * W + 0] == np.uint32(1) << 7
    assert w[(31 * G + 31) * W + 0] == np.uint32(1) << 31
    assert (w != 0).sum() == 2


def test_active_mask_and_miss():
    G = 16
    vox = np.zeros((G, G, G), bool)
    vox[8, 8, 8] = True
    tab = brick_dda.table_rows(brick_dda.pack_occupancy(vox))
    o = np.array([[8.5, 8.5, -5.0], [8.5, 8.5, -5.0], [0.5, 0.5, -5.0]],
                 np.float32)
    d = np.array([[0, 0, 1.0], [0, 0, 1.0], [0, 0, 1.0]], np.float32)
    act = np.array([True, False, True])
    out = brick_dda.coarse_dda(tab, jnp.asarray(o), jnp.asarray(d),
                               grid_size=G, active=jnp.asarray(act),
                               interpret=True)
    hit = np.asarray(out["hit"])
    assert hit[0] and not hit[1] and not hit[2]
    assert np.asarray(out["cell"])[0].tolist() == [8, 8, 8]
    # entry distance: ray travels 5 + 8 units to the cell's z face
    assert abs(float(np.asarray(out["t"])[0]) - 13.0) < 1e-2


def test_near_axis_direction_clamped():
    """Directions with a component inside the 1e-4 clamp window must hit
    the same cells as the clamped oracle — pins the r2 livelock fix
    (kernel and oracle both snap |d|<1e-4 components to +-1e-4)."""
    G = 32
    rng = np.random.default_rng(99)
    vox = rng.random((G, G, G)) < 0.05
    tab = brick_dda.table_rows(brick_dda.pack_occupancy(vox))
    B = 64
    o = rng.uniform(2, G - 2, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    # force one component into the 1e-12..1e-4 window the old eps missed
    ax = rng.integers(0, 3, B)
    mag = rng.uniform(1e-8, 9e-5, B).astype(np.float32)
    d[np.arange(B), ax] = np.where(d[np.arange(B), ax] >= 0, mag, -mag)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    out = brick_dda.coarse_dda(tab, jnp.asarray(o), jnp.asarray(d),
                               grid_size=G, interpret=True)
    hit = np.asarray(out["hit"])
    cell = np.asarray(out["cell"])
    n_agree = 0
    for i in range(B):
        want_hit, _, want_cell = dda_oracle(vox, o[i].astype(np.float64),
                                            d[i].astype(np.float64), 3 * G)
        if want_hit == bool(hit[i]) and (
                not want_hit or (cell[i] == want_cell).all()):
            n_agree += 1
    assert n_agree >= B * 0.95, f"{n_agree}/{B}"
