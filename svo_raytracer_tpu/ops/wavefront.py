"""Brick-wavefront traversal v3 — the production Pallas TPU path.

Re-expresses the reference's per-pixel octree walk
(/root/reference/src/shaders/svotrace.comp:211-432) as a sorted
brick-wavefront over the BrickScene decomposition (ops/brick_scene.py),
with the same hit semantics as the XLA reference ops/brick_trace.py.

Why v1 (ops/brick_pallas.py) was slow (measured round 1/2,
.tpu_jobs/040_profile.out): its round loop re-binned all rays every
round with argsort + ~10 full-size random gathers + scatters + 5
unscatters, at XLA's ~0.1 G elem/s random-access rate — ~400 ms of glue
per round against a ~20 ms kernel.  v2's glue per round is ONE
multi-operand ``lax.sort`` (the payloads ride the sort; no gathers), and
the ray state *stays in sorted order* across rounds:

  * done rays sort to the tail; compaction is a prefix slice (free),
    taken whenever the active count drops below half the current size;
  * a ray tile (8,128) may span up to KMAX distinct bricks; the kernel
    receives all KMAX occupancy blocks (4 KB each, pipelined HBM->VMEM
    by the BlockSpec index maps from scalar-prefetched slot ids);
  * the L0 brick-grid march to the next occupied brick runs in the same
    kernel against resident (8,128) bit tables, including the
    mixed-vs-uniform classification; uniform-solid bricks resolve to
    hits in-kernel;
  * per-voxel hit attributes resolve in ONE post-pass XLA gather per
    segment (hits only), not per round;
  * both DDA phases are early-exit ``lax.while_loop``s, so the kernel
    cost tracks actual occupancy instead of fixed step budgets.

v3 (this file) attacks the remaining glue, measured in r2 to be the
12-operand 2 M-ray sort (~25 ms/round, .tpu_jobs/05x) and the per-round
host dispatch through the axon tunnel (~20 ms each, 19 rounds):

  * the hit record rides the sort as ONE packed int32 (``pack`` =
    uniform-flag<<30 | brick-cell<<15 | voxel-within-brick) instead of
    two words (vox, aidx); both decode in the post-pass;
  * camera mode: primary rays re-derive their direction in-kernel from
    the ray id + 15 camera scalars (SMEM prefetch), exactly mirroring
    shade.pixel_dirs_rows (svotrace.comp:662-664), so the sort carries
    (key, t, pack, it, rid) = 5 operands instead of 12;
  * static-schedule replay: a dynamic trace records its per-round
    compaction schedule; subsequent traces replay the whole round loop
    inside ONE jit (zero host round-trips per trace).  Replay is guarded
    — rays still pending after the replayed rounds are detected by the
    caller (``pack == PACK_PEND``) and the trace falls back to dynamic.

Scene-side it needs only the BrickScene plus two derived bit tables
(:func:`prepare`).  Oracle: ops/brick_trace.intersect_bricks (tested in
tests/test_wavefront.py); semantics notes there apply unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import brick_dda, brick_trace

f32 = jnp.float32
i32 = jnp.int32

LANES = 128
TILE = 8 * LANES            # rays per grid step
# Distinct candidate bricks per ray tile per round.  Candidate blocks
# arrive via BlockSpec scalar-prefetch index maps, which Mosaic
# pipelines ahead of the grid step — unlike the serve loop's in-kernel
# DMAs they cost NO exposed latency, so a wider candidate set directly
# raises the per-round retire rate for incoherent (bounce) tiles whose
# sorted runs span more than 4 cells.  Measured r3 (087, 1080p gi-1 on
# the 1024^3 bench scene): KMAX 4 -> 8 with the DRAIN_TILES tail drain
# took the segment replay 6404 -> 534 ms and primaries 282 -> 171 ms.
# Env-overridable for per-process A/B sweeps (NEVER change it mid-
# process: shape-keyed jit caches would serve stale tables — CLAUDE.md).
KMAX = int(os.environ.get("SVO_WAVE_KMAX", "8"))
KEY_DONE = np.int32(1 << 30)
KEY_INIT = np.int32(-2)     # ray not yet L0-marched (round 0 / stuck)
PACK_PEND = np.int32(-2)    # ray alive, no hit record yet
PACK_MISS = np.int32(-1)    # ray retired without a hit
_EXIT_EPS = np.float32(1e-2)  # voxel-unit nudge across brick boundaries
DEFAULT_EXTRA = 0   # in-kernel dynamic crossings per round (tuned on-chip)
# Bound of the candidate-coverage crossing loop (a lax.while_loop, so
# compile cost is flat in it): per sorted round, a ray keeps crossing
# bricks while its current cell is still among the tile's KMAX static
# candidates — v3's cont=1 gave every ray at most ONE crossing per
# round, which made the ladder length track the per-ray crossing count
# (10-16 rounds, each paying a full-size multi-operand sort).  The bound
# only backstops pathological ping-ponging; ITER_CAP retires runaways.
DEFAULT_CLOOP = int(os.environ.get("SVO_WAVE_CLOOP", "64"))
# In-kernel serve loop bound (crossings served per tile per round).  The
# serve loop (a lax.while_loop, NOT an unroll — compile time is flat in
# this number) repeatedly votes the tile's min pending brick cell, DMAs
# its 4 KB occupancy block HBM->VMEM, and runs one crossing, until every
# lane retires.  This is what lets ONE dispatch complete a whole
# traversal segment: without it a tile only progresses on its KMAX=4
# static candidate cells per sorted round, so incoherent (random/bounce)
# rays spanning hundreds of cells per tile starved the round ladder
# (measured r2: gate hit_agree 0.784 from round exhaustion; 99-round gi1
# ladders).  Rays still pending at the bound punt to the next sorted
# round — the ladder is the backstop, not the workhorse.
DEFAULT_SERVE = 4096
# Cells served per serve iteration.  Each cell's 4 KB occupancy DMA is
# started as soon as its vote completes and waited only when the
# crossing needs the data, so the V copies are IN FLIGHT TOGETHER — the
# ~48 us dependent-DMA latency (pallas_prims.jsonl p8) amortizes V-fold.
# Measured r3 (081: serve_width=1, pixel-order gi): 15.1 s/frame, pure
# DMA latency.  serve_width applies at every G: the cell->slot map is
# SMEM-resident at all sizes (raw i32 words for G<=32, two packed
# sign-extendable 16-bit slots per word for G>32 — see _slot_of).
DEFAULT_SERVE_WIDTH = 4
# Ladder-vs-drain threshold, in tiles.  Serving at FULL frame size is
# compute-bound at ~30-100 us per (tile, crossing) — 084 measured a 2 M
# -ray gi drain at 6.4 s vs ~35 ms/round for the static-candidate sort
# ladder.  So sorted rounds carry the BULK (prefetched KMAX candidate
# blocks, zero DMA latency, re-sorted coherence every round) and the
# serve loop fires only once the active set has compacted to this many
# tiles — draining the deep/incoherent tail that ran the r2 ladder to
# 97+ rounds.  A replay's final round always serves, so a recorded
# schedule can never go stale (per-frame variation drains in-kernel).
# 64 tiles measured best at 1080p (087: gi replay 534 ms vs 594 at 256
# tiles; 088: serve_bulk>0 in bulk rounds LOSES — gi 882 ms, prim
# 206 ms — serve iterations at large active sizes are compute-bound).
DRAIN_TILES = int(os.environ.get("SVO_WAVE_DRAIN_TILES", "64"))
# Per-ray DDA-step kill switch, the analog of the reference's
# MAX_RAYCAST_ITERATIONS=1500 runaway guard (svotrace.comp:41): a ray
# past the cap retires as a miss.  Legit 1024^3 rays measure ~170 steps
# per segment (PERF_NOTES.md); only degenerate livelocks reach the cap.
ITER_CAP = np.int32(4000)
# Direction components are clamped to +-_DIR_EPS before 1/d: 1e-12 (the
# old value) let near-axis bounce rays livelock — with |dz|~3e-8 the
# per-step z movement t*dz is below the f32 ulp of a 1024-scale
# coordinate, so the DDA's z state never advances (measured: 3 gi rays
# pinned every gi1 ladder at max_rounds, ~4 s/frame).  1e-4 keeps the
# minor-axis step above ulp(1024)=6e-5; worst-case hit drift over the
# 1774-voxel world diagonal is 0.18 voxel.  brick_trace/brick_dda use
# the same value (oracle lock-step).
_DIR_EPS = np.float32(1e-4)
# Default for _dda_cr's gate_refine=None (used only by direct callers /
# A-B jobs): gate the refine block behind lax.cond(any lane on an
# occupied coarse cell).  The kernel passes explicit per-phase values —
# ungated for the cheap phase-1 byte fetch, gated for the G>32 L0 fetch
# (.tpu_jobs/150; PERF_NOTES r4).
GATE_REFINE = True
# Fill unused tile-candidate slots with cells marched along the tile's
# mean ray (_predicted_tables).  Without it a coherent tile exposes 1-2
# distinct cells and the candidate-coverage loop degenerates to one
# crossing per sorted round.  Module-level for on-chip A/B (reload the
# module per setting).
PREDICT = os.environ.get("SVO_WAVE_PREDICT", "1") != "0"
# ---- paged L0 (G > 64; worlds > 2048^3) ------------------------------
# The flat L0 coarse-refine tables stop scaling at G=64: the byte-cell
# fetch is already a 64-row composite there, and G=128 would need 512
# rows (the 2048^3-cliff cost class, per REFINE CALL).  Above G=64 the
# L0 grid is split into PAGES of 64^3 bricks — each page carries exactly
# the G=64 table structure (64 byte rows + 8 coarse rows) plus its own
# mixed-byte rows and supercell row, 137 rows = 68 KB per page:
#
#   * a tiny resident page-occupancy bit row ((1,128), P^3 <= 64 pages
#     at 8192^3) lets the in-kernel march jump EMPTY pages analytically;
#   * per tile, KPAGE candidate page tables arrive via scalar-prefetch
#     BlockSpecs exactly like the KMAX brick candidates (tile tables
#     predict pages from present cells + a page-grid march);
#   * a lane whose page is occupied but not among the tile's candidates
#     punts (key -> KEY_INIT, position preserved) to the next sorted
#     round — the same starvation/backstop contract as brick candidates;
#   * the in-kernel serve loop is disabled (its SMEM cell->slot map
#     would need G^3 entries, 4+ MB at G=128): paged worlds drain by
#     ladder + coverage, with the recorded tail rounds as the replay
#     guard (the pre-serve regime, which the profile already appends).
#
# The packed hit record also changes above G=64 (mixed slots can exceed
# the 15-bit field): mixed hits store the SLOT alone (bit 29 set) and
# the hit voxel is recomputed from t in _finish exactly like uniform
# hits at G>32 (same nudge/clip).  Reference scale parity:
# /root/reference/README.md:7 (8192^3), Octree.java:237-244.
PAGE = 64
KPAGE = int(os.environ.get("SVO_WAVE_KPAGE", "4"))
PAGE_ROWS = 137   # 64 occ-byte ++ 8 occ-coarse ++ 64 mixed-byte ++ 1 sc
# Direction-octant composite sort keys (G <= 64, non-paged): pending
# keys become oct(d) << OCT_SHIFT(G) | cell, so the global sort clusters
# rays by DIRECTION CLASS before cell — a bounce tile then shares a
# travel direction and the mean-ray candidate prediction actually covers
# its lanes' paths (with plain cell keys a bounce tile mixes all 8
# octants and the marched candidates fit nobody).  A/B lever (r5).
OCT_SORT = os.environ.get("SVO_WAVE_OCT", "0") != "0"
# Distance-field supercell jumps (VERDICT r5 item 1b): the supercell
# rows store a 4-bit chebyshev distance per 8^3-brick group instead of
# an any-bit, and _dda_cr's sc jump crosses d supercells analytically
# in ONE iteration (d=1 == the r4 single-supercell skip; same fetch,
# same row).  Long empty-space runs — the sky half of every bounce
# ladder — collapse from ~n iterations to ~log-ish few.  Off: the jump
# arithmetic degrades to d=1 on the same tables (A/B lever).
SC_DIST = os.environ.get("SVO_WAVE_SCDIST", "1") != "0"


def _oct_shift(G):
    return {1: 0, 2: 3, 4: 6, 8: 9, 16: 12, 32: 15, 64: 18}[G]

# state tuple layouts (key first; (t, pack, it, rid) always last):
#   explicit: (key, ox, oy, oz, dx, dy, dz, t, pack, it, rid)
#   camera:   (key, t, pack, it, rid)   + 16 f32 camera scalars in SMEM


# --------------------------------------------------------------------- scene
@dataclasses.dataclass
class WaveScene:
    """Device-ready wavefront view of a BrickScene.

    Payload arrays are allocated at ``capacity`` >= n_mixed slots so
    incremental edits (:func:`apply_patch`) can append mixed bricks
    without changing array shapes (a shape change recompiles every
    kernel — ~40 s through the tunnel).
    """

    world_size: int
    grid_size: int
    n_mixed: int
    capacity: int
    l0_occ: Any      # (RB+RC, 128) i32 — occupied-brick (occ|uniform)
                     # coarse-refine tables: byte-cell fine rows followed
                     # by coarse-bit rows (_l0_cr_tables / _l0_rows)
    l0_mixed: Any    # (rows,128) i32 — mixed-brick bits, z-column packed
                     # (probed once per L0 stop)
    brick_slot: Any  # (G^3,) i32
    occ_words: Any   # (capacity, 8, 128) i32 — per-brick 32^3 occupancy
                     # in BYTE-CELL layout (_cr_split: byte c&3 of word
                     # c>>2 holds coarse cell c's 8 fine-voxel bits)
    attr_comb: Any   # (capacity*32768 + G^3,) i32 — mixed attrs ++ uniform
                     # (2-D (capacity + G^3/32768, 32768) when > 2^31 elems)
    slot_cell: Any = None  # (capacity,) i32 — mixed slot -> L0 cell (G>32)
    sc_words: Any = None   # (capacity, 1, 128) i32 — 16^3 coarse (2-voxel
                           # cell) occupancy bits: bit c&31 of word c>>5
    l0_sc: Any = None      # (1, 128) i32 — (G/8)^3 super-L0 chebyshev
                           # distance NIBBLES, cell (sx*n+sy)*n+sz at
                           # word c>>3 bits (c&7)*4; 0 = some occupied
                           # brick in the 8^3 group (_l0_super_words)
    fingerprint: int = 0   # cheap scene-content hash: keys the persisted
                           # schedule cache so two scenes with equal
                           # (world_size, n_mixed) can't swap ladders
    attr16: bool = False   # attr_comb stored as int16 half-words
                           # (_encode_attr16) — the 8192^3 memory format


def _scene_fingerprint(scene):
    """Cheap host-side content hash of the L0 layout (which cells are
    mixed/uniform — the geometry that shapes traversal ladders).  Avoids
    hashing the 100s-of-MB attrs; two scenes that differ only in attrs
    traverse identically, so sharing schedules between them is correct."""
    slot = np.asarray(scene.brick_slot, np.int64)
    ba = np.asarray(scene.brick_attr, np.int64)
    mix = (slot >= 0).astype(np.int64)
    uni = (ba != 0).astype(np.int64)
    idx = np.arange(slot.shape[0], dtype=np.int64)
    return int((np.sum(mix * (idx % 8191)) * 31
                + np.sum(uni * (idx % 8191))) % 99991)


def _l0_mixed_table(scene):
    G = scene.grid_size
    mixed = (np.asarray(scene.brick_slot) >= 0).reshape(G, G, G)
    return np.asarray(brick_dda.table_rows(brick_dda.pack_occupancy(mixed)))


def _cr_split(vox):
    """Coarse-refine tables of an (n, F, F, F) bool occupancy (F even).

    Returns (byte_words (n, RB, 128), coarse_words (n, RC, 128)) i32:

      * coarse cell c = (Cx*h + Cy)*h + Cz (h = F/2, a 2^3 fine block):
        its ANY-bit is bit (c & 31) of coarse word (c >> 5);
      * its 8 FINE bits live in byte (c & 3) of byte word (c >> 2), bit
        (i<<2 | j<<1 | k) for fine offset (i, j, k) within the block —
        one fetch yields the whole refine neighborhood (kernel _dda_cr).
    """
    n, F = vox.shape[0], vox.shape[1]
    if F == 1:
        # degenerate single-cell grid (G=1, a 32^3 world): one coarse
        # cell whose byte holds the lone fine bit at offset (0,0,0)
        occ = vox.reshape(n, 1).astype(np.uint32)
        bout = np.zeros((n, 128), np.uint32)
        bout[:, 0] = occ[:, 0]
        cout = bout.copy()
        return (bout.view(np.int32).reshape(n, 1, 128),
                cout.view(np.int32).reshape(n, 1, 128))
    h = F // 2
    c = vox.reshape(n, h, 2, h, 2, h, 2).transpose(0, 1, 3, 5, 2, 4, 6)
    c = c.reshape(n, h * h * h, 8)           # last axis = (i, j, k) flat
    byte = np.zeros((n, h * h * h), np.uint32)
    for b in range(8):
        byte |= c[:, :, b].astype(np.uint32) << np.uint32(b)
    nw_b = -(-h * h * h // 4)
    by = np.zeros((n, nw_b * 4), np.uint32)
    by[:, :h * h * h] = byte
    by = by.reshape(n, nw_b, 4)
    bw = np.zeros((n, nw_b), np.uint32)
    for b in range(4):
        bw |= by[:, :, b] << np.uint32(8 * b)
    rb = -(-nw_b // 128)
    bout = np.zeros((n, rb * 128), np.uint32)
    bout[:, :nw_b] = bw

    occ_c = c.any(axis=2).reshape(n, -1)     # (n, h^3) coarse any-bits
    nw_c = -(-h * h * h // 32)
    fl = np.zeros((n, nw_c * 32), bool)
    fl[:, :h * h * h] = occ_c
    fl = fl.reshape(n, nw_c, 32)
    cw = np.zeros((n, nw_c), np.uint32)
    for b in range(32):
        cw |= fl[:, :, b].astype(np.uint32) << np.uint32(b)
    rc = -(-nw_c // 128)
    cout = np.zeros((n, rc * 128), np.uint32)
    cout[:, :nw_c] = cw
    return (bout.view(np.int32).reshape(n, rb, 128),
            cout.view(np.int32).reshape(n, rc, 128))


def _occ_vox(occ_words):
    """(n, 8, 128) z-column-packed 32^3 occupancy -> (n,32,32,32) bool."""
    n = occ_words.shape[0]
    w = np.asarray(occ_words).astype(np.uint32).reshape(n, 32, 32)
    # w[:, x, y] holds the 32 z-bits of column (x, y)
    return ((w[:, :, :, None] >> np.arange(32, dtype=np.uint32)) & 1) != 0


def _brick_cr(occ_words):
    """Brick payload tables for the coarse-refine kernel: byte-cell fine
    words (n, 8, 128) + 16^3 coarse bits (n, 1, 128)."""
    bw, cw = _cr_split(_occ_vox(occ_words))
    return bw, cw


def _l0_rows(G):
    """(byte rows, coarse rows) of the L0 coarse-refine tables."""
    h = max(G // 2, 1)
    nw_b = -(-h * h * h // 4)
    nw_c = -(-h * h * h // 32)
    return -(-nw_b // 128), -(-nw_c // 128)


def _l0_cr_tables(scene):
    """Concatenated L0 tables (byte-cell rows ++ coarse-bit rows) over
    the occupied-brick grid (mixed OR uniform), split again by static
    row counts in _call_kernel."""
    G = scene.grid_size
    # solidity is the VALUE BYTE of the uniform attr word (brick_attr
    # carries packed normals in the high bits even for air bricks) —
    # matches brick_scene's l0_occ rule ((uni & 0xFF) != 0)
    occ3 = ((np.asarray(scene.brick_slot) >= 0)
            | ((np.asarray(scene.brick_attr) & 0xFF) != 0)).reshape(
                1, G, G, G)
    bw, cw = _cr_split(occ3)
    return np.concatenate([bw[0], cw[0]], axis=0)


def _cheby_dist(occ, cap=15):
    """Chebyshev distance transform on a (..., n, n, n) bool grid:
    0 where occupied, else L-inf distance to the nearest occupied cell
    (clipped to ``cap``; all-``cap`` for empty grids — a jumping ray
    just exits the box).  Iterative 3^3 min-filter, n passes — grids
    here are <= 8^3 so this is microseconds at prepare time."""
    n = occ.shape[-1]
    d = np.where(occ, 0, cap).astype(np.int32)
    for _ in range(min(n, cap)):
        p = np.pad(d, [(0, 0)] * (d.ndim - 3) + [(1, 1)] * 3,
                   constant_values=cap)
        m = d
        for ax in (-1, 0, 1):
            for ay in (-1, 0, 1):
                for az in (-1, 0, 1):
                    m = np.minimum(
                        m, p[..., 1 + ax:1 + ax + n, 1 + ay:1 + ay + n,
                             1 + az:1 + az + n] + 1)
        d = m
    return np.minimum(d, cap)


def _pack_nibbles(vals, words=128):
    """(..., m) ints in [0,15] -> (..., words) i32, nibble i at word
    i>>3 bits (i&7)*4 (the supercell distance-row layout)."""
    v = np.asarray(vals, np.uint32)
    m = v.shape[-1]
    out = np.zeros(v.shape[:-1] + (words,), np.uint32)
    for b in range(m):
        out[..., b // 8] |= (v[..., b] & 0xF) << np.uint32((b % 8) * 4)
    return out.view(np.int32)


def _l0_super_words(scene):
    """(1,128) i32: per-8^3-brick-group (supercell) chebyshev DISTANCE
    nibbles of the L0 grid — 4 bits each, 0 = supercell occupied, d > 0
    = every supercell within chebyshev radius d-1 is empty (so the
    kernel's sc jump may cross d supercells analytically; SC_DIST=off
    degrades to the r4 single-supercell skip on the same table).
    Worlds smaller than 8 bricks/edge get all-zeros (never skip; the
    kernel also disables the probe for G<8)."""
    G = scene.grid_size
    n = G // 8
    if n == 0:
        return np.zeros((1, 128), np.int32)
    occ3 = ((np.asarray(scene.brick_slot) >= 0)
            | ((np.asarray(scene.brick_attr) & 0xFF) != 0)).reshape(G, G, G)
    sup = occ3.reshape(n, 8, n, 8, n, 8).any(axis=(1, 3, 5))
    return _pack_nibbles(_cheby_dist(sup).reshape(1, -1))


def _page_tables_np(scene):
    """((P^3, PAGE_ROWS, 128) page tables, (1,128) page-occupancy row)
    for a G>64 BrickScene.  Per-page layout (row offsets):
      [0:64)    occupied-brick byte-cell rows   (_cr_split fine words)
      [64:72)   occupied-brick coarse-bit rows
      [72:136)  mixed-brick byte-cell rows      (same c>>2 layout)
      [136]     supercell row: chebyshev-distance NIBBLE per 8^3-brick
                group at (sx*8+sy)*8+sz (512 nibbles = 64 words; 0 =
                occupied — see _l0_super_words)
    """
    G = scene.grid_size
    P = G // PAGE
    assert G % PAGE == 0 and P * P * P <= 64, (G, P)
    occ3 = ((np.asarray(scene.brick_slot) >= 0)
            | ((np.asarray(scene.brick_attr) & 0xFF) != 0)).reshape(G, G, G)
    mix3 = (np.asarray(scene.brick_slot) >= 0).reshape(G, G, G)

    def pages(v):
        return (v.reshape(P, PAGE, P, PAGE, P, PAGE)
                .transpose(0, 2, 4, 1, 3, 5).reshape(P ** 3, PAGE, PAGE,
                                                     PAGE))

    occp, mixp = pages(occ3), pages(mix3)
    bw, cw = _cr_split(occp)            # (P^3, 64, 128), (P^3, 8, 128)
    mbw, _ = _cr_split(mixp)            # (P^3, 64, 128)
    n = P ** 3
    # supercell row: chebyshev-distance NIBBLE per 8^3-brick group
    # (same encoding as _l0_super_words; 512 nibbles = 64 words)
    sup = occp.reshape(n, 8, 8, 8, 8, 8, 8).any(axis=(2, 4, 6))
    scw = _pack_nibbles(_cheby_dist(sup).reshape(n, 512))
    tabs = np.concatenate([bw, cw, mbw, scw.reshape(n, 1, 128)], axis=1)
    assert tabs.shape[1] == PAGE_ROWS
    pocc = occp.reshape(n, -1).any(axis=1)
    prow = np.zeros(128, np.uint32)
    for b in range(n):
        prow[b // 32] |= np.uint32(bool(pocc[b])) << np.uint32(b % 32)
    return tabs.astype(np.int32), prow.view(np.int32).reshape(1, 128)


def _encode_attr16(a32, full_depth):
    """i32 attr word -> int16 half-word: value(2) | raw(10) << 2 |
    ddepth(3) << 12, ddepth = log2(ws)-depth (the 8192^3 memory format —
    VERDICT r4 'half-word attrs').  Air (a32 == 0) encodes to 0.  Lossy
    vs the i32 word only for (a) materials > 3 (none exist in the
    shipped scenes) and (b) the subdividable stale-mask normal quirk
    (raw is a 16-bit leaf mask there; clipped to 10 bits) — neither is
    reachable from the direct heightmap builder (models/bigworld.py).
    Decoded back to the i32 layout inside _finish.  Processes in
    chunks and stays in int32: an 8192^3 world's attrs are ~6.2 G
    elements — the original whole-array int64 temporaries peaked at
    >100 GB host RSS (measured r5 job 232)."""
    a32 = np.asarray(a32)
    flat = a32.reshape(-1)
    out = np.empty(flat.shape, np.int16)
    step = 1 << 26
    for i in range(0, flat.shape[0], step):
        a = flat[i:i + step]
        v = a & 3
        raw = (a >> 8) & 0x3FF
        depth = (a >> 24) & 0x1F
        dd = np.clip(full_depth - depth, 0, 7).astype(np.int32)
        dd = np.where(a == 0, 0, dd)
        out[i:i + step] = (v | (raw << 2)
                           | (dd << 12)).astype(np.uint16).view(np.int16)
    return out.reshape(a32.shape)


def prepare(scene, capacity: int | None = None,
            attr16: bool = False,
            attr2d: bool | None = None) -> WaveScene:
    """Derive the wavefront tables from a BrickScene (one-time).

    Pass the HOST (NumPy) BrickScene, not ``.to_device()`` output: this
    reads the arrays with np.asarray, and device->host through the axon
    tunnel is ~1 MB/s (CLAUDE.md) — the 600 MB attrs would take minutes.
    The returned WaveScene holds device arrays.

    G > 64 worlds (4096^3 / 8192^3) use the PAGED L0 layout (module
    constants): ``l0_occ`` holds the (1,128) page-occupancy row,
    ``l0_mixed`` the (P^3 * PAGE_ROWS, 128) page tables, ``l0_sc`` a
    dummy row.  ``attr16`` stores attrs as int16 half-words
    (_encode_attr16) — required to fit 8192^3 in HBM.  ``attr2d``
    forces (or suppresses) the 2-D attr_comb storage that is otherwise
    auto-selected for > 2^31-element tables; tests use it to exercise
    the big-world gather path at small scale.
    """
    G = scene.grid_size
    paged = G > PAGE
    if paged and G % PAGE:
        raise ValueError(f"paged L0 needs G % {PAGE} == 0; got {G}")
    if G > 256:
        raise ValueError(f"wavefront L0 grid is limited to 256^3 "
                         f"(world <= 8192^3); got G={G}")
    if capacity is None:
        capacity = scene.n_mixed + max(64, scene.n_mixed // 8)
    assert capacity >= scene.n_mixed
    if paged:
        # mixed hits store the slot alone (bit 29; voxel recomputed
        # from t in _finish), so only the sort/key range binds
        assert capacity < (1 << 29)
    elif G > 32:
        # the packed hit record stores the mixed SLOT in 15 bits (the
        # cell id no longer fits beside widx — module docstring)
        assert capacity < (1 << 15), (
            f"G={G} worlds support < 32768 mixed bricks; {capacity}")
    nm = scene.occ_words.shape[0]
    occ = np.zeros((capacity, 8, 128), np.int32)
    scw = np.zeros((capacity, 1, 128), np.int32)
    # batched: _brick_cr expands each brick to 32^3 bools — at 8192^3
    # capacities (1e5 bricks) one shot would spike tens of GB of host
    # intermediates
    for b0 in range(0, nm, 4096):
        b1 = min(b0 + 4096, nm)
        occ[b0:b1], scw[b0:b1] = _brick_cr(scene.occ_words[b0:b1])
    adt = np.int16 if attr16 else np.int32
    # >2^31-element attr tables (8192^3-class) are stored 2-D
    # (capacity + G^3/32768, 32768): a flat i32 index cannot form, and a
    # reshape inside jit(_finish) would materialize a second full copy
    # of the table as an HLO temp (12.7 GB at 8192^3 — measured OOM,
    # .tpu_jobs/237).  2-D rows gather directly with (row, col).
    big = (capacity * 32768 + G * G * G > (1 << 31) - 1
           if attr2d is None else attr2d)
    if big:
        # tail (uniform-cell attrs) padded up to whole rows; the
        # (row, col) gather in _finish never reads past cell G^3-1
        attr_comb = np.zeros((capacity - (-(G * G * G) // 32768), 32768),
                             adt)
    else:
        attr_comb = np.zeros(capacity * 32768 + G * G * G, adt)
    flat = attr_comb.reshape(-1)[:capacity * 32768 + G * G * G]
    full_depth = int(np.log2(scene.world_size))
    if attr16:
        for b0 in range(0, nm, 4096):
            b1 = min(b0 + 4096, nm)
            flat[b0 * 32768:b1 * 32768] = _encode_attr16(
                np.asarray(scene.attrs[b0:b1]).reshape(-1), full_depth)
        flat[capacity * 32768:] = _encode_attr16(
            np.asarray(scene.brick_attr, np.int32), full_depth)
    else:
        flat[:nm * 32768] = np.asarray(scene.attrs).reshape(-1)
        flat[capacity * 32768:] = np.asarray(scene.brick_attr,
                                             np.int32)
    slot_np = np.asarray(scene.brick_slot)
    slot_cell = np.zeros(capacity, np.int32)
    cells = np.nonzero(slot_np >= 0)[0]
    slot_cell[slot_np[cells]] = cells.astype(np.int32)
    if paged:
        tabs, prow = _page_tables_np(scene)
        l0_occ = prow
        l0_mixed = tabs.reshape(-1, 128)
        l0_sc = np.zeros((1, 128), np.int32)
    else:
        l0_occ = _l0_cr_tables(scene)
        l0_mixed = _l0_mixed_table(scene)
        l0_sc = _l0_super_words(scene)
    return WaveScene(
        fingerprint=_scene_fingerprint(scene),
        world_size=scene.world_size, grid_size=G, n_mixed=scene.n_mixed,
        capacity=capacity, attr16=attr16,
        l0_occ=jnp.asarray(l0_occ, i32),
        l0_mixed=jnp.asarray(l0_mixed, i32),
        brick_slot=jnp.asarray(scene.brick_slot, i32),
        occ_words=jnp.asarray(occ, i32),
        attr_comb=jnp.asarray(attr_comb, adt),
        slot_cell=jnp.asarray(slot_cell, i32),
        sc_words=jnp.asarray(scw, i32),
        l0_sc=jnp.asarray(l0_sc, i32),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4),
                   static_argnames=("cap",))
def _apply_patch_dev(attr_comb, occ_words, brick_slot, slot_cell, sc_words,
                     upd_slots, attr_rows, occ_rows, sc_rows, cells,
                     cell_attr, cell_slot, cap):
    head = attr_comb[:cap * 32768].reshape(cap, 32768)
    head = head.at[upd_slots].set(attr_rows)
    tail = attr_comb[cap * 32768:].at[cells].set(cell_attr)
    attr_comb = jnp.concatenate([head.reshape(-1), tail])
    occ_words = occ_words.at[upd_slots].set(occ_rows)
    sc_words = sc_words.at[upd_slots].set(sc_rows)
    brick_slot = brick_slot.at[cells].set(cell_slot)
    slot_cell = slot_cell.at[cell_slot].set(cells, mode="drop")
    return attr_comb, occ_words, brick_slot, slot_cell, sc_words


def apply_patch(ws: WaveScene, scene, patch) -> WaveScene:
    """Apply a brick_scene.ScenePatch (host scene already updated) to the
    device WaveScene.  Uploads only the changed payload rows plus the two
    4 KB L0 bit tables — the analog of the reference's two ranged SSBO
    uploads after an edit (Main.java:349-350).  Falls back to a full
    :func:`prepare` when the patch outgrows the slot capacity.
    """
    if (patch.n_mixed > ws.capacity or ws.grid_size > PAGE or ws.attr16
            or ws.attr_comb.ndim == 2):
        # paged / half-word scenes re-derive in full (incremental paths
        # for >2048^3 edits are future work; a full prepare is correct)
        return prepare(scene, capacity=max(ws.capacity, patch.n_mixed
                       + max(64, patch.n_mixed // 8)), attr16=ws.attr16)
    p = len(patch.upd_slots)
    occ_rows = np.asarray(patch.occ_rows, np.int32).reshape(p, 8, 128)
    occ_cr, sc_cr = _brick_cr(occ_rows)
    attr_comb, occ_words, brick_slot, slot_cell, sc_words = _apply_patch_dev(
        ws.attr_comb, ws.occ_words, ws.brick_slot, ws.slot_cell, ws.sc_words,
        jnp.asarray(patch.upd_slots, i32),
        jnp.asarray(patch.attr_rows.reshape(p, 32768), i32),
        jnp.asarray(occ_cr, i32),
        jnp.asarray(sc_cr, i32),
        jnp.asarray(patch.cells, i32), jnp.asarray(patch.cell_attr, i32),
        jnp.asarray(patch.cell_slot, i32), cap=ws.capacity)
    return WaveScene(
        world_size=ws.world_size, grid_size=ws.grid_size,
        n_mixed=patch.n_mixed, capacity=ws.capacity,
        l0_occ=jnp.asarray(_l0_cr_tables(scene), i32),
        l0_mixed=jnp.asarray(_l0_mixed_table(scene), i32),
        brick_slot=brick_slot, occ_words=occ_words, attr_comb=attr_comb,
        slot_cell=slot_cell, sc_words=sc_words,
        l0_sc=jnp.asarray(_l0_super_words(scene), i32),
        fingerprint=_scene_fingerprint(scene))


# -------------------------------------------------------------------- kernel
def _fetch(rows, w):
    """Composite fetch: word ``w`` (8,128 i32) from VMEM table rows (each
    (8,128)); the only random-access form Mosaic lowers (brick_dda.py)."""
    lane = w & (LANES - 1)
    r = w >> 7
    out = jnp.take_along_axis(rows[0], lane, axis=1)
    for k in range(1, len(rows)):
        out = jnp.where(r == k, jnp.take_along_axis(rows[k], lane, axis=1),
                        out)
    return out


def _dda_cr(px, py, pz, dxc, dyc, dzc, inv_x, inv_y, inv_z, n, cell,
            probe_coarse, probe_byte, max_steps, act0, early_exit,
            sc_probe=None, gate_refine=None):
    """Masked coarse-refine DDA over an n^3 grid of ``cell``-edge FINE
    cells in [0, n*cell]^3 (v4 engine; replaces the per-fine-cell v3
    march).  The loop steps at 2x2x2-fine-cell COARSE granularity:

      * ``probe_coarse(cx, cy, cz)`` (coarse coords in [0, n/2)) tests
        the coarse cell's any-bit — 4096 bits = one 128-word row at
        brick scale, so the per-step fetch is ~1 lane-gather instead of
        the v3 8-row composite (and 8 rows instead of 64 for the G=64
        L0 march — the 2048^3 cliff's dominant term);
      * when a lane rests on an occupied coarse cell, ``probe_byte``
        fetches its 8 fine bits ONCE (byte c&3 of word c>>2, _cr_split)
        and an unrolled <=4-step sub-DDA resolves the exact fine hit —
        or passes through (the any-bit is conservative) and the coarse
        march resumes.  The refine is lax.cond-gated on "any lane needs
        it", so iterations through empty space never pay for it;
      * ``sc_probe(sx, sy, sz)`` (optional, 4^3-COARSE-cell supercells
        = the v3 8^3-fine granularity) returns the supercell's i32
        chebyshev distance to the nearest occupied supercell (0 =
        occupied); empty super-regions are jumped in ONE iteration —
        d-1 supercells past the current one when SC_DIST, else just the
        current — state recomputed from the ray at the exit t.

    Decision-equivalent to brick_trace._march: every coarse boundary is
    a fine boundary, entries are nudged by the same 1e-4*cell, and the
    returned t is the entry t of the hit FINE cell (absolute-form
    boundary ts, so rounding drift stays ulp-level).  All args (8,128);
    act0 i32.  Returns (hit_i, ix, iy, iz, t, inside_i, steps) in fine
    coords; for non-hit lanes t is how far the march got (stuck/missed
    handling in the caller is unchanged from v3)."""
    if gate_refine is None:
        gate_refine = GATE_REFINE
    n2 = max(n // 2, 1)
    cell2 = f32(2.0) * cell
    gf = f32(n) * cell
    t1x, t2x = (0.0 - px) * inv_x, (gf - px) * inv_x
    t1y, t2y = (0.0 - py) * inv_y, (gf - py) * inv_y
    t1z, t2z = (0.0 - pz) * inv_z, (gf - pz) * inv_z
    t_ent = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                    jnp.minimum(t1y, t2y)),
                        jnp.minimum(t1z, t2z))
    t_out = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                    jnp.maximum(t1y, t2y)),
                        jnp.maximum(t1z, t2z))
    t0 = jnp.maximum(t_ent, 0.0)
    misses_box = (t_ent > t_out) | (t_out < 0.0)
    push = jnp.where(t0 > 0.0, t0 + f32(1e-4) * cell, f32(0.0))
    qx = px + push * dxc
    qy = py + push * dyc
    qz = pz + push * dzc

    cx = jnp.clip((qx / cell2).astype(i32), 0, n2 - 1)
    cy = jnp.clip((qy / cell2).astype(i32), 0, n2 - 1)
    cz = jnp.clip((qz / cell2).astype(i32), 0, n2 - 1)
    sx = jnp.where(dxc > 0, i32(1), i32(-1))
    sy = jnp.where(dyc > 0, i32(1), i32(-1))
    sz = jnp.where(dzc > 0, i32(1), i32(-1))
    nx = jnp.where(dxc > 0, cx + 1, cx).astype(f32) * cell2
    ny = jnp.where(dyc > 0, cy + 1, cy).astype(f32) * cell2
    nz = jnp.where(dzc > 0, cz + 1, cz).astype(f32) * cell2
    tx = push + (nx - qx) * inv_x
    ty = push + (ny - qy) * inv_y
    tz = push + (nz - qz) * inv_z
    adx = jnp.abs(inv_x) * cell2
    ady = jnp.abs(inv_y) * cell2
    adz = jnp.abs(inv_z) * cell2
    fadx = jnp.abs(inv_x) * cell
    fady = jnp.abs(inv_y) * cell
    fadz = jnp.abs(inv_z) * cell

    alive0 = (act0 != 0) & ~misses_box
    alive0_i = alive0.astype(i32)
    t_init = jnp.where(alive0, push, 0.0)

    # Loop carries are i32/f32 vectors only — Mosaic cannot legalize
    # vector<i1> block arguments (measured r1; see ops/brick_dda.py).
    def live(c):
        cx, cy, cz = c[0], c[1], c[2]
        hit_i = c[6]
        inside = ((cx >= 0) & (cx < n2) & (cy >= 0) & (cy < n2)
                  & (cz >= 0) & (cz < n2))
        return (alive0_i != 0) & inside & (hit_i == 0)

    def body(c):
        (cx, cy, cz, tx, ty, tz, hit_i, t_cur, fx, fy, fz, t_hit,
         steps, k) = c
        act = live(c)
        ccx = jnp.clip(cx, 0, n2 - 1)
        ccy = jnp.clip(cy, 0, n2 - 1)
        ccz = jnp.clip(cz, 0, n2 - 1)
        occ = act & probe_coarse(ccx, ccy, ccz)

        def _refine(ops):
            occ_m_i, t_in = ops
            occ_m = occ_m_i != 0
            byte = probe_byte(ccx, ccy, ccz, occ_m)
            qrx = px + (t_in + f32(1e-4) * cell) * dxc
            qry = py + (t_in + f32(1e-4) * cell) * dyc
            qrz = pz + (t_in + f32(1e-4) * cell) * dzc
            gx = jnp.clip(jnp.floor(qrx / cell).astype(i32),
                          ccx * 2, ccx * 2 + 1)
            gy = jnp.clip(jnp.floor(qry / cell).astype(i32),
                          ccy * 2, ccy * 2 + 1)
            gz = jnp.clip(jnp.floor(qrz / cell).astype(i32),
                          ccz * 2, ccz * 2 + 1)
            bfx = jnp.where(dxc > 0, gx + 1, gx).astype(f32) * cell
            bfy = jnp.where(dyc > 0, gy + 1, gy).astype(f32) * cell
            bfz = jnp.where(dzc > 0, gz + 1, gz).astype(f32) * cell
            ftx = (bfx - px) * inv_x
            fty = (bfy - py) * inv_y
            ftz = (bfz - pz) * inv_z
            ts = t_in
            ref = occ_m
            rhit = jnp.zeros_like(cx)
            rix, riy, riz = gx, gy, gz
            rt = t_in
            for s in range(4):
                bit = (byte >> (((gx & 1) << 2) | ((gy & 1) << 1)
                                | (gz & 1))) & 1
                nh = ref & (bit != 0)
                rhit = rhit | nh.astype(i32)
                rix = jnp.where(nh, gx, rix)
                riy = jnp.where(nh, gy, riy)
                riz = jnp.where(nh, gz, riz)
                rt = jnp.where(nh, ts, rt)
                ref = ref & ~nh
                if s == 3:
                    break
                fmx = (ftx <= fty) & (ftx <= ftz)
                fmy = ~fmx & (fty <= ftz)
                fmz = ~fmx & ~fmy
                ts = jnp.where(ref, jnp.minimum(jnp.minimum(ftx, fty),
                                                ftz), ts)
                gx = jnp.where(ref & fmx, gx + sx, gx)
                gy = jnp.where(ref & fmy, gy + sy, gy)
                gz = jnp.where(ref & fmz, gz + sz, gz)
                ftx = jnp.where(ref & fmx, ftx + fadx, ftx)
                fty = jnp.where(ref & fmy, fty + fady, fty)
                ftz = jnp.where(ref & fmz, ftz + fadz, ftz)
                ref = (ref & ((gx >> 1) == ccx) & ((gy >> 1) == ccy)
                       & ((gz >> 1) == ccz))
            return rhit, rix, riy, riz, rt

        if gate_refine:
            zi_ = jnp.zeros_like(cx)
            rhit, rix, riy, riz, rt = jax.lax.cond(
                jnp.any(occ), _refine,
                lambda ops: (zi_, zi_, zi_, zi_, jnp.zeros_like(tx)),
                (occ.astype(i32), t_cur))
        else:
            rhit, rix, riy, riz, rt = _refine((occ.astype(i32), t_cur))
        nh = rhit != 0
        hit_i = hit_i | rhit
        fx = jnp.where(nh, rix, fx)
        fy = jnp.where(nh, riy, fy)
        fz = jnp.where(nh, riz, fz)
        t_hit = jnp.where(nh, rt, t_hit)
        act = act & ~nh

        steps = steps + act.astype(i32)
        mx = (tx <= ty) & (tx <= tz)
        my = ~mx & (ty <= tz)
        mz = ~mx & ~my
        tcur = jnp.minimum(jnp.minimum(tx, ty), tz)
        t_cur = jnp.where(act, tcur, t_cur)
        cx2 = jnp.where(act & mx, cx + sx, cx)
        cy2 = jnp.where(act & my, cy + sy, cy)
        cz2 = jnp.where(act & mz, cz + sz, cz)
        tx2 = jnp.where(act & mx, tx + adx, tx)
        ty2 = jnp.where(act & my, ty + ady, ty)
        tz2 = jnp.where(act & mz, tz + adz, tz)
        if sc_probe is not None:
            # empty supercell: jump to its exit in one iteration (a
            # refine hit inside an empty supercell is impossible, so
            # skip and hit are mutually exclusive by construction).
            # sc_probe returns the supercell's chebyshev DISTANCE d
            # (i32, 0 = occupied): with SC_DIST every supercell within
            # radius d-1 is empty, so the jump may cross the box
            # extending d-1 supercells (4(d-1) coarse cells) beyond the
            # current one per axis — long empty runs retire in one
            # iteration instead of one per supercell.
            d_sc = sc_probe(ccx >> 2, ccy >> 2, ccz >> 2)
            skip = act & (d_sc > 0)
            ext = ((d_sc - 1).astype(f32) * f32(4.0) if SC_DIST
                   else f32(0.0))
            remx = jnp.where(sx > 0, 3 - (ccx & 3), ccx & 3).astype(f32)
            remy = jnp.where(sy > 0, 3 - (ccy & 3), ccy & 3).astype(f32)
            remz = jnp.where(sz > 0, 3 - (ccz & 3), ccz & 3).astype(f32)
            t_exit = jnp.minimum(jnp.minimum(tx + (remx + ext) * adx,
                                             ty + (remy + ext) * ady),
                                 tz + (remz + ext) * adz) \
                + f32(1e-4) * cell2
            # never jump past the grid box: the distance field knows
            # nothing beyond it (a paged world's neighbor PAGE may be
            # solid right across the boundary — the caller's outer
            # march re-enters it with that page's own tables)
            t_exit = jnp.minimum(t_exit, t_out + f32(1e-4) * cell2)
            qx2 = px + t_exit * dxc
            qy2 = py + t_exit * dyc
            qz2 = pz + t_exit * dzc
            nix = jnp.floor(qx2 / cell2).astype(i32)
            niy = jnp.floor(qy2 / cell2).astype(i32)
            niz = jnp.floor(qz2 / cell2).astype(i32)
            ntx = t_exit + (jnp.where(dxc > 0, nix + 1, nix).astype(f32)
                            * cell2 - qx2) * inv_x
            nty = t_exit + (jnp.where(dyc > 0, niy + 1, niy).astype(f32)
                            * cell2 - qy2) * inv_y
            ntz = t_exit + (jnp.where(dzc > 0, niz + 1, niz).astype(f32)
                            * cell2 - qz2) * inv_z
            cx2 = jnp.where(skip, nix, cx2)
            cy2 = jnp.where(skip, niy, cy2)
            cz2 = jnp.where(skip, niz, cz2)
            tx2 = jnp.where(skip, ntx, tx2)
            ty2 = jnp.where(skip, nty, ty2)
            tz2 = jnp.where(skip, ntz, tz2)
            t_cur = jnp.where(skip, t_exit, t_cur)
        return (cx2, cy2, cz2, tx2, ty2, tz2, hit_i, t_cur, fx, fy, fz,
                t_hit, steps, k + 1)

    zi = jnp.zeros(px.shape, i32)
    c0 = (cx, cy, cz, tx, ty, tz, zi, t_init, cx * 2, cy * 2, cz * 2,
          t_init, zi, jnp.asarray(0, i32))
    if early_exit:
        c = jax.lax.while_loop(
            lambda c: (c[13] < max_steps) & jnp.any(live(c)), body, c0)
    else:
        c = jax.lax.fori_loop(0, max_steps, lambda _, c: body(c), c0)
    (cx, cy, cz, tx, ty, tz, hit_i, t_cur, fx, fy, fz, t_hit,
     steps, _) = c
    hb = hit_i != 0
    ix = jnp.where(hb, fx, cx * 2)
    iy = jnp.where(hb, fy, cy * 2)
    iz = jnp.where(hb, fz, cz * 2)
    t = jnp.where(hb, t_hit, t_cur)
    inside_i = (((cx >= 0) & (cx < n2) & (cy >= 0) & (cy < n2)
                 & (cz >= 0) & (cz < n2)) & ~misses_box).astype(i32)
    return hit_i, ix, iy, iz, t, inside_i, steps


def _bcast_rows(block, n):
    return [jnp.broadcast_to(block[r:r + 1, :], (8, LANES))
            for r in range(n)]


def _wf_kernel(G, NM, inner_cap, l0_cap, early_exit, cont, cam_dims, extra,
               sc_skip, serve, serve_width, cloop, kpage, *args):
    """One wavefront round for one (8,128) ray tile (module docstring).

    explicit mode (cam_dims=None) args:
      tslot, tcell, [bslot,] l0, mx, occ_0..occ_{KMAX-1}, [occ_hbm,
      co_hbm,] key, ox, oy, oz, dx, dy, dz, t, pack, it
      || keyo, to, packo, ito [ || scratches, dma_sems ]
    camera mode (cam_dims=(W, H, world_size)) args:
      tslot, tcell, cam16, [bslot,] l0, mx, occ_0..occ_{KMAX-1},
      [occ_hbm, co_hbm,] key, t, pack, it, rid
      || keyo, to, packo, ito [ || scratches, dma_sems ]
    — the ray origin/direction are re-derived per lane from rid + the 15
    camera scalars, mirroring shade.pixel_dirs_rows + _init_state.

    ``cont`` unrolls the {brick DDA, L0 march} crossing against the
    tile's static KMAX candidates; ``cloop`` runs it as a bounded
    lax.while_loop instead (flat compile cost) until no lane's cell is
    covered by the candidates.  ``extra`` appends unrolled dynamic
    crossings and ``serve`` the voted-DMA drain loop (module constants).
    """
    import jax.experimental.pallas as pl  # local: keeps CPU-importable
    from jax.experimental.pallas import tpu as pltpu

    need_dyn = bool(extra) or bool(serve)
    paged = G > PAGE
    args = list(args)
    tslot_ref = args.pop(0)
    tcell_ref = args.pop(0)
    tpage_ref = args.pop(0) if paged else None
    if cam_dims is not None:
        W, H, ws_world = cam_dims[:3]
        cam_ref = args.pop(0)
    # SMEM cell->slot map: raw i32 words for G<=32 (128 KB); two
    # 16-bit slots per word for G>32 (512 KB at G=64 — raw would be
    # 1 MB, and an HBM->SMEM word DMA crashes the Mosaic compiler)
    bslot_ref = args.pop(0) if need_dyn else None
    l0_ref = args.pop(0)
    mx_ref = args.pop(0)
    l0sc_ref = args.pop(0)
    occ_refs = [args.pop(0) for _ in range(KMAX)]
    sc_refs = [args.pop(0) for _ in range(KMAX)]
    page_refs = [args.pop(0) for _ in range(kpage)] if paged else []
    occ_hbm_ref = args.pop(0) if need_dyn else None
    co_hbm_ref = args.pop(0) if need_dyn else None
    VW = serve_width if serve else 1
    if need_dyn:
        co_sems = [args.pop() for _ in range(VW)][::-1]
        dma_sems = [args.pop() for _ in range(VW)][::-1]
        co_scratch_refs = [args.pop() for _ in range(VW)][::-1]
        scratch_refs = [args.pop() for _ in range(VW)][::-1]
    if cam_dims is None:
        (key_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_ref,
         pack_ref, it_ref) = args[:10]
        keyo_ref, to_ref, packo_ref, ito_ref = args[10:]
    else:
        key_ref, t_ref, pack_ref, it_ref, rid_ref = args[:5]
        keyo_ref, to_ref, packo_ref, ito_ref = args[5:]

    if cam_dims is not None:
        NBX = cam_dims[3] if len(cam_dims) > 3 else 0

    k = pl.program_id(0)
    key0 = key_ref[:]
    # defaults: pass-through (inactive / punted lanes keep their state)
    keyo_ref[:] = key0
    to_ref[:] = t_ref[:]
    packo_ref[:] = pack_ref[:]
    ito_ref[:] = it_ref[:]

    # tile tables are FLAT (T*KMAX,): SMEM pads the trailing dim to 128
    # lanes, so a (T, KMAX) operand would cost (T, 128) — two of those
    # blew the 1 MB SMEM budget at 1080p (2025 tiles).
    cells = [tcell_ref[k * KMAX + j] for j in range(KMAX)]
    slots = [tslot_ref[k * KMAX + j] for j in range(KMAX)]
    pages = ([tpage_ref[k * kpage + j] for j in range(kpage)]
             if paged else [])
    # page-band keys (paged L0): a lane whose occupied page had no
    # candidate table re-keys as BAND0 + page, so the next sort clusters
    # punted lanes BY PAGE and the tile tables serve those pages — the
    # page-level analog of cell keys (without it, incoherent rays starve
    # exactly like the pre-serve r2 ladder: KEY_INIT carries no locality)
    BAND0 = np.int32(G * G * G)
    in_cells0 = (key0 == cells[0])
    for j in range(1, KMAX):
        in_cells0 = in_cells0 | (key0 == cells[j])
    for j in range(len(pages)):
        in_cells0 = in_cells0 | (key0 == BAND0 + pages[j])

    # serve mode can advance ANY pending lane (the loop fetches whatever
    # block it needs), so its tile gate is simply "anything left to do"
    tile_gate = (jnp.any(key0 != KEY_DONE) if serve
                 else jnp.any(in_cells0 | (key0 == KEY_INIT)))

    @pl.when(tile_gate)
    def _tile():
        if cam_dims is None:
            ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
            dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        else:
            # per-lane primary ray from rid (matches shade.pixel_dirs_rows
            # + render_wave._frame_rays + _init_state exactly, op-for-op).
            # NBX>0: rid indexes 32x32-pixel BLOCKS (render_wave block-
            # major frames — a kernel tile then covers one compact pixel
            # block instead of half an image row, so the sort-free local
            # round's candidate tables actually cover its rays)
            rid = rid_ref[:]
            if NBX:
                bi = rid // 1024
                off = rid - bi * 1024
                by = bi // NBX
                bx = bi - by * NBX
                ly = off // 32
                pyi = by * 32 + ly
                pxi = bx * 32 + (off - ly * 32)
            else:
                pyi = rid // W
                pxi = rid - pyi * W
            # pad rays (block mode, py >= H) reuse the last real row's
            # direction: v > 1 extrapolation can normalize to NaN and
            # spin lanes to ITER_CAP (ADVICE r4)
            pyi = jnp.minimum(pyi, H - 1)
            u = (pxi.astype(f32) + f32(0.5)) / f32(W)
            v = (pyi.astype(f32) + f32(0.5)) / f32(H)
            c = [cam_ref[j] for j in range(15)]
            dun = []
            for ax in range(3):
                left = c[3 + ax] + (c[6 + ax] - c[3 + ax]) * v
                right = c[9 + ax] + (c[12 + ax] - c[9 + ax]) * v
                dun.append(left + (right - left) * u)
            nrm = jnp.sqrt(dun[0] * dun[0] + dun[1] * dun[1]
                           + dun[2] * dun[2])
            dx, dy, dz = dun[0] / nrm, dun[1] / nrm, dun[2] / nrm
            zf0 = jnp.zeros(key0.shape, f32)
            ox = zf0 + (c[0] - f32(1.0)) * f32(ws_world)
            oy = zf0 + (c[1] - f32(1.0)) * f32(ws_world)
            oz = zf0 + (c[2] - f32(1.0)) * f32(ws_world)
        eps = _DIR_EPS
        dxc = jnp.where(jnp.abs(dx) < eps, jnp.where(dx >= 0, eps, -eps), dx)
        dyc = jnp.where(jnp.abs(dy) < eps, jnp.where(dy >= 0, eps, -eps), dy)
        dzc = jnp.where(jnp.abs(dz) < eps, jnp.where(dz >= 0, eps, -eps), dz)
        if OCT_SORT and not paged:
            oct_key = ((dxc > 0).astype(i32) * 4 + (dyc > 0).astype(i32)
                       * 2 + (dzc > 0).astype(i32)) << _oct_shift(G)
        else:
            oct_key = None
        inv_x, inv_y, inv_z = 1.0 / dxc, 1.0 / dyc, 1.0 / dzc
        if not paged:
            RB, RC = _l0_rows(G)  # l0_ref = byte rows ++ coarse rows
            l0b_rows = _bcast_rows(l0_ref, RB)
            l0c_rows = [jnp.broadcast_to(l0_ref[RB + r:RB + r + 1, :],
                                         (8, LANES)) for r in range(RC)]
            mx_rows = _bcast_rows(mx_ref, mx_ref.shape[0])
            l0sc_rows = jnp.broadcast_to(l0sc_ref[0:1, :], (8, LANES))
        else:
            # l0_ref = (1,128) page-occupancy bits (PAGED layout); the
            # per-page tables arrive as the page_refs candidate blocks
            pocc_row = jnp.broadcast_to(l0_ref[0:1, :], (8, LANES))
        nsc = G // 8

        def l0_sc_probe(sx_, sy_, sz_):
            sbit = (sx_ * nsc + sy_) * nsc + sz_
            w = jnp.take_along_axis(l0sc_rows, sbit >> 3, axis=1)
            return (w >> ((sbit & 7) * 4)) & 0xF
        occ_rows_j = [_bcast_rows(occ_refs[j][0], 8) for j in range(KMAX)]
        sc_rows_j = [jnp.broadcast_to(sc_refs[j][0], (8, LANES))
                     for j in range(KMAX)]

        ZW = -(-G // 32)  # z-words per L0 mixed column (2 when G=64)
        HH = max(G // 2, 1)  # coarse L0 cells per edge

        def l0_probe_coarse(cx, cy, cz):
            c = (cx * HH + cy) * HH + cz
            word = _fetch(l0c_rows, c >> 5)
            return ((word >> (c & 31)) & 1) != 0

        def l0_probe_byte(cx, cy, cz, mask):
            c = (cx * HH + cy) * HH + cz
            word = _fetch(l0b_rows, c >> 2)
            return (word >> ((c & 3) * 8)) & 0xFF

        if paged:
            P = G // PAGE
            PGV = f32(PAGE * 32.0)
            pl0_cap = 3 * PAGE + 4

            def _paged_march(p2x, p2y, p2z, act2):
                """Phase-2 march under the PAGED L0 (module constants):
                jump empty pages analytically from the resident
                occupancy row; run the G=64-structured coarse-refine DDA
                inside each candidate page (cond-gated on presence);
                lanes on an occupied NON-candidate page stop unserved
                (returned as stuck -> KEY_INIT punt).  Same return
                contract as the flat _dda_cr call plus the mixed flag
                (resolved from the page's mixed-byte rows at the stop).
                """
                zi_ = jnp.zeros(p2x.shape, i32)
                zf_ = jnp.zeros(p2x.shape, f32)
                gfW = f32(G) * 32.0
                t1x, t2x_ = (0.0 - p2x) * inv_x, (gfW - p2x) * inv_x
                t1y, t2y_ = (0.0 - p2y) * inv_y, (gfW - p2y) * inv_y
                t1z, t2z_ = (0.0 - p2z) * inv_z, (gfW - p2z) * inv_z
                t_ent = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x_),
                                                jnp.minimum(t1y, t2y_)),
                                    jnp.minimum(t1z, t2z_))
                t_out = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x_),
                                                jnp.maximum(t1y, t2y_)),
                                    jnp.maximum(t1z, t2z_))
                miss_box = (t_ent > t_out) | (t_out < 0.0)
                t00 = jnp.maximum(t_ent, 0.0)
                push = jnp.where(t00 > 0.0, t00 + _EXIT_EPS, f32(0.0))
                alive0 = act2 & ~miss_box
                c0 = (jnp.where(alive0, push, 0.0), zi_, zi_, zi_, zi_,
                      zi_, jnp.where(miss_box & act2, 0, 1).astype(i32),
                      alive0.astype(i32), zi_, jnp.asarray(0, i32),
                      jnp.full(p2x.shape, -1, i32))

                def cond(c):
                    return (c[9] < 3 * P + 4) & jnp.any(c[7] != 0)

                def body(c):
                    (t_rel, hit_i, mix_i, gx, gy, gz, ins_i, act_i,
                     steps, it, pun_pg) = c
                    act = act_i != 0
                    qx = p2x + t_rel * dxc
                    qy = p2y + t_rel * dyc
                    qz = p2z + t_rel * dzc
                    pgx = jnp.floor(qx / PGV).astype(i32)
                    pgy = jnp.floor(qy / PGV).astype(i32)
                    pgz = jnp.floor(qz / PGV).astype(i32)
                    inside = ((pgx >= 0) & (pgx < P) & (pgy >= 0)
                              & (pgy < P) & (pgz >= 0) & (pgz < P))
                    out_now = act & ~inside
                    ins_i = jnp.where(out_now, 0, ins_i)
                    act_i = jnp.where(out_now, 0, act_i)
                    act = act & inside
                    pg = ((jnp.clip(pgx, 0, P - 1) * P
                           + jnp.clip(pgy, 0, P - 1)) * P
                          + jnp.clip(pgz, 0, P - 1))
                    w = jnp.take_along_axis(pocc_row, pg >> 5, axis=1)
                    has = ((w >> (pg & 31)) & 1) != 0
                    # empty page: jump to its exit analytically
                    emp = act & ~has
                    tex = jnp.minimum(jnp.minimum(
                        ((pgx.astype(f32) * PGV
                          + jnp.where(dxc > 0, PGV, f32(0.0))) - p2x)
                        * inv_x,
                        ((pgy.astype(f32) * PGV
                          + jnp.where(dyc > 0, PGV, f32(0.0))) - p2y)
                        * inv_y),
                        ((pgz.astype(f32) * PGV
                          + jnp.where(dzc > 0, PGV, f32(0.0))) - p2z)
                        * inv_z)
                    t_rel = jnp.where(emp, tex + _EXIT_EPS, t_rel)
                    steps = steps + emp.astype(i32)
                    served = jnp.zeros_like(act_i)
                    for j in range(kpage):
                        pj = pages[j]
                        mj = act & has & (pg == pj)

                        def run_j(mj_i, j=j, pj=pj):
                            mj_ = mj_i != 0
                            tab = page_refs[j][0]

                            def rows(lo, n):
                                return [jnp.broadcast_to(
                                    tab[lo + r:lo + r + 1, :], (8, LANES))
                                    for r in range(n)]

                            rows_c = rows(64, 8)
                            rows_b = rows(0, 64)
                            rows_m = rows(72, 64)
                            sc_row = jnp.broadcast_to(tab[136:137, :],
                                                      (8, LANES))

                            def pc(cx, cy, cz):
                                c = (cx * 32 + cy) * 32 + cz
                                word = _fetch(rows_c, c >> 5)
                                return ((word >> (c & 31)) & 1) != 0

                            def pb(cx, cy, cz, mask):
                                del mask
                                c = (cx * 32 + cy) * 32 + cz
                                word = _fetch(rows_b, c >> 2)
                                return (word >> ((c & 3) * 8)) & 0xFF

                            def scp(sx_, sy_, sz_):
                                sbit = (sx_ * 8 + sy_) * 8 + sz_
                                ww = jnp.take_along_axis(sc_row,
                                                         sbit >> 3, axis=1)
                                return (ww >> ((sbit & 7) * 4)) & 0xF

                            pjx = (pj // (P * P)).astype(f32) * PGV
                            pjy = ((pj // P) % P).astype(f32) * PGV
                            pjz = (pj % P).astype(f32) * PGV
                            h, ix, iy, iz, tt, ins, st = _dda_cr(
                                qx - pjx, qy - pjy, qz - pjz, dxc, dyc,
                                dzc, inv_x, inv_y, inv_z, PAGE,
                                f32(1.0) * 32.0, pc, pb, pl0_cap, mj_i,
                                early_exit,
                                sc_probe=scp if sc_skip else None,
                                gate_refine=True)
                            cix = jnp.clip(ix, 0, PAGE - 1)
                            ciy = jnp.clip(iy, 0, PAGE - 1)
                            ciz = jnp.clip(iz, 0, PAGE - 1)
                            cc = ((cix >> 1) * 32 + (ciy >> 1)) * 32 \
                                + (ciz >> 1)
                            word = _fetch(rows_m, cc >> 2)
                            byte = (word >> ((cc & 3) * 8)) & 0xFF
                            bit = (((cix & 1) << 2) | ((ciy & 1) << 1)
                                   | (ciz & 1))
                            mx_ = ((byte >> bit) & 1)
                            return h, ix, iy, iz, tt, ins, st, mx_

                        def skip_j(mj_i):
                            del mj_i
                            return (zi_, zi_, zi_, zi_, zf_, zi_, zi_,
                                    zi_)

                        h, ix, iy, iz, tt, ins, st, mx_ = jax.lax.cond(
                            jnp.any(mj & (pj >= 0)), run_j, skip_j,
                            mj.astype(i32))
                        nh = mj & (h != 0)
                        hit_i = hit_i | nh.astype(i32)
                        mix_i = jnp.where(nh, mx_, mix_i)
                        gx = jnp.where(nh, pgx * PAGE + ix, gx)
                        gy = jnp.where(nh, pgy * PAGE + iy, gy)
                        gz = jnp.where(nh, pgz * PAGE + iz, gz)
                        t_rel = jnp.where(nh, t_rel + tt, t_rel)
                        ex = mj & (h == 0) & (ins == 0)
                        t_rel = jnp.where(ex, t_rel + tt + _EXIT_EPS,
                                          t_rel)
                        stck = mj & (h == 0) & (ins != 0)
                        t_rel = jnp.where(stck, t_rel + tt, t_rel)
                        act_i = jnp.where(nh | stck, 0, act_i)
                        served = served | mj.astype(i32)
                        steps = steps + jnp.where(mj, st, 0)
                    # occupied page with no candidate table: punt as
                    # stuck (position preserved; next round's tables
                    # cover it)
                    pun = act & has & (served == 0)
                    act_i = jnp.where(pun, 0, act_i)
                    pun_pg = jnp.where(pun, pg, pun_pg)
                    return (t_rel, hit_i, mix_i, gx, gy, gz, ins_i,
                            act_i, steps, it + 1, pun_pg)

                c = jax.lax.while_loop(cond, body, c0)
                (t_rel, hit_i, mix_i, gx, gy, gz, ins_i, _a, steps,
                 _it, pun_pg) = c
                return (hit_i, gx, gy, gz, t_rel, ins_i, steps,
                        mix_i != 0, pun_pg)

        ws = G * 32
        zi = jnp.zeros(key0.shape, i32)
        zf = jnp.zeros(key0.shape, f32)

        keyw = key0
        tw = t_ref[:]
        packw = pack_ref[:]
        itw = it_ref[:]

        def crossing(keyw, tw, packw, itw, cand):
            """One {brick DDA, L0 march} pair against candidate bricks
            ``cand`` = [(cell, slot, byte_rows, coarse_bcast), ...]
            (traced scalars + resident bit tables).  Returns the updated
            ray state.

            v4: ONE merged coarse-refine DDA advances every lane whose
            cell is among the candidates; each candidate's DDA is
            cond-gated on its presence scalar (see phase-1 comment)."""
            m_init = keyw == KEY_INIT
            if paged:
                m_init = m_init | ((keyw >= BAND0) & (keyw < KEY_DONE))
            m_brick = (keyw == cand[0][0])
            slot_v = jnp.full(keyw.shape, cand[0][1], i32)
            for j in range(1, len(cand)):
                mj = keyw == cand[j][0]
                m_brick = m_brick | mj
                slot_v = jnp.where(mj, cand[j][1], slot_v)

            # ---- phase 1: per-candidate coarse-refine DDAs ------------
            kcell = (keyw & ((1 << _oct_shift(G)) - 1)
                     if oct_key is not None else keyw)
            kc = jnp.clip(kcell, 0, G * G * G - 1)
            bxv = (kc // (G * G)).astype(f32) * 32.0
            byv = ((kc // G) % G).astype(f32) * 32.0
            bzv = (kc % G).astype(f32) * 32.0
            px = ox + tw * dxc
            py = oy + tw * dyc
            pz = oz + tw * dzc
            lx, ly, lz = px - bxv, py - byv, pz - bzv

            # Phase 1 runs ONE coarse-refine DDA PER CANDIDATE, each
            # whole DDA cond-gated on the crossing-level presence scalar
            # (loop-invariant sreg).  A fully-merged DDA with per-lane
            # candidate selects was tried first and LOST (~2x on
            # coherent primary rounds, .tpu_jobs/120-165): per-step
            # per-candidate conds + the merged refine cost more than the
            # idle-lane waste they avoid, while sequential single-table
            # DDAs keep probes at 1 gather (coarse) / 1 composite fetch
            # (refine) with zero per-step branching.  Incoherent tiles
            # pay the sequential sweep exactly like v3 — coverage, not
            # lane merging, is what v4 actually improved (prediction).
            pres = [jnp.any(keyw == cand[j][0]) for j in range(len(cand))]

            hit1 = zi
            fx, fy, fz = zi, zi, zi
            t1 = zf
            st1 = zi
            for j in range(len(cand)):
                mj = keyw == cand[j][0]

                def probe_coarse_j(cx, cy, cz, rows=cand[j][3]):
                    c = (cx * 16 + cy) * 16 + cz
                    word = jnp.take_along_axis(rows, c >> 5, axis=1)
                    return ((word >> (c & 31)) & 1) != 0

                def probe_byte_j(cx, cy, cz, mask, rows=cand[j][2]):
                    del mask
                    c = (cx * 16 + cy) * 16 + cz
                    word = _fetch(rows, c >> 2)
                    return (word >> ((c & 3) * 8)) & 0xFF

                def run_j(_, mj=mj, pc=probe_coarse_j, pb=probe_byte_j):
                    return _dda_cr(
                        lx, ly, lz, dxc, dyc, dzc, inv_x, inv_y, inv_z,
                        32, f32(1.0), pc, pb, inner_cap, mj.astype(i32),
                        early_exit, gate_refine=False)

                def skip_j(_):
                    return (zi, zi, zi, zi, zf, zi, zi)

                h, x, y, z, tt, _ins, st = jax.lax.cond(
                    pres[j], run_j, skip_j, 0)
                hit1 = jnp.where(mj, h, hit1)
                fx = jnp.where(mj, x, fx)
                fy = jnp.where(mj, y, fy)
                fz = jnp.where(mj, z, fz)
                t1 = jnp.where(mj, tt, t1)
                st1 = st1 + jnp.where(mj, st, 0)
            hit1b = (hit1 != 0) & m_brick

            # ---- phase 2: L0 march to the next occupied brick ------------
            t2_0 = jnp.where(m_init, tw, tw + t1 + _EXIT_EPS)
            p2x = ox + t2_0 * dxc
            p2y = oy + t2_0 * dyc
            p2z = oz + t2_0 * dzc
            act2 = (m_brick & ~hit1b) | m_init
            if paged:
                (hit2, b2x, b2y, b2z, t2, ins2, st2, is_mixed,
                 pun_pg) = _paged_march(p2x, p2y, p2z, act2)
            else:
                # phase-2 refine stays cond-gated at G>32, where the
                # full L0 byte fetch is a 64-row composite — paying it
                # per STEP instead of per stop is the 2048^3 cliff
                hit2, b2x, b2y, b2z, t2, ins2, st2 = _dda_cr(
                    p2x, p2y, p2z, dxc, dyc, dzc, inv_x, inv_y, inv_z,
                    G, f32(32.0), l0_probe_coarse, l0_probe_byte, l0_cap,
                    act2.astype(i32), early_exit,
                    sc_probe=l0_sc_probe if (sc_skip and G >= 8)
                    else None, gate_refine=(G > 32))
            hit2b = hit2 != 0
            ins2b = ins2 != 0
            if not paged:
                c2x = jnp.clip(b2x, 0, G - 1)
                c2y = jnp.clip(b2y, 0, G - 1)
                c2z = jnp.clip(b2z, 0, G - 1)
                if ZW == 1:
                    mxw = _fetch(mx_rows, c2x * G + c2y)
                    is_mixed = ((mxw >> c2z) & 1) != 0
                else:
                    mxw = _fetch(mx_rows,
                                 (c2x * G + c2y) * ZW + (c2z >> 5))
                    is_mixed = ((mxw >> (c2z & 31)) & 1) != 0
            cell2 = (b2x * G + b2y) * G + b2z

            # uniform-solid brick: hit at entry face; voxel from entry
            t_uni = t2_0 + t2
            ux = jnp.clip((p2x + t2 * dxc).astype(i32) - b2x * 32, 0, 31)
            uy = jnp.clip((p2y + t2 * dyc).astype(i32) - b2y * 32, 0, 31)
            uz = jnp.clip((p2z + t2 * dzc).astype(i32) - b2z * 32, 0, 31)

            proc = m_brick | m_init
            u_hit = act2 & hit2b & ~is_mixed
            m_stop = act2 & hit2b & is_mixed
            stuck = act2 & ~hit2b & ins2b   # budget spent inside the grid
            missed = act2 & ~hit2b & ~ins2b

            # packed hit record (module docstring).  G<=32: exact —
            # uniform<<30 | cell<<15 | voxel-in-brick.  G>32 the cell id
            # no longer fits beside widx: mixed hits store the SLOT
            # (decoded via slot_cell); uniform hits store the cell alone
            # and the entry voxel is recomputed from t in _finish.
            widx1 = (fx * 32 + fy) * 32 + fz
            widx2 = (ux * 32 + uy) * 32 + uz
            if G <= 32:
                pack1 = (kc << 15) | widx1
                pack2 = (i32(1) << 30) | (cell2 << 15) | widx2
            elif not paged:
                pack1 = (slot_v << 15) | widx1
                pack2 = (i32(1) << 30) | cell2
            else:
                # slots can exceed 15 bits: mixed hits store the slot
                # alone (bit 29); the voxel is recomputed from t in
                # _finish like the uniform case
                pack1 = (i32(1) << 29) | slot_v
                pack2 = (i32(1) << 30) | cell2

            stuck_key = jnp.full(keyw.shape, KEY_INIT, i32)
            if paged:
                stuck_key = jnp.where(pun_pg >= 0, BAND0 + pun_pg,
                                      stuck_key)
            stop_key = cell2 if oct_key is None else (cell2 | oct_key)
            new_key = jnp.where(
                hit1b | u_hit | missed, KEY_DONE,
                jnp.where(m_stop, stop_key,
                          jnp.where(stuck, stuck_key, keyw)))
            new_t = jnp.where(
                hit1b, tw + t1,
                jnp.where(u_hit, t_uni,
                          jnp.where(m_stop, t2_0 + t2,
                                    jnp.where(stuck, t2_0 + t2 + _EXIT_EPS,
                                              jnp.where(missed, f32(0.0),
                                                        tw)))))
            new_pack = jnp.where(hit1b, pack1,
                                 jnp.where(u_hit, pack2,
                                           jnp.where(missed, PACK_MISS,
                                                     packw)))
            keyw = jnp.where(proc, new_key, keyw)
            tw = jnp.where(proc, new_t, tw)
            packw = jnp.where(proc, new_pack, packw)
            itw = itw + jnp.where(proc, st1 + st2, 0)
            return keyw, tw, packw, itw

        static_cand = [(cells[j], slots[j], occ_rows_j[j], sc_rows_j[j])
                       for j in range(KMAX)]
        for _c in range(cont):
            keyw, tw, packw, itw = crossing(keyw, tw, packw, itw,
                                            static_cand)

        if cloop:
            # candidate-coverage loop: keep crossing while ANY lane's
            # current cell is still among the tile's static candidates
            # (or un-classified).  A lax.while_loop — ONE crossing body
            # regardless of the bound — so a ray crosses as many bricks
            # per sorted round as the candidate set covers, instead of
            # v3's one-crossing-per-round retire-rate ceiling that drove
            # 10-16 round ladders (VERDICT r3 item 1).
            def _cl_cond(c):
                keycl = c[0]
                inc = keycl == KEY_INIT
                for j in range(KMAX):
                    inc = inc | (keycl == cells[j])
                for j in range(len(pages)):
                    inc = inc | (keycl == BAND0 + pages[j])
                return (c[4] < cloop) & jnp.any(inc)

            def _cl_body(c):
                keycl, tcl, pkcl, itcl, n2 = c
                keycl, tcl, pkcl, itcl = crossing(keycl, tcl, pkcl, itcl,
                                                  static_cand)
                give = (keycl != KEY_DONE) & (itcl >= ITER_CAP)
                keycl = jnp.where(give, KEY_DONE, keycl)
                pkcl = jnp.where(give, PACK_MISS, pkcl)
                return keycl, tcl, pkcl, itcl, n2 + 1

            keyw, tw, packw, itw, _ncl = jax.lax.while_loop(
                _cl_cond, _cl_body,
                (keyw, tw, packw, itw, jnp.asarray(0, i32)))

        # ---- dynamic continuation: serve the tile's min pending cell by
        # DMAing its occupancy block in-kernel, so coherent rays cross
        # several bricks per sorted round instead of punting (the static
        # tile candidates only cover the cells known BEFORE the round).
        def _slot_of(cmin):
            """Mixed slot of a voted cell (cmin==KEY_DONE -> junk but
            safe: the candidate is neutered to -1 and matches nothing).
            Octant-composite keys mask down to the cell bits first."""
            if oct_key is not None:
                cmin = cmin & ((1 << _oct_shift(G)) - 1)
            csafe = jnp.clip(cmin, 0, G * G * G - 1)
            if G <= 32:
                return jnp.maximum(bslot_ref[csafe], 0)
            # packed16 decode (sign-extend the 16-bit field)
            w = bslot_ref[csafe >> 1]
            s16 = (w >> ((csafe & 1) * 16)) & 0xFFFF
            return jnp.maximum((s16 ^ 0x8000) - 0x8000, 0)

        def _serve_step(keyw, tw, packw, itw):
            """Vote up to VW DISTINCT pending cells; their occupancy
            (byte-cell) and coarse-bit block DMAs fly concurrently
            (start at vote time, wait at use time) so the per-block
            latency amortizes VW-fold; then one crossing against all VW
            candidates."""
            pend = (keyw >= 0) & (keyw < KEY_DONE)
            votes = []
            mask = pend
            for v in range(VW):
                cmin = jnp.min(jnp.where(mask, keyw, KEY_DONE))
                ccand = jnp.where(cmin < KEY_DONE, cmin, i32(-1))
                slot_dyn = _slot_of(cmin)
                pltpu.make_async_copy(occ_hbm_ref.at[slot_dyn],
                                      scratch_refs[v], dma_sems[v]).start()
                pltpu.make_async_copy(co_hbm_ref.at[slot_dyn],
                                      co_scratch_refs[v],
                                      co_sems[v]).start()
                votes.append((ccand, slot_dyn))
                mask = mask & (keyw > cmin)
            cand = []
            for v, (ccand, slot_dyn) in enumerate(votes):
                pltpu.make_async_copy(occ_hbm_ref.at[slot_dyn],
                                      scratch_refs[v], dma_sems[v]).wait()
                pltpu.make_async_copy(co_hbm_ref.at[slot_dyn],
                                      co_scratch_refs[v],
                                      co_sems[v]).wait()
                cand.append((ccand, slot_dyn,
                             _bcast_rows(scratch_refs[v][:], 8),
                             jnp.broadcast_to(co_scratch_refs[v][:],
                                              (8, LANES))))
            return crossing(keyw, tw, packw, itw, cand)

        for _e in range(extra):
            keyw, tw, packw, itw = _serve_step(keyw, tw, packw, itw)

        if serve:
            # serve loop (module constant DEFAULT_SERVE rationale): keep
            # crossing until the tile is drained or the bound trips.
            # A lax.while_loop, so Mosaic compiles ONE crossing body
            # regardless of the bound (the unrolled ``extra``/``cont``
            # variants measured minutes of compile per step, r2).
            def _serve_cond(c):
                return (c[4] < serve) & jnp.any(c[0] != KEY_DONE)

            def _serve_body(c):
                keyw, tw, packw, itw, srv = c
                keyw, tw, packw, itw = _serve_step(keyw, tw, packw, itw)
                give = (keyw != KEY_DONE) & (itw >= ITER_CAP)
                keyw = jnp.where(give, KEY_DONE, keyw)
                packw = jnp.where(give, PACK_MISS, packw)
                return keyw, tw, packw, itw, srv + 1

            keyw, tw, packw, itw, _srv = jax.lax.while_loop(
                _serve_cond, _serve_body,
                (keyw, tw, packw, itw, jnp.asarray(0, i32)))

        # runaway guard (reference parity: svotrace.comp:41,264-266 —
        # rays past the iteration cap exit the walk as a miss)
        give_up = (keyw != KEY_DONE) & (itw >= ITER_CAP)
        keyw = jnp.where(give_up, KEY_DONE, keyw)
        packw = jnp.where(give_up, PACK_MISS, packw)

        keyo_ref[:] = keyw
        to_ref[:] = tw
        packo_ref[:] = packw
        ito_ref[:] = itw


def _call_kernel(tile_slot, tile_cell, l0_occ, l0_mixed, occ_words,
                 state, G, NM, inner_cap, l0_cap, early_exit, interpret,
                 cont=1, cam=None, cam_dims=None, extra=0, brick_slot=None,
                 sc_words=None, sc_skip=True, l0_sc=None, serve=0,
                 serve_width=1, cloop=0, tile_page=None):
    """Traceable pallas_call wrapper (jitted by _run_kernel / fused into
    round bodies).  ``cam``/(static) ``cam_dims`` select camera mode;
    ``extra``/``serve`` enable the in-kernel dynamic continuation / serve
    loop (both need ``brick_slot``); ``serve_width`` = concurrent block
    DMAs per serve iteration (valid up to G=64 — the packed16 SMEM slot
    map keeps the vote's cell->slot lookup in SMEM at G>32).  G > PAGE
    switches to the PAGED L0 (module constants): ``l0_occ`` is the page-
    occupancy row, ``l0_mixed`` carries the page tables (KPAGE candidate
    blocks per tile via ``tile_page``), and serve/extra are unavailable.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    need_dyn = bool(extra) or bool(serve)
    paged = G > PAGE
    kpage = KPAGE if paged else 0
    if extra:
        assert G <= 32
    if paged:
        assert not need_dyn and tile_page is not None
    if need_dyn:
        assert brick_slot is not None
    if not serve:
        serve_width = 1
    VW = serve_width
    T = tile_slot.shape[0]
    key = state[0]
    B = key.shape[0]
    kern = functools.partial(_wf_kernel, G, NM, inner_cap, l0_cap,
                             early_exit, cont, cam_dims, extra, sc_skip,
                             serve, serve_width, cloop, kpage)
    scalars = ()
    if paged:
        scalars += (tile_page.reshape(-1),)
    if cam_dims is not None:
        scalars += (cam.astype(f32),)
    if need_dyn:
        if G <= 32:
            scalars += (brick_slot,)
        else:
            # two sign-extendable 16-bit slots per SMEM word (kernel
            # _slot_of decode) — raw i32 would be 1 MB at G=64
            ev = brick_slot[0::2] & 0xFFFF
            od = brick_slot[1::2] & 0xFFFF
            scalars += (ev | (od << 16),)
    nsp = 2 + len(scalars)

    ray_spec = pl.BlockSpec((8, LANES), lambda k, *s: (k, 0),
                            memory_space=pltpu.VMEM)

    def occ_spec(j):
        return pl.BlockSpec(
            (1, 8, LANES),
            lambda k, s, *rest, j=j: (jnp.maximum(s[k * KMAX + j], 0), 0, 0),
            memory_space=pltpu.VMEM)

    def sc_spec(j):
        return pl.BlockSpec(
            (1, 1, LANES),
            lambda k, s, *rest, j=j: (jnp.maximum(s[k * KMAX + j], 0), 0, 0),
            memory_space=pltpu.VMEM)

    def page_spec(j):
        # index map args: (grid k, tslot, tcell, tpage, ...)
        return pl.BlockSpec(
            (1, PAGE_ROWS, LANES),
            lambda k, s, c, t, *rest, j=j: (jnp.maximum(t[k * kpage + j],
                                                        0), 0, 0),
            memory_space=pltpu.VMEM)

    n_in_rays = 10 if cam_dims is None else 5

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # l0_occ
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # l0_mixed
                  pl.BlockSpec(memory_space=pltpu.VMEM)]   # l0_sc
        + [occ_spec(j) for j in range(KMAX)]
        + [sc_spec(j) for j in range(KMAX)]
        + [page_spec(j) for j in range(kpage)]
        + ([pl.BlockSpec(memory_space=pl.ANY)] * 2 if need_dyn else [])
        + [ray_spec] * n_in_rays,
        out_specs=tuple([ray_spec] * 4),
        scratch_shapes=(
            ([pltpu.VMEM((8, LANES), i32)] * VW
             + [pltpu.VMEM((1, LANES), i32)] * VW
             + [pltpu.SemaphoreType.DMA] * VW
             + [pltpu.SemaphoreType.DMA] * VW)
            if need_dyn else []),
    )

    def rs(a):
        return a.reshape(B // LANES, LANES)

    if cam_dims is None:
        ins = [rs(a) for a in state[:10]]           # key..it (no rid)
    else:
        ins = [rs(a) for a in state]                # key, t, pack, it, rid

    if paged:
        page_l0 = l0_mixed.reshape(-1, PAGE_ROWS, LANES)
        l0_mixed_op = l0_mixed[:1]   # dummy row; kernel ignores it
        page_ops = (page_l0,) * kpage
    else:
        l0_mixed_op = l0_mixed
        page_ops = ()
    hbm_extra = (occ_words, sc_words) if need_dyn else ()
    outs = pl.pallas_call(
        kern, grid_spec=grid_spec, interpret=interpret,
        out_shape=tuple(
            jax.ShapeDtypeStruct((B // LANES, LANES), dt)
            for dt in (i32, f32, i32, i32)),
    )(tile_slot.reshape(-1), tile_cell.reshape(-1), *scalars,
      l0_occ, l0_mixed_op, l0_sc, *([occ_words] * KMAX),
      *([sc_words] * KMAX), *page_ops, *hbm_extra, *ins)
    key2, t2, pack2, it2 = (a.reshape(-1) for a in outs)
    if cam_dims is None:
        return (key2, state[1], state[2], state[3], state[4], state[5],
                state[6], t2, pack2, it2, state[10])
    return (key2, t2, pack2, it2, state[4])


_run_kernel = functools.partial(jax.jit, static_argnames=(
    "G", "NM", "inner_cap", "l0_cap", "early_exit", "cont",
    "interpret", "cam_dims", "extra", "sc_skip", "serve",
    "serve_width", "cloop"))(_call_kernel)


def _round_body(state, brick_slot, l0_occ, l0_mixed, occ_words,
                opack, ot, oit, halvings, G, NM, inner_cap, l0_cap,
                early_exit, interpret, cont=1, cam=None, cam_dims=None,
                extra=0, sc_words=None, sc_skip=True, l0_sc=None, serve=0,
                serve_width=1, cloop=0):
    """One full wavefront round: sort + tile tables + ``halvings``
    compaction slices (tails harvested) + the kernel.  Traceable; jitted
    as _round_fused for the dynamic loop and inlined into the
    static-schedule trace."""
    srt, tile_slot, tile_cell, tile_page, n_act = _sort_stage(
        state, brick_slot, cam, cam_dims=cam_dims, G=G, predict=PREDICT,
        l0_occ=l0_occ if G > PAGE else None)
    for _ in range(halvings):
        T = tile_slot.shape[0]
        T2 = (T + 1) // 2
        tail = tuple(a[T2 * TILE:] for a in srt)
        srt = tuple(a[:T2 * TILE] for a in srt)
        tile_slot = tile_slot[:T2]
        tile_cell = tile_cell[:T2]
        if tile_page is not None:
            tile_page = tile_page[:T2]
        opack, ot, oit = _harvest(tail[-4], tail[-3], tail[-2],
                                  opack, ot, oit, tail[-1])
    state2 = _call_kernel(tile_slot, tile_cell, l0_occ, l0_mixed, occ_words,
                          srt, G, NM, inner_cap, l0_cap, early_exit,
                          interpret, cont, cam=cam, cam_dims=cam_dims,
                          extra=extra, brick_slot=brick_slot,
                          sc_words=sc_words, sc_skip=sc_skip, l0_sc=l0_sc,
                          serve=serve, serve_width=serve_width, cloop=cloop,
                          tile_page=tile_page)
    return state2, (opack, ot, oit), n_act


_round_fused = functools.partial(jax.jit, static_argnames=(
    "halvings", "G", "NM", "inner_cap", "l0_cap", "early_exit", "cont",
    "interpret", "cam_dims", "extra", "sc_skip", "serve", "serve_width",
    "cloop"), donate_argnums=(0, 5, 6, 7))(_round_body)


# -------------------------------------------------------------------- driver
def _march_candidates(mp, md, cand_flat, G, K, valid, cell=32.0):
    """March each tile's mean ray (mp (T,3) voxel units, md (T,3)) over
    the G^3 candidate-cell grid (edge ``cell`` voxels; mixed cells for
    bricks, occupied pages for the paged L0) and collect the first K
    flagged cells.  Returns (T, K) i32 cells, -1 padded.  ~T-wide
    vectors for <=3G+4 steps — negligible next to the round's sort."""
    T = mp.shape[0]
    eps = _DIR_EPS
    cell = f32(cell)
    d = jnp.where(jnp.abs(md) < eps, jnp.where(md >= 0, eps, -eps), md)
    inv = 1.0 / d
    ix = jnp.clip((mp[:, 0] / cell).astype(i32), 0, G - 1)
    iy = jnp.clip((mp[:, 1] / cell).astype(i32), 0, G - 1)
    iz = jnp.clip((mp[:, 2] / cell).astype(i32), 0, G - 1)
    sx = jnp.where(d[:, 0] > 0, i32(1), i32(-1))
    sy = jnp.where(d[:, 1] > 0, i32(1), i32(-1))
    sz = jnp.where(d[:, 2] > 0, i32(1), i32(-1))
    nx = jnp.where(d[:, 0] > 0, ix + 1, ix).astype(f32) * cell
    ny = jnp.where(d[:, 1] > 0, iy + 1, iy).astype(f32) * cell
    nz = jnp.where(d[:, 2] > 0, iz + 1, iz).astype(f32) * cell
    tx = (nx - mp[:, 0]) * inv[:, 0]
    ty = (ny - mp[:, 1]) * inv[:, 1]
    tz = (nz - mp[:, 2]) * inv[:, 2]
    adx = jnp.abs(inv[:, 0]) * cell
    ady = jnp.abs(inv[:, 1]) * cell
    adz = jnp.abs(inv[:, 2]) * cell
    cand0 = jnp.full((T, K), -1, i32)
    cnt0 = jnp.zeros(T, i32)

    def body(_, c):
        ix, iy, iz, tx, ty, tz, cand, cnt = c
        inside = ((ix >= 0) & (ix < G) & (iy >= 0) & (iy < G)
                  & (iz >= 0) & (iz < G)) & valid
        cell = (jnp.clip(ix, 0, G - 1) * G + jnp.clip(iy, 0, G - 1)) * G \
            + jnp.clip(iz, 0, G - 1)
        occ = (cand_flat[cell] != 0) & inside
        put = occ & (cnt < K)
        sel = put[:, None] & (jnp.arange(K, dtype=i32)[None, :]
                              == cnt[:, None])
        cand = jnp.where(sel, cell[:, None], cand)
        cnt = cnt + put.astype(i32)
        mx = (tx <= ty) & (tx <= tz)
        my = ~mx & (ty <= tz)
        mz = ~mx & ~my
        ix = jnp.where(mx, ix + sx, ix)
        iy = jnp.where(my, iy + sy, iy)
        iz = jnp.where(mz, iz + sz, iz)
        tx = jnp.where(mx, tx + adx, tx)
        ty = jnp.where(my, ty + ady, ty)
        tz = jnp.where(mz, tz + adz, tz)
        return ix, iy, iz, tx, ty, tz, cand, cnt

    c = jax.lax.fori_loop(0, 3 * G + 4, body,
                          (ix, iy, iz, tx, ty, tz, cand0, cnt0))
    return c[6]


def _first_k_unique(cand, K):
    """First K unique non-negative entries per row of ``cand`` (T, M),
    preserving order; -1 padded."""
    M = cand.shape[1]
    validc = cand >= 0
    eq = (cand[:, :, None] == cand[:, None, :]) & validc[:, None, :]
    earlier = jnp.tril(jnp.ones((M, M), bool), -1)
    dup = (eq & earlier[None]).any(axis=1)
    keep = validc & ~dup
    rank = jnp.cumsum(keep.astype(i32), axis=1) - 1
    return jnp.stack([jnp.max(jnp.where(keep & (rank == r), cand, -1),
                              axis=1) for r in range(K)], axis=1)


def _merge_candidates(present, marched, brick_slot):
    """First-KMAX unique union of present tile keys and marched
    predictions (present first — they hold live lanes)."""
    tile_cell = _first_k_unique(jnp.concatenate([present, marched],
                                                axis=1), KMAX)
    ncell = brick_slot.shape[0]
    cell_of = tile_cell & (ncell - 1) if OCT_SORT else tile_cell
    tile_slot = jnp.where(tile_cell >= 0,
                          brick_slot[jnp.clip(cell_of, 0, ncell - 1)], -1)
    return tile_slot, tile_cell


def _page_candidates(tile_cell, mp, md, valid, l0_occ, G, kpage,
                     kt=None):
    """(T, kpage) candidate PAGE ids for the paged L0 (G > 64): pages of
    the tile's PUNTED lanes (page-band keys in the sorted rows ``kt`` —
    these hold live rays, so they come first), pages of the candidate
    cells, the tile's mean position's page, and occupied pages marched
    along the mean ray (covers uniform-brick stops whose cells are not
    mixed candidates)."""
    P = G // PAGE
    n = P * P * P
    band0 = G * G * G
    b = jnp.arange(n, dtype=i32)
    row = l0_occ.reshape(-1)
    pocc_flat = (row[b >> 5] >> (b & 31)) & 1
    cx = tile_cell // (G * G)
    cy = (tile_cell // G) % G
    cz = tile_cell % G
    cpg = jnp.where(tile_cell >= 0,
                    ((cx // PAGE) * P + (cy // PAGE)) * P + (cz // PAGE),
                    -1)
    mpg_x = jnp.clip((mp[:, 0] / f32(PAGE * 32)).astype(i32), 0, P - 1)
    mpg_y = jnp.clip((mp[:, 1] / f32(PAGE * 32)).astype(i32), 0, P - 1)
    mpg_z = jnp.clip((mp[:, 2] / f32(PAGE * 32)).astype(i32), 0, P - 1)
    mpg = jnp.where(valid, (mpg_x * P + mpg_y) * P + mpg_z, -1)[:, None]
    marched = _march_candidates(mp, md, pocc_flat, P, kpage, valid,
                                cell=PAGE * 32.0)
    cand = [mpg, cpg, marched]
    if kt is not None:
        in_band = (kt >= band0) & (kt < KEY_DONE)
        bpg = _first_k_unique(jnp.where(in_band, kt - band0, -1), kpage)
        cand = [bpg] + cand
    return _first_k_unique(jnp.concatenate(cand, axis=1), kpage)


def _cam_rays(rid, cam, cam_dims):
    """Vectorized mirror of the kernel's per-lane camera derivation."""
    W, H, ws_world = cam_dims[:3]
    NBX = cam_dims[3] if len(cam_dims) > 3 else 0
    if NBX:
        bi = rid // 1024
        off = rid - bi * 1024
        by = bi // NBX
        bx = bi - by * NBX
        ly = off // 32
        pyi = by * 32 + ly
        pxi = bx * 32 + (off - ly * 32)
    else:
        pyi = rid // W
        pxi = rid - pyi * W
    pyi = jnp.minimum(pyi, H - 1)  # pad-ray clamp, kernel lock-step
    u = ((pxi.astype(f32) + f32(0.5)) / f32(W))[:, None]
    v = ((pyi.astype(f32) + f32(0.5)) / f32(H))[:, None]
    c = cam[:15].reshape(5, 3)
    left = c[1][None] + (c[2] - c[1])[None] * v
    right = c[3][None] + (c[4] - c[3])[None] * v
    dun = left + (right - left) * u
    d = dun / jnp.linalg.norm(dun, axis=-1, keepdims=True)
    o = jnp.broadcast_to((c[0] - 1.0) * f32(ws_world), d.shape)
    return o, d


def _tile_means(key, pos, dirs):
    """Per-tile mean position/direction over pending-at-cell lanes.
    For bounce tiles the cosine-weighted mean direction approximates
    the shared surface normal — the dominant escape direction — so the
    marched prediction covers the cells most bounce rays traverse."""
    T = key.shape[0] // TILE
    # KEY_INIT lanes count too: under the paged L0 a round-0 ray is
    # stuck-INIT at its first occupied page's boundary, and the mean
    # position is the only signal the page-candidate tables have for it
    w = ((key != KEY_DONE).astype(f32)).reshape(T, TILE)
    sw = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mp = jnp.stack([jnp.sum(pos[:, a].reshape(T, TILE) * w, axis=1) / sw
                    for a in range(3)], axis=1)
    mdu = jnp.stack([jnp.sum(dirs[:, a].reshape(T, TILE) * w, axis=1)
                     for a in range(3)], axis=1)
    nrm = jnp.linalg.norm(mdu, axis=1, keepdims=True)
    md = mdu / jnp.maximum(nrm, 1e-20)
    return mp, md, jnp.sum(w, axis=1) > 0


def _predicted_tables(kt_rows, key_flat, pos, dirs, brick_slot, G,
                      l0_occ=None):
    """Tile tables = present distinct cells ++ cells marched along the
    tile's mean ray (the v4 candidate-prediction: a tile whose lanes
    share one cell otherwise wastes KMAX-1 candidate slots, capping
    cloop at ONE crossing per sorted round).

    The march collects MIXED cells only (brick_slot >= 0): pending keys
    can only ever be mixed cells — uniform-solid bricks retire in-kernel
    during phase 2 — so a predicted slot spent on a uniform brick is
    dead weight that shrinks effective cloop coverage (ADVICE r4)."""
    tile_slot, tile_cell, n_act = _distinct_tables(kt_rows, brick_slot)
    mixed_flat = (brick_slot >= 0).astype(i32)
    mp, md, valid = _tile_means(key_flat, pos, dirs)
    marched = _march_candidates(mp, md, mixed_flat, G, KMAX, valid)
    if OCT_SORT and not (G > PAGE):
        # candidates must match the kernel's composite keys: tag the
        # marched cells with the tile's mean-direction octant (tiles
        # are octant-sorted, so members share it)
        toct = ((md[:, 0] > 0).astype(i32) * 4
                + (md[:, 1] > 0).astype(i32) * 2
                + (md[:, 2] > 0).astype(i32)) << _oct_shift(G)
        marched = jnp.where(marched >= 0, marched | toct[:, None],
                            marched)
    tile_slot, tile_cell = _merge_candidates(tile_cell, marched,
                                             brick_slot)
    if l0_occ is None:
        return tile_slot, tile_cell, None, n_act
    tile_page = _page_candidates(tile_cell, mp, md, valid, l0_occ, G,
                                 KPAGE, kt=kt_rows)
    return tile_slot, tile_cell, tile_page, n_act


@functools.partial(jax.jit, static_argnames=("cam_dims", "G", "predict"))
def _sort_stage(state, brick_slot, cam=None, cam_dims=None, G=None,
                predict=False, l0_occ=None):
    """Sort by key, build tile tables, count actives.  Runs once per
    round at the current (static) size.  Results of finished rays ride
    the sort into the tail and are harvested when compaction slices them
    off (_harvest) — scattering them every round would cost full-size
    random scatters at XLA's ~0.1 G elem/s (measured r2: 80+ ms/round).

    Returns (srt, tile_slot, tile_cell, tile_page, n_act); tile_page is
    None below the paged-L0 threshold (G <= 64) and when ``l0_occ`` —
    the (1,128) page-occupancy row — is not supplied."""
    srt = jax.lax.sort(tuple(state), num_keys=1)
    paged = G is not None and G > PAGE and l0_occ is not None
    key = srt[0]
    if not predict and not paged:
        tile_slot, tile_cell, n_act = _tile_tables(key, brick_slot)
        return srt, tile_slot, tile_cell, None, n_act
    if cam_dims is None:
        _, ox, oy, oz, dx, dy, dz, t = srt[:8]
        pos = jnp.stack([ox + t * dx, oy + t * dy, oz + t * dz], axis=1)
        dirs = jnp.stack([dx, dy, dz], axis=1)
    else:
        o, dirs = _cam_rays(srt[4], cam, cam_dims)
        pos = o + srt[1][:, None] * dirs
    if not predict:
        # pages still need the mean-ray march; candidate cells don't
        tile_slot, tile_cell, n_act = _tile_tables(key, brick_slot)
        mp, md, valid = _tile_means(key, pos, dirs)
        tile_page = _page_candidates(tile_cell, mp, md, valid, l0_occ, G,
                                     KPAGE, kt=key.reshape(-1, TILE))
        return srt, tile_slot, tile_cell, tile_page, n_act
    tile_slot, tile_cell, tile_page, n_act = _predicted_tables(
        key.reshape(-1, TILE), key, pos, dirs, brick_slot, G,
        l0_occ=l0_occ if paged else None)
    return srt, tile_slot, tile_cell, tile_page, n_act


def _distinct_tables(kt, brick_slot):
    """First KMAX distinct pending keys per tile row of ``kt`` (rows
    must be sorted so equal keys are adjacent) + active count.  The
    table entries carry the key VERBATIM (octant-composite under
    OCT_SORT — the kernel compares keys, so candidates must match
    bit-for-bit); only the brick_slot lookup masks down to cell bits.
    Page-band keys (>= G^3, paged L0 punts) are active but are not
    cells — they feed the PAGE tables (_page_candidates) instead."""
    T = kt.shape[0]
    ncell = brick_slot.shape[0]
    limit = (ncell * 8) if OCT_SORT else ncell
    valid = (kt >= 0) & (kt < limit)
    ch = jnp.concatenate(
        [jnp.ones((T, 1), bool), kt[:, 1:] != kt[:, :-1]], axis=1)
    rank = jnp.cumsum((ch & valid).astype(i32), axis=1) - 1
    cells = [jnp.max(jnp.where(valid & (rank == r), kt, -1), axis=1)
             for r in range(KMAX)]
    tile_cell = jnp.stack(cells, axis=1)
    cell_of = tile_cell & (ncell - 1) if OCT_SORT else tile_cell
    tile_slot = jnp.where(tile_cell >= 0,
                          brick_slot[jnp.clip(cell_of, 0, ncell - 1)], -1)
    n_act = jnp.sum((kt != KEY_DONE).astype(i32))
    return tile_slot, tile_cell, n_act


def _tile_tables(key, brick_slot):
    """Tables for the globally-sorted layout (tiles span few runs)."""
    return _distinct_tables(key.reshape(-1, TILE), brick_slot)


@functools.partial(jax.jit, static_argnames=("cam_dims", "G", "predict"))
def _tile_tables_local(key, brick_slot, cam=None, cam_dims=None,
                       state=None, G=None, predict=False, l0_occ=None):
    """Tables for the UNSORTED pixel layout: per-tile sort of the keys
    only (a batched 1024-wide sort, not the multi-operand global sort).
    Exploits primary/bounce-ray coherence — a 32x32-pixel tile's rays
    stop in a handful of bricks — so round 1 skips the full-size
    multi-payload sort; lanes beyond the KMAX candidate cells punt to
    the sorted rounds.  With ``predict`` the unused candidate slots are
    filled by the marched prediction (_predicted_tables)."""
    kt = jnp.sort(key.reshape(-1, TILE), axis=1)
    paged = G is not None and G > PAGE and l0_occ is not None
    if not predict and not paged:
        ts_, tc_, na_ = _distinct_tables(kt, brick_slot)
        return ts_, tc_, None, na_
    if cam_dims is None:
        _, ox, oy, oz, dx, dy, dz, t = state[:8]
        pos = jnp.stack([ox + t * dx, oy + t * dy, oz + t * dz], axis=1)
        dirs = jnp.stack([dx, dy, dz], axis=1)
    else:
        o, dirs = _cam_rays(state[4], cam, cam_dims)
        pos = o + state[1][:, None] * dirs
    if not predict:
        ts_, tc_, na_ = _distinct_tables(kt, brick_slot)
        mp, md, valid = _tile_means(key, pos, dirs)
        tp_ = _page_candidates(tc_, mp, md, valid, l0_occ, G, KPAGE,
                               kt=kt)
        return ts_, tc_, tp_, na_
    return _predicted_tables(kt, key, pos, dirs, brick_slot, G,
                             l0_occ=l0_occ if paged else None)


@functools.partial(jax.jit, donate_argnums=(3, 4, 5))
def _harvest(t, pack, it, opack, ot, oit, rid):
    """Scatter one retired slice's results into the output buffers.
    Shapes are ladder-stable (halving tails), so this compiles once per
    tail size; total scatter work per segment is <= one full B."""
    opack = opack.at[rid].set(pack, mode="drop")
    ot = ot.at[rid].set(t, mode="drop")
    oit = oit.at[rid].set(it, mode="drop")
    return opack, ot, oit


@functools.partial(jax.jit, static_argnames=("ws", "B"))
def _init_state(origins, dirs, active, ws, B):
    o = origins.astype(f32)
    d = dirs.astype(f32)
    ov = (o - 1.0) * f32(ws)
    finite = jnp.all(jnp.isfinite(o) & jnp.isfinite(d), axis=1)
    alive0 = active & finite
    S = -(-B // TILE) * TILE

    def pad(a, fill):
        return jnp.pad(a, (0, S - B), constant_values=fill)

    key = pad(jnp.where(alive0, KEY_INIT, KEY_DONE), KEY_DONE)
    ox = pad(ov[:, 0], 0)
    oy = pad(ov[:, 1], 0)
    oz = pad(ov[:, 2], 0)
    dx = pad(d[:, 0], 1)
    dy = pad(d[:, 1], 1)
    dz = pad(d[:, 2], 1)
    t = jnp.zeros(S, f32)
    pack = pad(jnp.where(alive0, PACK_PEND, PACK_MISS), PACK_MISS)
    it = jnp.zeros(S, i32)
    rid = pad(jnp.arange(B, dtype=i32), B)
    return (key, ox, oy, oz, dx, dy, dz, t, pack, it, rid)


@functools.partial(jax.jit, static_argnames=("B",))
def _init_state_cam(B):
    """Camera-mode initial state: every ray alive, geometry via rid."""
    S = -(-B // TILE) * TILE

    def pad(a, fill):
        return jnp.pad(a, (0, S - B), constant_values=fill)

    key = pad(jnp.full(B, KEY_INIT, i32), KEY_DONE)
    t = jnp.zeros(S, f32)
    pack = pad(jnp.full(B, PACK_PEND, i32), PACK_MISS)
    it = jnp.zeros(S, i32)
    rid = pad(jnp.arange(B, dtype=i32), B)
    return (key, t, pack, it, rid)


def cam16(cam5):
    """Pack the camera uniform (5,3) into the 16 f32 scalars the camera
    -mode kernel prefetches: pos, l1, l2, r1, r2 (Camera.uniform order)."""
    return jnp.pad(jnp.asarray(cam5, f32).reshape(-1), (0, 1))


@functools.partial(jax.jit, static_argnames=("ws", "B", "capacity"))
def _finish(opack, ot, oit, brick_slot, slot_cell, attr_comb, origins, dirs,
            ws, B, capacity):
    pack = opack[:B]
    hit = pack >= 0
    pk = jnp.maximum(pack, 0)
    uni = (pk >> 30) & 1
    G = ws // 32
    t_vox = ot[:B]
    if G <= 32:
        widx = pk & 0x7FFF
        cell = (pk >> 15) & 0x7FFF
        slot = brick_slot[cell]
        vx = (cell // (G * G)) * 32 + widx // 1024
        vy = ((cell // G) % G) * 32 + (widx // 32) % 32
        vz = (cell % G) * 32 + widx % 32
    elif G <= PAGE:
        # mixed: slot<<15 | widx; uniform: 1<<30 | cell (kernel comment)
        widx = pk & 0x7FFF
        slot = (pk >> 15) & 0x7FFF
        cell = jnp.where(uni == 1, pk & ((1 << 30) - 1), slot_cell[slot])
        bx, by, bz = cell // (G * G), (cell // G) % G, cell % G
        ov = (origins.astype(f32) - 1.0) * f32(ws)
        p = ov + t_vox[:, None] * dirs.astype(f32)
        ux = jnp.clip(p[:, 0].astype(i32), bx * 32, bx * 32 + 31)
        uy = jnp.clip(p[:, 1].astype(i32), by * 32, by * 32 + 31)
        uz = jnp.clip(p[:, 2].astype(i32), bz * 32, bz * 32 + 31)
        vx = jnp.where(uni == 1, ux, bx * 32 + widx // 1024)
        vy = jnp.where(uni == 1, uy, by * 32 + (widx // 32) % 32)
        vz = jnp.where(uni == 1, uz, bz * 32 + widx % 32)
    else:
        # PAGED pack: mixed = 1<<29 | slot, uniform = 1<<30 | cell; the
        # hit voxel is recomputed from t for BOTH (kernel pack comment).
        # t is the entry-face distance, so nudge 0.01 voxel along the
        # ray before flooring (then clip to the brick box) — the same
        # contract the uniform recompute at G>32 relies on.
        slot = jnp.clip(pk & ((1 << 29) - 1), 0, capacity - 1)
        cell = jnp.where(uni == 1, pk & ((1 << 30) - 1), slot_cell[slot])
        bx, by, bz = cell // (G * G), (cell // G) % G, cell % G
        ov = (origins.astype(f32) - 1.0) * f32(ws)
        d = dirs.astype(f32)
        p = ov + t_vox[:, None] * d + d * f32(1e-2)
        vx = jnp.clip(p[:, 0].astype(i32), bx * 32, bx * 32 + 31)
        vy = jnp.clip(p[:, 1].astype(i32), by * 32, by * 32 + 31)
        vz = jnp.clip(p[:, 2].astype(i32), bz * 32, bz * 32 + 31)
        widx = ((vx - bx * 32) * 1024 + (vy - by * 32) * 32
                + (vz - bz * 32))
    if attr_comb.ndim == 2:
        # 8192^3-class worlds: attr_comb exceeds int32 addressing
        # (capacity*32768 + G^3 ~ 6.8e9 at n_mixed ~ 190k), so the flat
        # aidx cannot even be FORMED in i32.  prepare() stores such
        # tables 2-D (capacity + G^3/32768, 32768) — reshaping here
        # instead materialized a full 12.7 GB layout-change copy as an
        # HLO temp and OOMed the chip (.tpu_jobs/237).  Gather
        # two-level: row = slot (mixed) / capacity + cell>>15 (uniform),
        # col = within-row half-word — both < 2^31.
        row = jnp.where(uni == 1, i32(capacity) + (cell >> 15), slot)
        col = jnp.where(uni == 1, cell & 32767, widx)
        row = jnp.where(hit, row, 0)
        attr_raw = jnp.where(
            hit, attr_comb[row, jnp.where(hit, col, 0)], 0)
        # node ids (diff-path parameter keys) would overflow too; the
        # differentiable path already rejects paged worlds, so a
        # brick-level id keeps the field well-defined
        aidx = row
    else:
        aidx = jnp.where(uni == 1, i32(capacity) * 32768 + cell,
                         slot * 32768 + widx)
        attr_raw = jnp.where(hit, attr_comb[jnp.where(hit, aidx, 0)], 0)
    if attr_comb.dtype == jnp.int16:
        # half-word decode (_encode_attr16): value(2) | raw(10) | dd(3)
        a = attr_raw.astype(i32) & 0xFFFF
        full_depth = int(np.log2(ws))
        attr = ((a & 3) | (((a >> 2) & 0x3FF) << 8)
                | ((full_depth - ((a >> 12) & 7)) << 24))
        attr = jnp.where(a == 0, 0, attr)
    else:
        attr = attr_raw.astype(i32)
    vx = jnp.where(hit, vx, -1)
    vy = jnp.where(hit, vy, -1)
    vz = jnp.where(hit, vz, -1)
    # node := the attr_comb index — a stable per-voxel id the
    # differentiable path (diff/wave_diff.py) keys parameters by
    return brick_trace.decode_hits(ws, origins.astype(f32), dirs.astype(f32),
                                   hit, attr, vx, vy, vz, t_vox, oit[:B],
                                   node=jnp.where(hit, aidx, -1))


def _resolve_caps(G):
    """(inner_cap, l0_cap) step budgets for the two DDA phases.

    UNITS (v4): both caps — and the steps/it counters behind ITER_CAP
    and the iteration heatmap — count COARSE (2x2x2-fine-cell)
    iterations; refine sub-steps are uncounted.  That is ~2x looser per
    world-unit of distance than v3's fine-step counts (ADVICE r4): keep
    that in mind when tuning caps against v3-era numbers."""
    return 100, 3 * G + 4


def _trace_body(origins, dirs, active, cam, wscene_arrays, schedule, B, G,
                NM, ws, capacity, inner_cap, l0_cap, early_exit, interpret,
                cont, local_round1, cam_dims, min_tiles, extra=0,
                sc_skip=True, serve=0, serve_width=1, serve_local=True,
                serve_bulk=0, cloop=0):
    """The full round ladder as one traceable function (static
    ``schedule`` = per-round halving counts recorded by a dynamic run).
    Returns (HitResult, n_left) — n_left>0 means the replayed schedule
    cut live rays (camera moved too far): caller must fall back."""
    (l0_occ, l0_mixed, brick_slot, occ_words, attr_comb,
     slot_cell, sc_words, l0_sc) = wscene_arrays
    if cam_dims is None:
        state = _init_state(origins, dirs, active, ws, B)
    else:
        state = _init_state_cam(B)
    S = state[0].shape[0]
    opack = jnp.full((B + 1,), PACK_MISS, i32)
    ot = jnp.zeros((B + 1,), f32)
    oit = jnp.zeros((B + 1,), i32)
    none_slot = jnp.full((S // TILE, KMAX), -1, i32)
    none_page = (jnp.full((S // TILE, KPAGE), -1, i32) if G > PAGE
                 else None)
    state = _call_kernel(none_slot, none_slot, l0_occ, l0_mixed, occ_words,
                         state, G, NM, inner_cap, l0_cap, early_exit,
                         interpret, cam=cam, cam_dims=cam_dims,
                         extra=extra, brick_slot=brick_slot,
                         sc_words=sc_words, sc_skip=sc_skip, l0_sc=l0_sc,
                         tile_page=none_page)
    if local_round1:
        tile_slot, tile_cell, tile_page, _n = _tile_tables_local(
            state[0], brick_slot, cam, cam_dims=cam_dims, state=state,
            G=G, predict=PREDICT, l0_occ=l0_occ if G > PAGE else None)
        state = _call_kernel(tile_slot, tile_cell, l0_occ, l0_mixed,
                             occ_words, state, G, NM, inner_cap, l0_cap,
                             early_exit, interpret, cont, cam=cam,
                             cam_dims=cam_dims, extra=extra,
                             brick_slot=brick_slot, sc_words=sc_words,
                             sc_skip=sc_skip, l0_sc=l0_sc,
                             serve=serve if serve_local else 0,
                             serve_width=serve_width, cloop=cloop,
                             tile_page=tile_page)
    for i, h in enumerate(schedule):
        # bulk rounds run static candidates plus a small serve bound
        # (serve_bulk crossings beyond the KMAX candidates); the FINAL
        # round serves unbounded (drains in-kernel), so a replay can
        # never strand rays on per-frame variation (DRAIN_TILES
        # rationale)
        sv = serve if i == len(schedule) - 1 else serve_bulk
        state, bufs, _n = _round_body(
            state, brick_slot, l0_occ, l0_mixed, occ_words, opack, ot, oit,
            h, G, NM, inner_cap, l0_cap, early_exit, interpret, cont,
            cam=cam, cam_dims=cam_dims, extra=extra, sc_words=sc_words,
            sc_skip=sc_skip, l0_sc=l0_sc, serve=sv,
            serve_width=serve_width, cloop=cloop)
        opack, ot, oit = bufs
    opack, ot, oit = _harvest(state[-4], state[-3], state[-2],
                              opack, ot, oit, state[-1])
    n_left = jnp.sum((opack[:B] == PACK_PEND).astype(i32))
    res = _finish(opack, ot, oit, brick_slot, slot_cell, attr_comb,
                  origins, dirs, ws=ws, B=B, capacity=capacity)
    return res, n_left


_trace_static = functools.partial(jax.jit, static_argnames=(
    "schedule", "B", "G", "NM", "ws", "capacity", "inner_cap", "l0_cap",
    "early_exit", "interpret", "cont", "local_round1", "cam_dims",
    "min_tiles", "extra", "sc_skip", "serve", "serve_width",
    "serve_local", "serve_bulk", "cloop"))(_trace_body)


def intersect_wavefront(wscene, origins, dirs, max_depth=None,
                        cone_trace=False, max_iterations=None, active=None,
                        max_rounds=96, interpret=None, early_exit=True,
                        min_tiles=2, cont=None, local_round1=True,
                        defer_sync=True, profile=None, camera=None,
                        schedule=None, schedule_slack=1, extra=None,
                        sc_skip=True, serve=None, serve_width=None,
                        serve_local=True, serve_bulk=0, cloop=None,
                        cam_block=False):
    """Trace (B,3) rays against a WaveScene; returns a HitResult.

    Signature-compatible with brick_trace.intersect_bricks
    (``max_depth``/``cone_trace``/``max_iterations`` accepted for driver
    compatibility; this path always resolves to the finest leaf).

    Dynamic mode (default): the round loop runs on the host with one
    scalar sync per round (``defer_sync`` reads each round's count one
    round late — counts only decrease, so the stale bound is safe for
    compaction — hiding the device->host RTT behind the next round).
    ``profile`` (dict) collects per-round actives AND the compaction
    ``schedule`` for replay; ``schedule_slack`` >1 pads the recorded
    compaction so the replay tolerates per-frame ray variation.

    Static mode (``schedule`` = tuple of per-round halving counts from a
    prior profile): the ENTIRE ladder runs as one jitted dispatch (zero
    per-round host round-trips).  Returns (HitResult, n_left_devicearray)
    — the caller checks n_left == 0 to validate the replay.

    ``camera`` (cam5 array, plus origins/dirs shaped (W*H, 3) in image
    row order) switches the sort payload from 12 to 5 operands: the
    kernel re-derives each primary ray from its rid (camera mode needs
    ``active`` to be None/all-true).  Pass camera=(cam5, W, H).

    ``cont`` = brick crossings attempted per ray per round (kernel
    unroll; >1 did not help on terrain and cont=4 took Mosaic 19 min to
    compile).  ``local_round1`` runs round 1 from pixel-coherent tile
    tables instead of a full sort.
    """
    B = origins.shape[0]
    G = wscene.grid_size
    NM = wscene.capacity   # uniform-attr base in attr_comb
    ws = wscene.world_size
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if extra is None:
        extra = DEFAULT_EXTRA if G <= 32 else 0
    if serve is None:
        serve = DEFAULT_SERVE
    if serve_width is None:
        serve_width = DEFAULT_SERVE_WIDTH
    if cloop is None:
        cloop = DEFAULT_CLOOP
    if G > PAGE:
        # paged L0: no in-kernel serve/extra (the SMEM cell->slot map
        # does not scale past G=64 — module paged-L0 notes); drains run
        # by ladder + candidate coverage with recorded tail rounds
        assert not OCT_SORT, "OCT_SORT keys collide with page-band keys"
        serve = 0
        extra = 0
        serve_bulk = 0
    if cont is None:
        # the coverage loop subsumes the unrolled crossing (its first
        # iteration IS the cont=1 crossing); compiling both would double
        # the kernel body for nothing
        cont = 0 if cloop else 1
    inner_cap, l0_cap = _resolve_caps(G)

    cam = None
    cam_dims = None
    if camera is not None:
        cam5, W, H = camera
        assert active is None, "camera mode traces every pixel"
        cam = cam16(cam5)
        if cam_block:
            # block-major frame (render_wave._frame_rays): rid indexes
            # 32x32-pixel blocks; B covers the 32-padded height
            Hp = -(-H // 32) * 32
            assert W % 32 == 0 and W * Hp == B, (W, H, B)
            cam_dims = (W, H, ws, W // 32)
        else:
            assert W * H == B, (W, H, B)
            cam_dims = (W, H, ws)

    if active is None:
        active = jnp.ones(B, bool)
    else:
        active = active.astype(bool)

    warrays = (wscene.l0_occ, wscene.l0_mixed, wscene.brick_slot,
               wscene.occ_words, wscene.attr_comb, wscene.slot_cell,
               wscene.sc_words, wscene.l0_sc)

    if schedule is not None:
        res, n_left = _trace_static(
            origins, dirs, active, cam, warrays, schedule=tuple(schedule),
            B=B, G=G, NM=NM, ws=ws, capacity=wscene.capacity,
            inner_cap=inner_cap, l0_cap=l0_cap, early_exit=early_exit,
            interpret=interpret, cont=cont, local_round1=local_round1,
            cam_dims=cam_dims, min_tiles=min_tiles, extra=extra,
            sc_skip=sc_skip, serve=serve, serve_width=serve_width,
            serve_local=serve_local, serve_bulk=serve_bulk, cloop=cloop)
        return res, n_left

    # ---------------- dynamic round loop (schedule discovery) ----------
    if cam_dims is None:
        state = _init_state(origins, dirs, active, ws, B)
    else:
        state = _init_state_cam(B)
    S = state[0].shape[0]
    opack = jnp.full((B + 1,), PACK_MISS, i32)
    ot = jnp.zeros((B + 1,), f32)
    oit = jnp.zeros((B + 1,), i32)

    # round 0: all rays are KEY_INIT -> pure L0 march, no binning needed
    # (cont=1 explicitly: in cloop mode the ladder rounds run cont=0,
    # but round 0 must still execute its one classify crossing — and
    # matching the static path's round-0 config keeps the jit cache hot)
    none_slot = jnp.full((S // TILE, KMAX), -1, i32)
    none_page = (jnp.full((S // TILE, KPAGE), -1, i32) if G > PAGE
                 else None)
    state = _run_kernel(none_slot, none_slot, wscene.l0_occ,
                        wscene.l0_mixed, wscene.occ_words, state, G=G,
                        NM=NM, inner_cap=inner_cap, l0_cap=l0_cap,
                        early_exit=early_exit, interpret=interpret,
                        cont=1, cam=cam, cam_dims=cam_dims, extra=extra,
                        brick_slot=wscene.brick_slot,
                        sc_words=wscene.sc_words, sc_skip=sc_skip,
                        l0_sc=wscene.l0_sc, tile_page=none_page)
    if profile is not None:
        profile.setdefault("rounds", []).append(
            dict(r=0, size=S, active=int(jnp.sum(state[0] != KEY_DONE))))

    if local_round1:
        # round 1 without the global sort: pixel-coherent tile tables
        tile_slot, tile_cell, tile_page, _n = _tile_tables_local(
            state[0], wscene.brick_slot, cam, cam_dims=cam_dims,
            state=state, G=G, predict=PREDICT,
            l0_occ=wscene.l0_occ if G > PAGE else None)
        state = _run_kernel(tile_slot, tile_cell, wscene.l0_occ,
                            wscene.l0_mixed, wscene.occ_words, state, G=G,
                            NM=NM, inner_cap=inner_cap, l0_cap=l0_cap,
                            early_exit=early_exit, interpret=interpret,
                            cont=cont, cam=cam, cam_dims=cam_dims,
                            extra=extra, brick_slot=wscene.brick_slot,
                            sc_words=wscene.sc_words, sc_skip=sc_skip,
                            l0_sc=wscene.l0_sc,
                            serve=serve if serve_local else 0,
                            serve_width=serve_width, cloop=cloop,
                            tile_page=tile_page)
        if profile is not None:
            profile["rounds"].append(
                dict(r="1L", size=S,
                     active=int(jnp.sum(state[0] != KEY_DONE))))

    rec_schedule = []
    # with the serve loop the local round usually drains EVERYTHING —
    # check before paying for a full-size sorted round (one ms-scale
    # scalar sync; the ladder then starts only if rays actually punted)
    pending = (jnp.sum((state[0] != KEY_DONE).astype(i32))
               if (serve and serve_local and local_round1) else None)
    stall = 0
    prev_n = None
    for r in range(1, max_rounds + 1):
        # block on the PREVIOUS round's count (already computed — near-
        # zero wait); it upper-bounds the current actives
        n = int(pending) if pending is not None else S
        if n == 0:
            break
        # serve=0 has no in-kernel drain: a livelocked tiny residue
        # (sub-ulp DDA steps) would otherwise run the ladder to
        # max_rounds at full sort cost — retire it as misses like the
        # serve path's ITER_CAP giveup does (ADVICE r3)
        if not serve:
            if prev_n == n and n <= TILE:
                stall += 1
                if stall >= 6:
                    break
            else:
                stall = 0
            prev_n = n
        # static halving count for this round's fused dispatch;
        # schedule_slack>1 under-compacts so a replay tolerates variation
        T = state[0].shape[0] // TILE
        floor_t = max(-(-(n * schedule_slack) // TILE), min_tiles)
        halvings = 0
        while (T + 1) // 2 >= floor_t and T > min_tiles:
            T = (T + 1) // 2
            halvings += 1
        # bulk rounds: static candidates only; once the active set fits
        # DRAIN_TILES tiles, serve the tail in-kernel (DRAIN_TILES
        # rationale at the constant)
        drain = bool(serve) and n <= DRAIN_TILES * TILE
        state, bufs, n_act = _round_fused(
            state, wscene.brick_slot, wscene.l0_occ, wscene.l0_mixed,
            wscene.occ_words, opack, ot, oit, halvings=halvings,
            G=G, NM=NM, inner_cap=inner_cap, l0_cap=l0_cap,
            early_exit=early_exit, interpret=interpret, cont=cont,
            cam=cam, cam_dims=cam_dims, extra=extra,
            sc_words=wscene.sc_words, sc_skip=sc_skip,
            l0_sc=wscene.l0_sc, serve=serve if drain else serve_bulk,
            serve_width=serve_width, cloop=cloop)
        opack, ot, oit = bufs
        rec_schedule.append(halvings)
        pending = n_act
        if not defer_sync:
            pending = jnp.asarray(int(n_act), i32)  # sync now
        if profile is not None:
            profile["rounds"].append(dict(r=r, size=state[0].shape[0],
                                          active=int(n_act), bound=n))

    opack, ot, oit = _harvest(state[-4], state[-3], state[-2],
                              opack, ot, oit, state[-1])
    if profile is not None:
        # Without the serve loop, extra zero-halving tail rounds absorb
        # per-frame round-count variation (bounce RNG shifts it 1-3
        # rounds; a stale replay costs a ~230 s re-record, .tpu_jobs/061).
        # WITH serve, each round drains its tiles completely — variation
        # is absorbed inside the kernel, and a full-size tail round is
        # pure waste (3 x 25 ms 2M-ray sorts measured in 083's 547 ms
        # primary frame).  Stragglers still surface via n_left and fall
        # back to dynamic re-record.
        profile["schedule"] = (tuple(rec_schedule) if serve
                               else tuple(rec_schedule) + (0, 0, 0))
    return _finish(opack, ot, oit, wscene.brick_slot, wscene.slot_cell,
                   wscene.attr_comb, origins, dirs, ws=ws, B=B,
                   capacity=wscene.capacity)
