"""Brick-wavefront traversal — production Pallas TPU path.

Same semantics as ops/brick_trace.py (the pure-XLA reference of the
reference's octree walk, svotrace.comp:211-432), restructured so the hot
loop never touches HBM:

  * Rays are binned by mixed-brick id each round (tile-aligned scatter:
    every (8,128) ray tile holds rays of ONE brick), so one grid step
    processes one brick group.
  * The brick's occupancy bits (one (8,128) i32 block) and per-voxel
    attribute words ((256,128) i32) are *pipelined* HBM->VMEM by the
    BlockSpec index maps from the scalar-prefetched per-tile slot ids —
    Mosaic double-buffers the DMA and skips it entirely when consecutive
    tiles use the same brick.  A dependent DMA costs ~48 us on this chip
    (.bench_cache/pallas_prims.jsonl p8), so the pipeline is mandatory.
  * Word fetches use the composite lane-gather (ops/brick_dda.py): the
    only random-access primitive Mosaic lowers (sublane-gather forms are
    rejected — measured, pallas_prims.jsonl p1a/p1b).
  * After the in-brick voxel DDA, surviving rays march the L0 brick grid
    (resident (8,128) table) to their next occupied brick in the same
    kernel, so one launch per wavefront round.

The round loop, binning, and uniform-brick resolution are plain XLA in
one ``lax.while_loop`` — the whole traversal is a single jitted program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import brick_trace

f32 = jnp.float32
i32 = jnp.int32

LANES = 128
TILE = 8 * LANES          # rays per grid step (one (8,128) f32 block)
_EXIT_EPS = np.float32(1e-2)  # voxel-unit nudge across brick boundaries

# kernel ray status codes
_ST_NONE = 0   # inactive / padding / overflow (state unchanged)
_ST_HIT = 1    # hit a solid voxel inside the tile's brick
_ST_STOP = 2   # stopped at an L0 cell (occupied, or march budget spent)
_ST_MISS = 3   # exited the world


def _fetch(rows, w):
    """Composite fetch: value of word ``w`` (8,128 i32) from a VMEM table
    held as ``rows`` (list of (8,128) sublane-broadcast row vregs)."""
    lane = w & (LANES - 1)
    r = w >> 7
    out = jnp.take_along_axis(rows[0], lane, axis=1)
    for k in range(1, len(rows)):
        out = jnp.where(r == k, jnp.take_along_axis(rows[k], lane, axis=1),
                        out)
    return out


def _bcast_rows(ref, n):
    return [jnp.broadcast_to(ref[r:r + 1, :], (8, LANES)) for r in range(n)]


def _dda_vec(px, py, pz, dxc, dyc, dzc, inv_x, inv_y, inv_z, n, cell,
             probe, max_steps, act0):
    """Masked DDA over an n^3 grid of ``cell``-edge cells in [0, n*cell]^3.

    All args (8,128) vectors; act0 i32.  Returns i32/f32 vectors:
    (hit_i, ix, iy, iz, t, inside_i, steps) with the same conventions as
    brick_trace._march (t = entry of hit cell / last crossing).
    Loop carries are i32/f32 only — Mosaic cannot legalize vector<i1>
    block arguments (measured; see ops/brick_dda.py).
    """
    gf = f32(n * cell)
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

    ix = jnp.clip((qx / cell).astype(i32), 0, n - 1)
    iy = jnp.clip((qy / cell).astype(i32), 0, n - 1)
    iz = jnp.clip((qz / cell).astype(i32), 0, n - 1)
    sx = jnp.where(dxc > 0, i32(1), i32(-1))
    sy = jnp.where(dyc > 0, i32(1), i32(-1))
    sz = jnp.where(dzc > 0, i32(1), i32(-1))
    nx = jnp.where(dxc > 0, ix + 1, ix).astype(f32) * cell
    ny = jnp.where(dyc > 0, iy + 1, iy).astype(f32) * cell
    nz = jnp.where(dzc > 0, iz + 1, iz).astype(f32) * cell
    tx = push + (nx - qx) * inv_x
    ty = push + (ny - qy) * inv_y
    tz = push + (nz - qz) * inv_z
    adx = jnp.abs(inv_x) * cell
    ady = jnp.abs(inv_y) * cell
    adz = jnp.abs(inv_z) * cell

    alive0 = (act0 != 0) & ~misses_box
    alive0_i = alive0.astype(i32)
    t_init = jnp.where(alive0, push, 0.0)

    def body(_, c):
        ix, iy, iz, tx, ty, tz, hit_i, t, steps = c
        inside = ((ix >= 0) & (ix < n) & (iy >= 0) & (iy < n)
                  & (iz >= 0) & (iz < n))
        act = (alive0_i != 0) & inside & (hit_i == 0)
        cx = jnp.clip(ix, 0, n - 1)
        cy = jnp.clip(iy, 0, n - 1)
        cz = jnp.clip(iz, 0, n - 1)
        solid = probe(cx, cy, cz)
        new_hit = act & solid
        hit_i = hit_i | new_hit.astype(i32)
        act = act & ~new_hit
        steps = steps + act.astype(i32)
        mx = (tx <= ty) & (tx <= tz)
        my = ~mx & (ty <= tz)
        mz = ~mx & ~my
        tcur = jnp.minimum(jnp.minimum(tx, ty), tz)
        t = jnp.where(act, tcur, t)
        ix = jnp.where(act & mx, ix + sx, ix)
        iy = jnp.where(act & my, iy + sy, iy)
        iz = jnp.where(act & mz, iz + sz, iz)
        tx = jnp.where(act & mx, tx + adx, tx)
        ty = jnp.where(act & my, ty + ady, ty)
        tz = jnp.where(act & mz, tz + adz, tz)
        return (ix, iy, iz, tx, ty, tz, hit_i, t, steps)

    zi = jnp.zeros(px.shape, i32)
    c = (ix, iy, iz, tx, ty, tz, zi, t_init, zi)
    c = jax.lax.fori_loop(0, max_steps, body, c)
    ix, iy, iz, tx, ty, tz, hit_i, t, steps = c
    inside_i = (((ix >= 0) & (ix < n) & (iy >= 0) & (iy < n)
                 & (iz >= 0) & (iz < n)) & ~misses_box).astype(i32)
    return hit_i, ix, iy, iz, t, inside_i, steps


def _round_kernel(G, inner_steps, l0_steps, resolve_attr,
                  tslot_ref, tcell_ref,
                  l0_ref, occ_ref, attr_ref,
                  px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, act_ref,
                  status_ref, t_ref, vox_ref, attr_out_ref, steps_ref):
    """One wavefront round for one ray tile (see module docstring)."""
    import jax.experimental.pallas as pl  # local: keeps module CPU-importable

    k = pl.program_id(0)
    slot = tslot_ref[k]
    cellp = tcell_ref[k]
    # defaults: padding / inactive rays report status NONE
    status_ref[:] = jnp.zeros((8, LANES), i32)
    t_ref[:] = jnp.zeros((8, LANES), f32)
    vox_ref[:] = jnp.zeros((8, LANES), i32)
    attr_out_ref[:] = jnp.zeros((8, LANES), i32)
    steps_ref[:] = jnp.zeros((8, LANES), i32)

    @pl.when(jnp.any(act_ref[:] != 0))
    def _tile():
        act = act_ref[:]
        px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        # 1e-4, lock-step with wavefront._DIR_EPS / brick_trace._clamp_dir
        # (the r2 near-axis livelock rationale there): this v1 engine is
        # superseded by ops/wavefront.py but stays contract-tested, so it
        # must clamp identically to its brick_trace oracle
        eps = np.float32(1e-4)
        dxc = jnp.where(jnp.abs(dx) < eps, jnp.where(dx >= 0, eps, -eps), dx)
        dyc = jnp.where(jnp.abs(dy) < eps, jnp.where(dy >= 0, eps, -eps), dy)
        dzc = jnp.where(jnp.abs(dz) < eps, jnp.where(dz >= 0, eps, -eps), dz)
        inv_x, inv_y, inv_z = 1.0 / dxc, 1.0 / dyc, 1.0 / dzc

        bx = (cellp // (G * G)).astype(f32) * 32.0
        by = ((cellp // G) % G).astype(f32) * 32.0
        bz = (cellp % G).astype(f32) * 32.0

        # ---- phase 1: voxel DDA inside this tile's brick ----------------
        def run_phase1(_):
            occ_rows = _bcast_rows(occ_ref[0], 8)

            def occ_probe(cx, cy, cz):
                word = _fetch(occ_rows, cx * 32 + cy)
                return ((word >> cz) & 1) != 0

            lx = px - bx
            ly = py - by
            lz = pz - bz
            return _dda_vec(lx, ly, lz, dxc, dyc, dzc, inv_x, inv_y, inv_z,
                            32, f32(1.0), occ_probe, inner_steps, act)

        def skip_phase1(_):
            zi = jnp.zeros((8, LANES), i32)
            zf = jnp.zeros((8, LANES), f32)
            return (zi, zi, zi, zi, zf, zi, zi)

        hit1, fx, fy, fz, t1, _ins1, st1 = jax.lax.cond(
            slot >= 0, run_phase1, skip_phase1, 0)
        hit1b = hit1 != 0

        widx = (fx * 32 + fy) * 32 + fz

        # ---- phase 2: L0 march to the next occupied brick ----------------
        t2_0 = jnp.where(slot >= 0, t1 + _EXIT_EPS, f32(0.0))
        p2x = px + t2_0 * dxc
        p2y = py + t2_0 * dyc
        p2z = pz + t2_0 * dzc
        act2 = (act != 0) & ~hit1b
        l0_rows = _bcast_rows(l0_ref, l0_ref.shape[0])

        def l0_probe(cx, cy, cz):
            word = _fetch(l0_rows, cx * G + cy)
            return ((word >> cz) & 1) != 0

        hit2, b2x, b2y, b2z, t2, ins2, st2 = _dda_vec(
            p2x, p2y, p2z, dxc, dyc, dzc, inv_x, inv_y, inv_z,
            G, f32(32.0), l0_probe, l0_steps, act2.astype(i32))
        hit2b = hit2 != 0
        ins2b = ins2 != 0

        cell2 = (b2x * G + b2y) * G + b2z

        status = jnp.where(act != 0,
                           jnp.where(hit1b, i32(_ST_HIT),
                                     jnp.where(hit2b | ins2b, i32(_ST_STOP),
                                               i32(_ST_MISS))),
                           i32(_ST_NONE))
        t_out = jnp.where(hit1b, t1, t2_0 + t2)
        vox = jnp.where(hit1b, widx, cell2)
        status_ref[:] = status
        t_ref[:] = t_out
        vox_ref[:] = vox
        steps_ref[:] = st1 + st2

        if resolve_attr:
            @pl.when(jnp.any(hit1b))
            def _attrs():
                attr_rows = _bcast_rows(attr_ref[0], 256)
                attr_out_ref[:] = jnp.where(
                    hit1b, _fetch(attr_rows, widx), 0)


def _run_round_kernel(tile_slot, tile_cell, l0_table, occ_words, attrs,
                      px, py, pz, dx, dy, dz, act, G, inner_steps,
                      l0_steps, resolve_attr, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = tile_slot.shape[0]
    kern = functools.partial(_round_kernel, G, inner_steps, l0_steps,
                             resolve_attr)
    ray_spec = pl.BlockSpec((8, LANES), lambda k, s, c: (k, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                  # l0
            pl.BlockSpec((1, 8, LANES),
                         lambda k, s, c: (jnp.maximum(s[k], 0), 0, 0),
                         memory_space=pltpu.VMEM),                  # occ
            pl.BlockSpec((1, 256, LANES),
                         lambda k, s, c: (jnp.maximum(s[k], 0), 0, 0),
                         memory_space=pltpu.VMEM),                  # attr
        ] + [ray_spec] * 7,
        out_specs=tuple([ray_spec] * 5),
    )
    outs = pl.pallas_call(
        kern, grid_spec=grid_spec, interpret=interpret,
        out_shape=tuple(
            jax.ShapeDtypeStruct((T * 8, LANES), dt)
            for dt in (jnp.int32, jnp.float32, jnp.int32, jnp.int32,
                       jnp.int32)),
    )(tile_slot, tile_cell, l0_table, occ_words, attrs,
      px, py, pz, dx, dy, dz, act)
    return outs


@functools.partial(jax.jit, static_argnames=(
    "ws", "G", "n_mixed", "max_rounds", "slack", "interpret",
    "resolve_attr"))
def _intersect_impl(l0_table, slot_map, brick_attr, occ_words, attrs,
                    origins, dirs, active, ws, G, n_mixed, max_rounds,
                    slack, interpret, resolve_attr):
    B = origins.shape[0]
    o = origins.astype(f32)
    d = dirs.astype(f32)
    ov = (o - 1.0) * f32(ws)
    ox, oy, oz = ov[:, 0], ov[:, 1], ov[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    finite = jnp.all(jnp.isfinite(o) & jnp.isfinite(d), axis=1)
    alive0 = active & finite

    S = (B + slack + TILE - 1) // TILE * TILE
    T = S // TILE
    NM = max(n_mixed, 1)

    def round_body(state):
        (t_tot, alive, slot, cell, hit, h_attr, h_vox, t_hit, iters,
         rnd) = state

        # ---- binning: tile-aligned scatter into the padded layout -------
        # bucket: mixed-brick slot, NM = L0-march rays, NM+1 = inactive
        key = jnp.where(alive, jnp.where(slot >= 0, slot, NM), NM + 1)
        counts = jnp.bincount(key, length=NM + 2)
        pc = (counts + TILE - 1) // TILE * TILE
        base_pad = jnp.concatenate([jnp.zeros(1, counts.dtype),
                                    jnp.cumsum(pc)])[:-1]
        base_raw = jnp.concatenate([jnp.zeros(1, counts.dtype),
                                    jnp.cumsum(counts)])[:-1]
        order = jnp.argsort(key)
        key_s = key[order]
        rank = jnp.arange(B) - base_raw[key_s]
        dest = base_pad[key_s] + rank
        dest = jnp.where(key_s >= NM + 1, S, dest)  # inactive -> dropped
        dest = jnp.where(dest >= S, S, dest).astype(i32)  # overflow punts

        px = ox + t_tot * dx
        py = oy + t_tot * dy
        pz = oz + t_tot * dz

        def scat(v, dtype=f32, fill=0):
            buf = jnp.full((S,), fill, dtype)
            return buf.at[dest].set(v[order].astype(dtype), mode="drop")

        p_px = scat(px)
        p_py = scat(py)
        p_pz = scat(pz)
        p_dx = scat(dx)
        p_dy = scat(dy)
        p_dz = scat(dz)
        p_act = scat(alive, i32)
        p_slot = scat(jnp.where(slot >= 0, slot, -1), i32, fill=-1)
        p_cell = scat(cell, i32)
        p_rid = scat(jnp.arange(B), i32, fill=-1)

        tile_slot = p_slot.reshape(T, TILE)[:, 0]
        tile_cell = p_cell.reshape(T, TILE)[:, 0]

        def rs(a):
            return a.reshape(T * 8, LANES)

        status_p, t_p, vox_p, attr_p, steps_p = _run_round_kernel(
            tile_slot, tile_cell, l0_table, occ_words, attrs,
            rs(p_px), rs(p_py), rs(p_pz), rs(p_dx), rs(p_dy), rs(p_dz),
            rs(p_act), G, 100, 3 * G + 4, resolve_attr, interpret)

        # ---- map results back to ray order -------------------------------
        rid = p_rid
        valid = rid >= 0
        ridc = jnp.where(valid, rid, B)

        def unscat(v, dtype, fill=0):
            buf = jnp.full((B + 1,), fill, dtype)
            return buf.at[ridc].set(
                jnp.where(valid, v.reshape(-1), fill), mode="drop")[:B]

        r_status = unscat(status_p.reshape(-1), i32)
        r_t = unscat(t_p.reshape(-1), f32)
        r_vox = unscat(vox_p.reshape(-1), i32)
        r_attr = unscat(attr_p.reshape(-1), i32)
        r_steps = unscat(steps_p.reshape(-1), i32)

        iters = iters + r_steps

        # HIT inside a mixed brick
        is_hit = alive & (r_status == _ST_HIT)
        lx, ly, lz = (r_vox // 1024), (r_vox // 32) % 32, r_vox % 32
        gcx = (cell // (G * G)) * 32 + lx
        gcy = ((cell // G) % G) * 32 + ly
        gcz = (cell % G) * 32 + lz
        gvox = (gcx * ws + gcy) * ws + gcz
        hit = hit | is_hit
        h_attr = jnp.where(is_hit, r_attr, h_attr)
        h_vox = jnp.where(is_hit, gvox, h_vox)
        t_hit = jnp.where(is_hit, t_tot + r_t, t_hit)

        # MISS: exited the world
        is_miss = alive & (r_status == _ST_MISS)

        # STOP: advanced to an L0 cell — classify it
        is_stop = alive & (r_status == _ST_STOP)
        cell2 = jnp.clip(r_vox, 0, G * G * G - 1)
        s2 = slot_map[cell2]
        uattr = brick_attr[cell2]
        uni_solid = is_stop & (s2 < 0) & ((uattr & 0xFF) != 0)
        # uniform-solid brick: hit at entry face; entry voxel from position
        exv = jnp.clip((px + r_t * dx).astype(i32), (cell2 // (G * G)) * 32,
                       (cell2 // (G * G)) * 32 + 31)
        eyv = jnp.clip((py + r_t * dy).astype(i32),
                       ((cell2 // G) % G) * 32, ((cell2 // G) % G) * 32 + 31)
        ezv = jnp.clip((pz + r_t * dz).astype(i32), (cell2 % G) * 32,
                       (cell2 % G) * 32 + 31)
        hit = hit | uni_solid
        h_attr = jnp.where(uni_solid, uattr, h_attr)
        h_vox = jnp.where(uni_solid, (exv * ws + eyv) * ws + ezv, h_vox)
        t_hit = jnp.where(uni_solid, t_tot + r_t, t_hit)

        cont = is_stop & ~uni_solid
        slot = jnp.where(cont, jnp.where(s2 >= 0, s2, -1), slot)
        cell = jnp.where(cont, cell2, cell)
        t_tot = jnp.where(cont, t_tot + r_t, t_tot)

        alive = alive & ~is_hit & ~is_miss & ~uni_solid
        # overflow/punted rays (status NONE while alive) stay unchanged
        return (t_tot, alive, slot, cell, hit, h_attr, h_vox, t_hit, iters,
                rnd + 1)

    def cond(state):
        return jnp.any(state[1]) & (state[9] < max_rounds)

    zi = jnp.zeros(B, i32)
    state = (jnp.zeros(B, f32), alive0, jnp.full(B, -1, i32), zi,
             jnp.zeros(B, bool), zi, zi, jnp.zeros(B, f32), zi,
             jnp.asarray(0, i32))
    state = jax.lax.while_loop(cond, round_body, state)
    (_, _, _, _, hit, h_attr, h_vox, t_hit, iters, _) = state

    hvx = h_vox // (ws * ws)
    hvy = (h_vox // ws) % ws
    hvz = h_vox % ws
    return brick_trace.decode_hits(ws, o, d, hit, h_attr, hvx, hvy, hvz,
                                   t_hit, iters)


def intersect_bricks_tpu(scene, origins, dirs, max_depth=None,
                         cone_trace=False, max_iterations=None, active=None,
                         max_rounds=24, slack=None, interpret=None,
                         resolve_attr=True):
    """Pallas brick-wavefront trace; signature-compatible with
    brick_trace.intersect_bricks.  ``slack`` bounds the binning padding
    (overflowing groups punt to the next round)."""
    B = origins.shape[0]
    if scene.grid_size > 32:
        raise ValueError("brick-wavefront L0 grid is limited to 32^3 "
                         f"(world <= 1024^3); got G={scene.grid_size}")
    if active is None:
        active = jnp.ones(B, bool)
    else:
        active = active.astype(bool)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if slack is None:
        slack = max(TILE, B // 2)
    return _intersect_impl(
        scene.l0_table, scene.brick_slot, scene.brick_attr,
        scene.occ_words, scene.attrs.reshape(scene.occ_words.shape[0], 256,
                                             LANES),
        origins, dirs, active, scene.world_size, scene.grid_size,
        scene.n_mixed, max_rounds, slack, bool(interpret),
        bool(resolve_attr))
