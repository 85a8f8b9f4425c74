"""Frame rendering through the wavefront engine (ops/wavefront.py).

The per-frame dispatch of the reference (Main.java:257-288: set uniforms,
dispatch svotrace over the pixel grid, render modes 0-3 in
svotrace.comp:435-646) re-expressed around the sorted brick-wavefront
traversal:

  * the traversal itself is host-driven (compaction syncs), so the frame
    cannot be one jitted function like shade.render_image;
  * ALL shading math between traversal segments is packed into a few
    jitted stage functions — eager jnp ops dispatch one tunnel round-trip
    each on the axon TPU (measured: .tpu_jobs/041_timing.out p3), so the
    eager path of shade.shade_gi would dominate the frame;
  * no beam prepass: the wavefront's in-kernel L0 march already gives
    every ray the empty-space skip the beam kernel (svobeam.comp) exists
    to provide, at finer granularity and zero extra dispatches.

Shading semantics are identical to ops/shade.py (same helpers), so the
render modes match the ESVO path pixel-for-pixel up to traversal FP slop
(tests/test_render_wave.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import constants as C
from . import rng, shade, wavefront

f32 = jnp.float32
i32 = jnp.int32


def make_isect(wscene, max_rounds=96, interpret=None, min_tiles=64,
               early_exit=True):
    """An ``intersect_octree``-shaped callable over a WaveScene."""
    return functools.partial(wavefront.intersect_wavefront, wscene,
                             max_rounds=max_rounds, interpret=interpret,
                             min_tiles=min_tiles, early_exit=early_exit)


# Static-schedule cache: (world_size, n_mixed, seg tag, B) -> round/
# compaction schedule recorded by the last dynamic trace of that segment.
# Replayed traces run as ONE jitted dispatch (wavefront module
# docstring); a replay that cuts live rays (n_left > 0: the camera moved
# too far from the recording frame) falls back to a dynamic trace and
# re-records.  The key is stable across processes so schedules can be
# persisted (save_schedules/load_schedules): discovery costs minutes of
# compile through the axon tunnel, a replayed tuple is an XLA-cache hit.
_SCHED: dict = {}

# Persisted-schedule format version: bump when the ENGINE CONFIG changes
# the meaning of a recorded ladder (KMAX, serve placement, drain rule).
# A stale ladder is not just suboptimal — under the final-round-serves
# rule a pre-ladder "(0,0,0)" entry drains the FULL frame in the serve
# loop (~6.4 s measured, .tpu_jobs/084) while reporting n_left=0, so it
# would never re-record.  Version-mismatched files are ignored wholesale.
SCHED_VERSION = ("v5-cr-cloop-1-K%d-c%d-p%d-o%d"
                 % (wavefront.KMAX, wavefront.DEFAULT_CLOOP,
                    int(wavefront.PREDICT), int(wavefront.OCT_SORT)))


def _sched_key(wscene, tag, B):
    # fingerprint (ops/wavefront._scene_fingerprint) keeps two scenes
    # with coincidentally equal (world_size, n_mixed) from swapping
    # persisted ladders (a wrong-scene replay strands <= _stale_tol rays
    # silently, rendering them as misses)
    return (wscene.world_size, wscene.n_mixed, wscene.fingerprint, tag, B)


def save_schedules(path):
    """Persist every recorded schedule as JSON (key -> [schedule, slack])."""
    import json
    data = {"|".join(map(str, k)): [list(v[0]), v[1]]
            for k, v in _SCHED.items()}
    data["__version__"] = SCHED_VERSION
    tmp = f"{path}.tmp{np.random.randint(1 << 30)}"
    with open(tmp, "w") as f:
        json.dump(data, f)
    import os
    os.replace(tmp, path)


def load_schedules(path):
    """Seed the schedule cache from :func:`save_schedules` output.  Stale
    entries are harmless: a replay that strands rays falls back to
    dynamic discovery and re-records."""
    import json
    import os
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        data = json.load(f)
    if data.pop("__version__", None) != SCHED_VERSION:
        return 0  # recorded under a different engine config: discard
    n = 0
    for k, (sched, slack) in data.items():
        parts = k.split("|")
        if len(parts) != 5:
            continue  # pre-fingerprint entry (r2 format): obsolete ladder
        ws, nm, fp, tag, b = parts
        _SCHED[(int(ws), int(nm), int(fp), tag, int(b))] = (
            tuple(sched), int(slack))
        n += 1
    return n


def _stale_tol(B):
    """Pending rays a replay may leave behind and still count as valid
    (they render as misses, like the dynamic loop's stall break)."""
    return max(8, B // 10000)


# Per-frame miss-residue observability (VERDICT r3 item 6): the stranded
# ray counts the last rendered frame ACCEPTED under _stale_tol, keyed by
# segment tag.  bench.py and the gate publish these so a regression from
# ~0 rays to thousands inside the tolerance boundary is visible in the
# recorded rows rather than silently tolerated.
last_residue: dict = {}


def _traced(wscene, o, d, tag, active=None, camera=None, use_static=True,
            **kw):
    # camera-mode segments re-trace identical rays every frame (the
    # schedule is exact).  Bounce/shadow rays vary with the frame RNG,
    # but the final replay round drains in-kernel (serve loop), so
    # slack=1 is safe there too — slack=2 kept mid-ladder sorts at full
    # size for ~4 extra rounds (job 110 profile).  Stale replays
    # (n_left > tol) still fall back and re-record with escalated slack.
    slack = 1
    key = _sched_key(wscene, tag, o.shape[0])
    cached = _SCHED.get(key) if use_static else None
    if camera is not None:
        kw = dict(kw, cam_block=_use_block(camera[1]))
    if cached is not None:
        sched, slack = cached
        res, n_left = wavefront.intersect_wavefront(
            wscene, o, d, active=active, camera=camera, schedule=sched, **kw)
        # a sub-0.01% residue matches the dynamic loop's own stall
        # break (livelocked rays retire as misses either way) — only a
        # real divergence (camera/RNG outgrew the ladder) re-records
        if int(n_left) <= _stale_tol(o.shape[0]):
            last_residue[tag] = int(n_left)
            return res
        del _SCHED[key]  # stale: fall through to dynamic + re-record
        slack = min(slack * 2, 8)
    prof = {}
    res = wavefront.intersect_wavefront(
        wscene, o, d, active=active, camera=camera, profile=prof,
        schedule_slack=slack, **kw)
    # the dynamic loop drains (or stall-retires) everything it traces;
    # there is no replay residue to report — drop any stale entry so
    # bench.py's n_left row can't echo a previous frame's count (ADVICE)
    last_residue.pop(tag, None)
    if use_static:
        _SCHED[key] = (prof["schedule"], slack)
    return res


BLK = 32


def _use_block(width):
    """Block-major order needs whole 32-pixel columns; odd widths (tiny
    viewer/test frames) fall back to row-major."""
    return width % BLK == 0


def _frame_B(width, height):
    """Ray-array length of a frame (32-padded height in block mode)."""
    if not _use_block(width):
        return width * height
    return width * (-(-height // BLK) * BLK)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _frame_rays(cam5, width, height):
    """Frame rays in BLOCK-MAJOR order: index i walks 32x32-pixel
    blocks (row-major blocks, row-major pixels within a block), so each
    (8,128) kernel tile covers one compact pixel block instead of half
    an image row — the sort-free local round's candidate tables then
    actually cover their tile's rays.  All arrays have length
    _frame_B(width, height); pad rows (py >= height) trace harmlessly
    and are cropped by _unblock.  Direction math matches
    shade.pixel_dirs_rows / the camera-mode kernel op-for-op."""
    if not _use_block(width):
        dirs_un = shade.pixel_dirs_device(cam5, width, height)
        dirs = dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True)
        origins = jnp.broadcast_to(cam5[0], dirs.shape)
        px = jnp.tile(jnp.arange(width, dtype=f32), height)
        py = jnp.repeat(jnp.arange(height, dtype=f32), width)
        return origins, dirs, px, py
    nbx = width // BLK
    nby = -(-height // BLK)
    shp = (nby, nbx, BLK, BLK)
    by = jnp.arange(nby, dtype=jnp.int32)[:, None, None, None]
    bx = jnp.arange(nbx, dtype=jnp.int32)[None, :, None, None]
    ly = jnp.arange(BLK, dtype=jnp.int32)[None, None, :, None]
    lx = jnp.arange(BLK, dtype=jnp.int32)[None, None, None, :]
    px = jnp.broadcast_to(bx * BLK + lx, shp).reshape(-1).astype(f32)
    py = jnp.broadcast_to(by * BLK + ly, shp).reshape(-1).astype(f32)
    u = (px + f32(0.5)) / f32(width)
    # pad rows (py >= height) reuse the last real row's direction —
    # mirrors the kernel's pyi clamp op-for-op (ADVICE r4)
    v = (jnp.minimum(py, f32(height - 1)) + f32(0.5)) / f32(height)
    l1, l2, r1, r2 = cam5[1], cam5[2], cam5[3], cam5[4]
    left = l1[None] + (l2 - l1)[None] * v[:, None]
    right = r1[None] + (r2 - r1)[None] * v[:, None]
    dirs_un = left + (right - left) * u[:, None]
    dirs = dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam5[0], dirs.shape)
    return origins, dirs, px, py


def _unblock(a, width, height):
    """Block-major flat array -> (height, width, ...) image (a pure
    reshape/transpose — NOT a gather — so it costs memory bandwidth)."""
    if not _use_block(width):
        return a.reshape(height, width, *a.shape[1:])
    nbx = width // BLK
    nby = a.shape[0] // (width * BLK)
    x = a.reshape(nby, nbx, BLK, BLK, *a.shape[1:])
    x = jnp.moveaxis(x, 2, 1)
    return x.reshape(nby * BLK, width, *a.shape[1:])[:height]


@functools.partial(jax.jit, static_argnames=("first", "mirror_values"))
def _gi_update(first, mirror_values, accum, mask, depth, iters_out, active,
               o, d, r, res):
    """One segment of render mode 0 (svotrace.comp:443-560) given its hit
    record — the jitted between-traversal math of shade.shade_gi."""
    hit = active & res.hit
    miss = active & ~res.hit

    if first:
        accum = jnp.where(miss[:, None], accum + shade.sky(d), accum)
        iters_out = jnp.where(active, res.iters, iters_out)
    else:
        sun_hit = jnp.arccos(jnp.clip(
            jnp.sum(d * shade.SUN_DIR_GI[None, :], axis=-1),
            -1.0, 1.0)) < f32(0.4)
        add = jnp.where(sun_hit[:, None], mask * f32(7.0), 0.0) + mask
        accum = jnp.where(miss[:, None], accum + add, accum)
        depth = jnp.where(miss, f32(0.0), depth)
        iters_out = jnp.where(hit, res.iters, iters_out)

    normal = jnp.nan_to_num(res.normal)
    newdir = shade.cosine_bounce(normal, r)
    if mirror_values:
        is_mirror = jnp.zeros(active.shape, bool)
        for v in mirror_values:
            is_mirror = is_mirror | (res.value == v)
        newdir = jnp.where(is_mirror[:, None],
                           shade.mirror_bounce(d, normal), newdir)
    newdir = jnp.where(jnp.isfinite(newdir), newdir, -d)
    matcolor = shade.material_color(res.value, res.voxel_pos)

    depth = jnp.where(hit, res.t, depth)
    ndotl = jnp.sum(newdir * normal, axis=-1, keepdims=True)
    if mirror_values:
        ndotl = jnp.where(is_mirror[:, None], 1.0, ndotl)
    mask = jnp.where(hit[:, None], mask * matcolor * ndotl, mask)
    o = jnp.where(hit[:, None], res.voxel_pos, o)
    d = jnp.where(hit[:, None], newdir, d)
    return accum, mask, depth, iters_out, hit, o, d


@jax.jit
def _gi_init(px, py, frame_number, dirs):
    B = dirs.shape[0]
    r = rng.pixel_rand(px, py, frame_number.astype(f32))
    return (jnp.zeros((B, 3), f32), jnp.ones((B, 3), f32),
            jnp.full((B,), -1.0, f32), jnp.zeros((B,), i32),
            jnp.ones((B,), bool), r)


@jax.jit
def _heat_post(res):
    it = res.iters.astype(f32)
    v = jnp.where(res.hit, f32(0.005) * it, f32(0.01) * it)
    return (jnp.repeat(v[:, None], 3, axis=1),
            jnp.where(res.hit, res.t, f32(0.0)), res.iters)


@jax.jit
def _norm_post(res):
    col = jnp.where(res.hit[:, None], res.normal * f32(0.5) + f32(0.5),
                    f32(0.0))
    return col, jnp.where(res.hit, res.t, f32(0.0)), res.iters


@jax.jit
def _shadow_rays(res):
    return (res.voxel_pos,
            jnp.broadcast_to(shade.SUN_DIR_DIRECT, res.voxel_pos.shape),
            res.hit)


def _mode_tags(render_mode, gi_bounces):
    if render_mode == 0:
        return ("prim",) + tuple(f"gi{s}" for s in range(1, gi_bounces + 1))
    if render_mode == 2:
        return ("prim", "shadow")
    return ("prim",)


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "render_mode", "gi_bounces", "mirror_values",
    "schedules", "G", "NM", "ws", "capacity", "early_exit", "interpret",
    "min_tiles", "extra", "serve", "serve_width"))
def _frame_static(cam5, warrays, frame_number, width, height, render_mode,
                  gi_bounces, mirror_values, schedules, G, NM, ws, capacity,
                  early_exit, interpret, min_tiles, extra, serve,
                  serve_width):
    """One whole frame — every traversal segment (static schedules) plus
    all shading stages — as a single jitted dispatch.  The reference pays
    1-2 kernel dispatches per frame (Main.java:257-288); this is the
    analog once the schedules are known.  Returns (col, depth, iters,
    n_lefts) — n_lefts[i] > 0 means segment i's schedule went stale."""
    inner_cap, l0_cap = wavefront._resolve_caps(G)
    B = _frame_B(width, height)
    origins, dirs, px, py = _frame_rays(cam5, width, height)
    cam = wavefront.cam16(cam5)
    ones = jnp.ones(B, bool)

    def trace(o, d, act, cam_dims, sched, serve_local=False):
        # incoherent (bounce) segments serve AFTER the global sort:
        # sorted tiles span ~B_tile/run cells instead of hundreds, so
        # far fewer latency-bound block DMAs (PERF_NOTES r3)
        return wavefront._trace_body(
            o, d, act, cam if cam_dims is not None else None, warrays,
            tuple(sched), B, G, NM, ws, capacity, inner_cap, l0_cap,
            early_exit, interpret, 0, True, cam_dims, min_tiles,
            extra=extra, serve=serve, serve_width=serve_width,
            serve_local=serve_local, cloop=wavefront.DEFAULT_CLOOP)

    cdims = (width, height, ws,
             width // BLK if _use_block(width) else 0)
    n_lefts = []
    if render_mode == 0:
        accum, mask, depth, iters_out, active, r = _gi_init(
            px, py, frame_number.astype(f32), dirs)
        o, d = origins, dirs
        for seg in range(gi_bounces + 1):
            if seg == 0:
                res, nl = trace(o, d, ones, cdims, schedules[0])
            else:
                res, nl = trace(o, d, active, None, schedules[seg])
            n_lefts.append(nl)
            accum, mask, depth, iters_out, active, o, d = _gi_update(
                seg == 0, mirror_values, accum, mask, depth, iters_out,
                active, o, d, r, res)
        col, it = accum, iters_out
    elif render_mode == 2:
        res, nl = trace(origins, dirs, ones, cdims, schedules[0])
        n_lefts.append(nl)
        so, sd, sa = _shadow_rays(res)
        sh, nl2 = trace(so, sd, sa, None, schedules[1])
        n_lefts.append(nl2)
        col, depth, it = shade.direct_shade_math(dirs, res, sh,
                                                 jnp.zeros_like(res.t))
    else:
        res, nl = trace(origins, dirs, ones, cdims, schedules[0])
        n_lefts.append(nl)
        col, depth, it = (_heat_post(res) if render_mode == 1
                          else _norm_post(res))
    return (_unblock(col, width, height), _unblock(depth, width, height),
            _unblock(it, width, height), jnp.stack(n_lefts))


def render_frame_wavefront(wscene, cam5, width, height, render_mode=0,
                           frame_number=1, gi_bounces=1, rng_mode="glsl",
                           rng_key=None, mirror_values=(),
                           max_depth=C.MAX_DEPTH, max_iterations=None,
                           max_rounds=96, interpret=None, min_tiles=64,
                           early_exit=True, use_static=True):
    """Render one frame through the wavefront engine.

    Returns (color (H,W,3), depth (H,W), iters (H,W)); row 0 is the GL
    bottom scanline like shade.render_image.  ``max_depth`` is accepted
    for signature parity but the brick engine always resolves finest
    leaves (see ops/brick_trace.py docstring).

    The first frame of a (scene, resolution) runs the dynamic wavefront
    loop and records each traversal segment's compaction schedule;
    later frames replay each segment as a single jitted dispatch
    (``use_static``).  Primary segments additionally use camera mode —
    their sort state carries 5 operands instead of 12 (see
    ops/wavefront.py docstring).
    """
    del max_depth, max_iterations
    kw = dict(max_rounds=max_rounds, interpret=interpret,
              min_tiles=min_tiles, early_exit=early_exit,
              use_static=use_static)
    cam5 = jnp.asarray(cam5, f32)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # fused path: every segment's schedule known -> ONE dispatch per frame
    tags = _mode_tags(render_mode, gi_bounces)
    B = _frame_B(width, height)
    keys = [_sched_key(wscene, t, B) for t in tags]
    if use_static and all(k in _SCHED for k in keys) \
            and (render_mode != 0 or rng_mode == "glsl"):
        warrays = (wscene.l0_occ, wscene.l0_mixed, wscene.brick_slot,
                   wscene.occ_words, wscene.attr_comb, wscene.slot_cell,
                   wscene.sc_words, wscene.l0_sc)
        col, depth, it, n_lefts = _frame_static(
            cam5, warrays, jnp.asarray(frame_number, f32),
            width=width, height=height, render_mode=render_mode,
            gi_bounces=gi_bounces, mirror_values=tuple(mirror_values),
            schedules=tuple(_SCHED[k][0] for k in keys),
            G=wscene.grid_size, NM=wscene.capacity, ws=wscene.world_size,
            capacity=wscene.capacity, early_exit=early_exit,
            interpret=interpret, min_tiles=min_tiles,
            extra=(wavefront.DEFAULT_EXTRA
                   if wscene.grid_size <= 32 else 0),
            serve=(wavefront.DEFAULT_SERVE
                   if wscene.grid_size <= wavefront.PAGE else 0),
            serve_width=wavefront.DEFAULT_SERVE_WIDTH)
        nl = np.asarray(n_lefts)
        stale = nl > _stale_tol(B)
        if not stale.any():
            last_residue.clear()
            last_residue.update(zip(tags, nl.tolist()))
            return col, depth, it
        for i, k in enumerate(keys[:len(stale)]):
            if stale[i]:
                _SCHED.pop(k, None)
        # fall through: per-segment path re-records the stale schedules

    origins, dirs, px, py = _frame_rays(cam5, width, height)
    camera = (cam5, width, height)

    if render_mode == 0:
        if rng_mode != "glsl":
            raise NotImplementedError("wavefront GI supports glsl rng; "
                                      "use render_progressive for threefry")
        accum, mask, depth, iters_out, active, r = _gi_init(
            px, py, jnp.asarray(frame_number, f32), dirs)
        o, d = origins, dirs
        for seg in range(gi_bounces + 1):
            if seg == 0:
                res = _traced(wscene, o, d, "prim", camera=camera,
                              serve_local=False, **kw)
            else:
                res = _traced(wscene, o, d, f"gi{seg}", active=active,
                              serve_local=False, **kw)
            accum, mask, depth, iters_out, active, o, d = _gi_update(
                seg == 0, tuple(mirror_values), accum, mask, depth,
                iters_out, active, o, d, r, res)
        col = accum
        it = iters_out
    elif render_mode == 1:
        res = _traced(wscene, origins, dirs, "prim", camera=camera,
                      serve_local=False, **kw)
        col, depth, it = _heat_post(res)
    elif render_mode == 2:
        res = _traced(wscene, origins, dirs, "prim", camera=camera,
                      serve_local=False, **kw)
        so, sd, sa = _shadow_rays(res)
        sh = _traced(wscene, so, sd, "shadow", active=sa,
                     serve_local=False, **kw)
        col, depth, it = shade.direct_shade_math(dirs, res, sh,
                                                 jnp.zeros_like(res.t))
    elif render_mode == 3:
        res = _traced(wscene, origins, dirs, "prim", camera=camera,
                      serve_local=False, **kw)
        col, depth, it = _norm_post(res)
    else:
        raise ValueError(f"unknown render mode {render_mode}")

    return (_unblock(col, width, height), _unblock(depth, width, height),
            _unblock(it, width, height))
