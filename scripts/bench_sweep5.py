"""TPU diagnostics round 5: where do the staged path's milliseconds go?

  R1. Tunnel round-trip: tiny scalar d2h latency (the staged driver reads one
      scalar per round; at high RTT the SYNCS could dominate, not compute).
  R2. _run_block cost vs rows at fixed steps (is compute linear in rows?).
  R3. staged traversal WITH vs WITHOUT the per-round n_active sync
      (fixed compaction schedule vs adaptive), 480x270 realistic camera.
  R4. beam prepass effect on fine-ray rounds at 480x270.
  P6b. corrected brick bit-DDA Pallas kernel (fori_loop, composite fetch =
      8 lane-gathers + select over a one-vreg (8,128) brick): Mrays/s.
  P1b. in-vreg sublane gather: take_along_axis axis=0 on an (8,128) table.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f, n=5):
    out = f()
    out = jax_block(out)
    t0 = time.time()
    for _ in range(n):
        out = f()
    jax_block(out)
    return (time.time() - t0) / n


def jax_block(x):
    import jax

    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, x)
    return x


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".bench_cache", "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench
    from svo_raytracer_tpu.ops import shade, traverse
    from svo_raytracer_tpu.utils.camera import Camera

    i32, f32 = jnp.int32, jnp.float32
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # ---------------- R1: tunnel scalar d2h RTT -----------------------------
    @jax.jit
    def tiny(x):
        return jnp.sum(x)

    xs = jnp.arange(128, dtype=i32)
    jax_block(tiny(xs))
    t0 = time.time()
    for _ in range(20):
        v = int(tiny(xs))  # forces a scalar device->host read each iter
    rtt = (time.time() - t0) / 20
    print(f"R1 scalar d2h round-trip: {rtt*1e3:.2f} ms", flush=True)

    # dispatch-only cost (no d2h): 20 chained tiny jits then one block
    t0 = time.time()
    y = xs
    for _ in range(20):
        y = tiny(y)[None]
    jax_block(y)
    print(f"R1 dispatch-only 20 tiny jits: {(time.time()-t0)/20*1e3:.2f} ms",
          flush=True)

    # ---------------- scene + camera ---------------------------------------
    tree, _ = bench.build_scene(1024, 512)
    tree = tree.to_device()
    packed = tree.packed_table()
    jax_block(packed)
    print(f"scene ready ({tree.n_nodes} nodes)", flush=True)

    gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
    pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
    probe_o = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                              pxz[:, 1:]], axis=1)
    probe_d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
    probe = traverse.intersect_octree(tree.arrays(), jnp.asarray(probe_o),
                                      jnp.asarray(probe_d), packed=packed)
    ts = np.asarray(probe.t)
    best = int(np.argmax(ts))
    surf_y = 1.999 - float(ts[best])
    cam = Camera(pos=np.array([probe_o[best, 0],
                               min(surf_y + 0.05, 1.99), probe_o[best, 2]]))
    cam.rotate(-0.35, 0.4)
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)
    W, H = 480, 270
    dirs_un = shade.pixel_dirs_device(cam5, W, H)
    dirs = dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam5[0], dirs.shape)
    jax_block((origins, dirs))

    # ---------------- R2: _run_block cost vs rows ---------------------------
    state, const = traverse._setup_jit(origins, dirs, 13, False, None, 13,
                                       packed)
    jax_block(state)
    cone = jnp.asarray(False)
    for rows in (1013, 512, 128, 32):
        st = {k: (v[:rows] if v.ndim == 2 else v[:, :rows])
              for k, v in state.items()}
        co = {k: v[:rows] for k, v in const.items()}

        def f():
            s, n = traverse._run_block(st, co, packed, cone, 32, 1500, 13)
            return s["t_min"]

        dt = timeit(f, 3)
        print(f"R2 rows={rows}: 32 steps {dt*1e3:.1f} ms "
              f"({dt/32*1e3:.2f} ms/step)", flush=True)

    # ---------------- R3: staged with vs without per-round sync -------------
    def staged_adaptive():
        return traverse.intersect_octree_staged(
            tree.arrays(), origins, dirs, packed=packed, round_steps=64).t

    dt = timeit(staged_adaptive, 3)
    print(f"R3 staged adaptive (sync/round): {dt*1e3:.1f} ms", flush=True)

    # fixed schedule: no n_active reads; compact on a fixed cadence via
    # _compact with precomputed row counts (survival guess: halve every 64)
    def staged_fixed():
        st, co = traverse._setup_jit(origins, dirs, 13, False, None, 13,
                                     packed)
        R = st["t_min"].shape[0]
        acc = {k: jnp.zeros(R * 128, st[k].dtype)
               for k in traverse._DECODE_STATE}
        perm = jnp.arange(R * 128, dtype=i32)
        rows = R
        schedule = [(64, max(R // 4, 32)), (64, max(R // 16, 32)),
                    (64, max(R // 64, 32)), (128, max(R // 64, 32)),
                    (1216, None)]
        for steps, new_rows in schedule:
            st, _ = traverse._run_block(st, co, packed, cone, steps, 1500, 13)
            if new_rows is not None and new_rows < rows:
                st, co, perm, acc = traverse._compact(st, co, perm, acc,
                                                      out_rows=new_rows)
                rows = new_rows
        for k in traverse._DECODE_STATE:
            acc[k] = acc[k].at[perm].set(st[k].reshape(-1))
        return acc["t_min"]

    dt = timeit(staged_fixed, 3)
    print(f"R3 staged fixed (no sync): {dt*1e3:.1f} ms", flush=True)

    # ---------------- R4: beam prepass effect -------------------------------
    bt = shade.beam_prepass(tree.arrays(), cam5, W, H, 4, packed=packed)
    by = jnp.arange(H) // 4
    bx = jnp.arange(W) // 4
    beam = bt[by[:, None], bx[None, :]].reshape(-1)
    borig = origins + dirs * beam[:, None]
    jax_block(borig)

    def beamed():
        return traverse.intersect_octree_staged(
            tree.arrays(), borig, dirs, packed=packed, round_steps=64).t

    dt = timeit(beamed, 3)
    print(f"R4 staged fine rays w/ beam start: {dt*1e3:.1f} ms "
          f"(+ beam prepass itself)", flush=True)

    def beam_only():
        return shade.beam_prepass(tree.arrays(), cam5, W, H, 4, packed=packed)

    dt = timeit(beam_only, 3)
    print(f"R4 beam prepass alone ({W//4}x{H//4}): {dt*1e3:.1f} ms",
          flush=True)

    # ---------------- P1b: in-vreg sublane gather ---------------------------
    try:
        tab = jnp.asarray(rng.integers(0, 8, (8, 128)).astype(np.int32))

        def kern(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        @jax.jit
        def run(tab, idx):
            return pl.pallas_call(
                kern,
                grid=(idx.shape[0] // 8,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec((8, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
            )(tab, idx)

        idx = jnp.asarray(rng.integers(0, 8, (1024, 128)).astype(np.int32))
        got = np.asarray(run(tab, idx))
        want = np.take_along_axis(
            np.broadcast_to(np.asarray(tab), (1024 // 8, 8, 128)
                            ).reshape(1024, 128)[:8], np.asarray(idx)[:8], 0)
        ok = (got[:8] == want).all()
        dt = timeit(lambda: run(tab, idx))
        print(f"P1b sublane in-vreg gather: ok={ok} {dt*1e3:.3f} ms "
              f"(131072 elems)", flush=True)
    except Exception as e:
        print(f"P1b: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    # ---------------- P6b: brick bit-DDA with composite fetch ---------------
    try:
        vox = (rng.random((32, 32, 32)) < 0.02)
        words_np = np.zeros((32, 32), np.uint32)
        for z in range(32):
            words_np |= vox[:, :, z].astype(np.uint32) << z
        # brick as ONE vreg: word (x,y) at sublane x>>2, lane (x&3)*32+y
        brick_vreg = np.zeros((8, 128), np.uint32)
        for x in range(32):
            for y in range(32):
                brick_vreg[x >> 2, (x & 3) * 32 + y] = words_np[x, y]
        brick = jnp.asarray(brick_vreg.view(np.int32))

        STEPS = 96

        def kern6(brick_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  hit_ref, t_ref, z_ref):
            t8 = brick_ref[:]
            # broadcast each sublane row across all 8 sublanes once
            rows = [jnp.broadcast_to(t8[r:r + 1, :], (8, 128))
                    for r in range(8)]
            ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
            dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
            eps = np.float32(1e-9)
            dx = jnp.where(jnp.abs(dx) < eps, eps, dx)
            dy = jnp.where(jnp.abs(dy) < eps, eps, dy)
            dz = jnp.where(jnp.abs(dz) < eps, eps, dz)
            ix = jnp.clip(ox.astype(i32), 0, 31)
            iy = jnp.clip(oy.astype(i32), 0, 31)
            iz = jnp.clip(oz.astype(i32), 0, 31)
            sx = jnp.where(dx > 0, i32(1), i32(-1))
            sy = jnp.where(dy > 0, i32(1), i32(-1))
            sz = jnp.where(dz > 0, i32(1), i32(-1))
            inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz
            nx = jnp.where(dx > 0, ix + 1, ix).astype(f32)
            ny = jnp.where(dy > 0, iy + 1, iy).astype(f32)
            nz = jnp.where(dz > 0, iz + 1, iz).astype(f32)
            tx = (nx - ox) * inv_x
            ty = (ny - oy) * inv_y
            tz = (nz - oz) * inv_z
            adx, ady, adz = jnp.abs(inv_x), jnp.abs(inv_y), jnp.abs(inv_z)

            def fetch(ix, iy):
                lane = (ix & 3) * 32 + iy
                cands = [jnp.take_along_axis(rows[r], lane, axis=1)
                         for r in range(8)]
                r = ix >> 2
                w = cands[0]
                for k in range(1, 8):
                    w = jnp.where(r == k, cands[k], w)
                return w

            def body(_, c):
                ix, iy, iz, tx, ty, tz, hit, t, hz = c
                inside = ((ix >= 0) & (ix < 32) & (iy >= 0) & (iy < 32)
                          & (iz >= 0) & (iz < 32))
                w = fetch(jnp.clip(ix, 0, 31), jnp.clip(iy, 0, 31))
                solid = ((w >> jnp.clip(iz, 0, 31)) & 1) != 0
                new_hit = ~hit & inside & solid
                hit = hit | new_hit
                hz = jnp.where(new_hit, iz, hz)
                act = ~hit & inside
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
                return (ix, iy, iz, tx, ty, tz, hit, t, hz)

            c = (ix, iy, iz, tx, ty, tz,
                 jnp.zeros(ox.shape, jnp.bool_), jnp.zeros(ox.shape, f32),
                 jnp.zeros(ox.shape, i32))
            c = jax.lax.fori_loop(0, STEPS, body, c)
            hit_ref[:] = c[6].astype(i32)
            t_ref[:] = c[7]
            z_ref[:] = c[8]

        @jax.jit
        def run6(brick, o, d):
            return pl.pallas_call(
                kern6,
                grid=(o.shape[1] // 8,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 6,
                out_specs=tuple(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                             memory_space=pltpu.VMEM)
                                for _ in range(3)),
                out_shape=(jax.ShapeDtypeStruct(o.shape[1:], jnp.int32),
                           jax.ShapeDtypeStruct(o.shape[1:], jnp.float32),
                           jax.ShapeDtypeStruct(o.shape[1:], jnp.int32)),
            )(brick, o[0], o[1], o[2], d[0], d[1], d[2])

        B = 131072
        o_np = rng.uniform(0, 32, (3, B // 128, 128)).astype(np.float32)
        d_np = rng.normal(size=(3, B // 128, 128)).astype(np.float32)
        d_np /= np.linalg.norm(d_np, axis=0, keepdims=True)
        o, d = jnp.asarray(o_np), jnp.asarray(d_np)
        hit, t, hz = jax_block(run6(brick, o, d))

        # correctness: scalar DDA oracle on a sample
        def oracle(o1, d1):
            eps = 1e-9
            d1 = np.where(np.abs(d1) < eps, eps, d1)
            ip = np.clip(o1.astype(np.int64), 0, 31)
            st = np.where(d1 > 0, 1, -1)
            nxt = np.where(d1 > 0, ip + 1, ip).astype(np.float64)
            tm = (nxt - o1) / d1
            dd = np.abs(1.0 / d1)
            for _ in range(STEPS):
                if not ((0 <= ip) & (ip < 32)).all():
                    return False
                if vox[ip[0], ip[1], ip[2]]:
                    return True
                ax = int(np.argmin(tm))
                ip[ax] += st[ax]
                tm[ax] += dd[ax]
            return False

        got = np.asarray(hit).reshape(-1)
        sample = rng.integers(0, B, 300)
        ok = all(bool(got[s]) == oracle(o_np[:, s // 128, s % 128].copy(),
                                        d_np[:, s // 128, s % 128].copy())
                 for s in sample)
        dt = timeit(lambda: run6(brick, o, d))
        print(f"P6b composite-fetch DDA {STEPS} steps x {B}: ok={ok} "
              f"{dt*1e3:.2f} ms ({B/dt/1e6:.1f} Mrays/brickpass/s)",
              flush=True)
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"P6b: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    print("sweep5 done", flush=True)


if __name__ == "__main__":
    main()
