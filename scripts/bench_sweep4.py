"""TPU diagnostics round 4: Pallas primitives for the brick-wavefront design.

The XLA pointer-chase traversal is gather-op-bound (~0.1 G elem/s, sweep3).
The brick design needs these primitives to be fast; measure each:

  P1. Pallas sublane-gather  x[idx[i,j], j]  (take_along_axis axis=0) over a
      VMEM-resident (V, 128) table — THE brick-DDA fetch.  V in {1k, 8k, 32k}.
  P2. Pallas lane-gather     x[i, idx[i,j]]  (take_along_axis axis=1).
  P3. Arbitrary 1-D jnp.take in Pallas (expected: Mosaic rejects).
  P4. Replication (8,128)->(1024,128): static reshape+broadcast vs MXU trick.
  P5. Dynamic in-kernel DMA: HBM row-block selected by traced scalar.
  P6. Toy fused bit-DDA kernel: K steps over a replicated occupancy brick —
      the projected brick-march inner loop (rays/s).
  S1. jnp.argsort / jnp.sort throughput at 0.5M / 2M int32 (XLA, for the
      sort-by-brick rounds).
  T1. traverse_pallas.intersect_octree compile on the real chip (expected to
      fail per CLAUDE.md; record the error).
"""

import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

INTERPRET = False


def timeit(f, n=10):
    out = f()
    jax_block(out)
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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".bench_cache", "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i32, f32 = jnp.int32, jnp.float32
    print(f"backend={jax.default_backend()} dev={jax.devices()[0]}",
          flush=True)
    rng = np.random.default_rng(0)

    # ---------------- P1: sublane gather x[idx[i,j], j] --------------------
    for V in (1024, 8192, 32768):
        tab = jnp.asarray(rng.integers(0, V, (V, 128)).astype(np.int32))

        def kern(tab_ref, idx_ref, out_ref):
            t = tab_ref[:]
            x = idx_ref[:]
            for _ in range(16):
                x = jnp.take_along_axis(t, x, axis=0) % i32(V)
            out_ref[:] = x

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
                interpret=INTERPRET,
            )(tab, idx)

        B = 131072
        idx = jnp.asarray(rng.integers(0, V, (B // 128, 128)).astype(np.int32))
        try:
            # correctness vs numpy
            got = np.asarray(run(tab, idx))
            x = np.asarray(idx)
            tnp = np.asarray(tab)
            for _ in range(16):
                x = np.take_along_axis(tnp, x, axis=0) % V
            ok = (got == x).all()
            dt = timeit(lambda: run(tab, idx))
            print(f"P1 V={V}: ok={ok} 16 gathers x {B}: {dt*1e3:.3f} ms "
                  f"({16*B/dt/1e9:.2f} G elem/s)", flush=True)
        except Exception as e:
            print(f"P1 V={V}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # ---------------- P2: lane gather x[i, idx[i,j]] ------------------------
    try:
        W = 128
        tab2 = jnp.asarray(rng.integers(0, W, (8, W)).astype(np.int32))

        def kern2(tab_ref, idx_ref, out_ref):
            t = tab_ref[:]
            x = idx_ref[:]
            for _ in range(16):
                x = jnp.take_along_axis(t, x, axis=1) % i32(W)
            out_ref[:] = x

        @jax.jit
        def run2(tab2, idx):
            return pl.pallas_call(
                kern2,
                grid=(idx.shape[0] // 8,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec((8, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
                interpret=INTERPRET,
            )(tab2, idx)

        B = 131072
        idx = jnp.asarray(rng.integers(0, W, (B // 128, 128)).astype(np.int32))
        got = np.asarray(run2(tab2, idx))
        dt = timeit(lambda: run2(tab2, idx))
        print(f"P2: ok 16 lane-gathers x {B}: {dt*1e3:.3f} ms "
              f"({16*B/dt/1e9:.2f} G elem/s)", flush=True)
    except Exception as e:
        print(f"P2: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    # ---------------- P3: arbitrary 1-D take ------------------------------
    try:
        V = 32768
        tab1 = jnp.asarray(rng.integers(0, V, V).astype(np.int32))

        def kern3(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

        @jax.jit
        def run3(tab1, idx):
            return pl.pallas_call(
                kern3,
                grid=(idx.shape[0] // 8,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec((8, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
                interpret=INTERPRET,
            )(tab1, idx)

        idx = jnp.asarray(rng.integers(0, V, (1024, 128)).astype(np.int32))
        got = np.asarray(run3(tab1, idx))
        ok = (got == np.asarray(tab1)[np.asarray(idx)]).all()
        dt = timeit(lambda: run3(tab1, idx))
        print(f"P3: 1-D take WORKS ok={ok}: {dt*1e3:.3f} ms "
              f"({131072/dt/1e9:.2f} G elem/s)", flush=True)
    except Exception as e:
        print(f"P3: 1-D take FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)

    # ---------------- P4: replication (8,128) -> (1024,128) ----------------
    try:
        words = jnp.asarray(rng.integers(0, 2 ** 31, (8, 128)).astype(np.int32))

        def kern4(w_ref, out_ref):
            flat = w_ref[:].reshape(1024, 1)
            out_ref[:] = jnp.broadcast_to(flat, (1024, 128))

        @jax.jit
        def run4(words):
            return pl.pallas_call(
                kern4,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.int32),
                interpret=INTERPRET,
            )(words)

        got = np.asarray(run4(words))
        want = np.broadcast_to(np.asarray(words).reshape(1024, 1), (1024, 128))
        ok = (got == want).all()
        dt = timeit(lambda: run4(words))
        print(f"P4 reshape+broadcast: ok={ok} {dt*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"P4 reshape+broadcast: FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)

    # ---------------- P5: dynamic in-kernel DMA from HBM -------------------
    try:
        NB = 512  # bricks
        atlas = jnp.asarray(
            rng.integers(0, 2 ** 31, (NB * 8, 128)).astype(np.int32))
        bids = jnp.asarray(rng.integers(0, NB, (128,)).astype(np.int32))

        def kern5(bid_ref, atlas_ref, out_ref, scratch, sem):
            g = pl.program_id(0)
            b = bid_ref[g]
            cp = pltpu.make_async_copy(
                atlas_ref.at[pl.ds(b * 8, 8), :], scratch, sem)
            cp.start()
            cp.wait()
            out_ref[:] = scratch[:]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(128,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda g, bid_ref: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA(())],
        )

        @jax.jit
        def run5(bids, atlas):
            return pl.pallas_call(
                kern5, grid_spec=grid_spec, interpret=INTERPRET,
                out_shape=jax.ShapeDtypeStruct((128 * 8, 128), jnp.int32),
            )(bids, atlas)

        got = np.asarray(run5(bids, atlas)).reshape(128, 8, 128)
        want = np.asarray(atlas).reshape(NB, 8, 128)[np.asarray(bids)]
        ok = (got == want).all()
        dt = timeit(lambda: run5(bids, atlas))
        print(f"P5 dyn-DMA: ok={ok} 128 brick rows {dt*1e3:.3f} ms "
              f"({128*4096/dt/1e9:.2f} GB/s)", flush=True)
    except Exception as e:
        print(f"P5 dyn-DMA: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # ---------------- P6: toy fused bit-DDA over replicated brick ----------
    # 32^3 brick, bit-packed as (1024,) int32 words [v = (x*32+y), bit z],
    # replicated to (1024, 128); 96 DDA steps/ray.
    try:
        vox = (rng.random((32, 32, 32)) < 0.02)
        words_np = np.zeros((1024,), np.uint32)
        for z in range(32):
            words_np |= vox[:, :, z].astype(np.uint32).reshape(1024) << z
        brick = jnp.asarray(words_np.astype(np.int32)).reshape(8, 128)

        def kern6(brick_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  hit_ref, t_ref):
            rep = jnp.broadcast_to(brick_ref[:].reshape(1024, 1), (1024, 128))
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
            adx = jnp.abs(inv_x)
            ady = jnp.abs(inv_y)
            adz = jnp.abs(inv_z)
            hit = jnp.zeros(ox.shape, jnp.bool_)
            t = jnp.zeros(ox.shape, f32)

            def step(c, _):
                ix, iy, iz, tx, ty, tz, hit, t = c
                inside = ((ix >= 0) & (ix < 32) & (iy >= 0) & (iy < 32)
                          & (iz >= 0) & (iz < 32))
                row = ix * 32 + iy
                w = jnp.take_along_axis(rep, jnp.clip(row, 0, 1023), axis=0)
                solid = ((w >> jnp.clip(iz, 0, 31)) & 1) != 0
                new_hit = ~hit & inside & solid
                hit = hit | new_hit
                act = ~hit & inside
                mx = (tx <= ty) & (tx <= tz)
                my = ~mx & (ty <= tz)
                mz = ~mx & ~my
                tcur = jnp.minimum(jnp.minimum(tx, ty), tz)
                t = jnp.where(new_hit, t, jnp.where(act, tcur, t))
                ix = jnp.where(act & mx, ix + sx, ix)
                iy = jnp.where(act & my, iy + sy, iy)
                iz = jnp.where(act & mz, iz + sz, iz)
                tx = jnp.where(act & mx, tx + adx, tx)
                ty = jnp.where(act & my, ty + ady, ty)
                tz = jnp.where(act & mz, tz + adz, tz)
                return (ix, iy, iz, tx, ty, tz, hit, t), None

            c = (ix, iy, iz, tx, ty, tz, hit, t)
            c, _ = jax.lax.scan(step, c, None, length=96)
            hit_ref[:] = c[6].astype(i32)
            t_ref[:] = c[7]

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
                                for _ in range(2)),
                out_shape=(jax.ShapeDtypeStruct(o.shape[1:], jnp.int32),
                           jax.ShapeDtypeStruct(o.shape[1:], jnp.float32)),
                interpret=INTERPRET,
            )(brick, o[0], o[1], o[2], d[0], d[1], d[2])

        B = 131072
        o_np = rng.uniform(0, 32, (3, B // 128, 128)).astype(np.float32)
        d_np = rng.normal(size=(3, B // 128, 128)).astype(np.float32)
        d_np /= np.linalg.norm(d_np, axis=0, keepdims=True)
        o = jnp.asarray(o_np)
        d = jnp.asarray(d_np)
        hit, t = run6(brick, o, d)
        jax_block((hit, t))
        dt = timeit(lambda: run6(brick, o, d))
        hr = float(np.asarray(hit).mean())
        print(f"P6 bit-DDA 96 steps x {B} rays: {dt*1e3:.3f} ms "
              f"({B/dt/1e6:.1f} Mrays/s/brickpass, {96*B/dt/1e9:.2f} G "
              f"steps/s) hit_rate={hr:.3f}", flush=True)
    except Exception as e:
        traceback.print_exc()
        print(f"P6 bit-DDA: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # ---------------- S1: XLA sort throughput ------------------------------
    for B in (524288, 2097152):
        keys = jnp.asarray(rng.integers(0, 32768, B).astype(np.int32))
        val = jnp.asarray(rng.integers(0, B, B).astype(np.int32))

        @jax.jit
        def srt(keys, val):
            return jax.lax.sort((keys, val), num_keys=1)

        dt = timeit(lambda: srt(keys, val), n=5)
        print(f"S1 sort B={B}: {dt*1e3:.2f} ms ({B/dt/1e6:.1f} M keys/s)",
              flush=True)

        @jax.jit
        def asrt(keys):
            return jnp.argsort(keys)

        dt = timeit(lambda: asrt(keys), n=5)
        print(f"S1 argsort B={B}: {dt*1e3:.2f} ms", flush=True)

    # T1 (Pallas ESVO kernel) removed in round 2: ops/traverse_pallas.py
    # was deleted — it assumed 128 MiB VMEM and arbitrary per-lane gathers
    # into a VMEM-resident node table, neither of which the hardware /
    # Mosaic provides (PERF_NOTES.md).  ops/wavefront.py is the fast path.

    print("sweep4 done", flush=True)


if __name__ == "__main__":
    main()
