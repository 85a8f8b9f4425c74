"""Pallas primitive rates for the brick-DDA architecture (run on real chip).

The XLA traversal is gather-bound at ~0.1 G elem/s (tune_staged.jsonl), so
the next architecture keeps the hot loop's working set in VMEM.  These are
the primitives it stands on; results go to .bench_cache/pallas_prims.jsonl.

  P1a. independent sublane-gather throughput: x[idx[i,j], j] over a VMEM
       (V,128) table, K gathers summed (no dependence).
  P1b. dependent chain: idx <- x[idx, j] K times (the DDA's true shape).
  P7.  coarse bit-DDA over a 64^3 occupancy grid held as (2048,128) u32
       replicated across lanes (the L0 empty-space skip kernel), 96 steps.
  P6b. 32^3 bit-brick DDA, brick in ONE (8,128) vreg, composite fetch.
  P8.  dynamic HBM->VMEM DMA chain: fetch a (128,128) block at a traced
       offset per iteration (the per-brick fetch), dependent.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

INTERPRET = os.environ.get("PALLAS_INTERPRET") == "1"

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench_cache", "pallas_prims.jsonl")



def _err(e):
    """Error string with the failing source location — a bare Mosaic
    AssertionError row is undebuggable without it (round-1 lesson)."""
    import traceback
    frames = traceback.extract_tb(e.__traceback__)
    loc = "?"
    for fr in reversed(frames):
        loc = f"{fr.filename.rsplit('/', 1)[-1]}:{fr.lineno}"
        break
    return f"{type(e).__name__}: {str(e)[:200]} @ {loc}"

def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(OUT), "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i32, f32 = jnp.int32, jnp.float32
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    out_f = open(OUT, "a")

    def rec(**kw):
        out_f.write(json.dumps(kw) + "\n")
        out_f.flush()
        print(json.dumps(kw), flush=True)

    def timeit(f, reps=10):
        out = f()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = f()
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    # ---------------- P1a/P1b: VMEM sublane gather ----------------
    K = 256
    for V in (64, 1024, 8192):
        tab_np = rng.integers(0, V, (V, 128), np.int32)
        tab = jnp.asarray(tab_np)
        idx0 = jnp.asarray(rng.integers(0, V, (8, 128), np.int32))

        def kern_a(tab_ref, idx_ref, out_ref):
            t = tab_ref[:]
            idx = idx_ref[:]
            acc = jnp.zeros((8, 128), i32)

            def body(k, acc):
                g = jnp.take_along_axis(t, (idx + k) % V, axis=0)
                return acc + g

            out_ref[:] = jax.lax.fori_loop(0, K, body, acc)

        def kern_b(tab_ref, idx_ref, out_ref):
            t = tab_ref[:]
            idx = idx_ref[:]

            def body(k, idx):
                return jnp.take_along_axis(t, idx, axis=0)

            out_ref[:] = jax.lax.fori_loop(0, K, body, idx)

        for name, kern in (("p1a_indep", kern_a), ("p1b_chain", kern_b)):
            try:
                run = jax.jit(functools.partial(
                    pl.pallas_call, kern, interpret=INTERPRET,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))())
                dt = timeit(lambda: run(tab, idx0))
                rec(kind=name, V=V, K=K, us=round(dt * 1e6, 2),
                    g_gather_s=round(8 * 128 * K / dt / 1e9, 3))
            except Exception as e:
                rec(kind=name, V=V, error=_err(e))

    # ---------------- P7: coarse 64^3 bit-DDA in VMEM ----------------
    # occupancy grid 64^3 bits: word (x,y) holds z-bits packed 2 words/z64.
    # layout: (4096, 128) u32 viewed as int32, row = x*64+y >> 1 ... simpler:
    # word index w = (x*64 + y)*2 + (z>=32); as (8192, 128) replicated.
    try:
        occ = rng.random((64, 64, 64)) < 0.05
        words = np.zeros((64, 64, 2), np.uint32)
        for z in range(64):
            words[:, :, z // 32] |= occ[:, :, z].astype(np.uint32) << (z % 32)
        tabw = np.broadcast_to(words.reshape(-1)[:, None], (8192, 128)).copy()
        tab = jnp.asarray(tabw.view(np.int32))
        STEPS = 96
        B = 131072

        def kern7(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  hit_ref, t_ref):
            t8 = tab_ref[:]
            ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
            dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
            eps = np.float32(1e-9)
            dx = jnp.where(jnp.abs(dx) < eps, eps, dx)
            dy = jnp.where(jnp.abs(dy) < eps, eps, dy)
            dz = jnp.where(jnp.abs(dz) < eps, eps, dz)
            ix = jnp.clip(ox.astype(i32), 0, 63)
            iy = jnp.clip(oy.astype(i32), 0, 63)
            iz = jnp.clip(oz.astype(i32), 0, 63)
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

            def body(_, c):
                ix, iy, iz, tx, ty, tz, hit, t = c
                inside = ((ix >= 0) & (ix < 64) & (iy >= 0) & (iy < 64)
                          & (iz >= 0) & (iz < 64))
                cz = jnp.clip(iz, 0, 63)
                w = ((jnp.clip(ix, 0, 63) * 64 + jnp.clip(iy, 0, 63)) * 2
                     + (cz >> 5))
                word = jnp.take_along_axis(t8, w, axis=0)
                solid = ((word >> (cz & 31)) & 1) != 0
                new_hit = ~hit & inside & solid
                hit = hit | new_hit
                act = ~hit & inside
                mx = (tx <= ty) & (tx <= tz)
                my = ~mx & (ty <= tz)
                mz = ~mx & ~my
                tcur = jnp.minimum(jnp.minimum(tx, ty), tz)
                t = jnp.where(new_hit, tcur, t)
                ix = jnp.where(act & mx, ix + sx, ix)
                iy = jnp.where(act & my, iy + sy, iy)
                iz = jnp.where(act & mz, iz + sz, iz)
                tx = jnp.where(act & mx, tx + adx, tx)
                ty = jnp.where(act & my, ty + ady, ty)
                tz = jnp.where(act & mz, tz + adz, tz)
                return (ix, iy, iz, tx, ty, tz, hit, t)

            c = (ix, iy, iz, tx, ty, tz, jnp.zeros(ox.shape, jnp.bool_),
                 jnp.zeros(ox.shape, f32))
            c = jax.lax.fori_loop(0, STEPS, body, c)
            hit_ref[:] = c[6].astype(i32)
            t_ref[:] = c[7]

        @jax.jit
        def run7(tab, o, d):
            return pl.pallas_call(
                kern7, interpret=INTERPRET,
                grid=(o.shape[1] // 8,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 6,
                out_specs=tuple(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                             memory_space=pltpu.VMEM)
                                for _ in range(2)),
                out_shape=(jax.ShapeDtypeStruct(o.shape[1:], jnp.int32),
                           jax.ShapeDtypeStruct(o.shape[1:], jnp.float32)),
            )(tab, o[0], o[1], o[2], d[0], d[1], d[2])

        o_np = rng.uniform(0, 64, (3, B // 128, 128)).astype(np.float32)
        d_np = rng.normal(size=(3, B // 128, 128)).astype(np.float32)
        d_np /= np.linalg.norm(d_np, axis=0, keepdims=True)
        o, d = jnp.asarray(o_np), jnp.asarray(d_np)
        dt = timeit(lambda: run7(tab, o, d), reps=5)
        hit, t = run7(tab, o, d)
        rec(kind="p7_coarse_dda", B=B, steps=STEPS, ms=round(dt * 1e3, 2),
            mrays_s=round(B / dt / 1e6, 1),
            g_step_s=round(B * STEPS / dt / 1e9, 2),
            hits=int(jnp.sum(hit)))
    except Exception as e:
        rec(kind="p7_coarse_dda", error=_err(e))

    # ---------------- P8: dynamic HBM DMA chain ----------------
    try:
        NBLK = 4096
        hbm = jnp.asarray(rng.integers(0, 1 << 20, (NBLK * 8, 128), np.int32))
        KD = 64

        def kern8(hbm_ref, idx_ref, out_ref):
            def body(scratch, sem):
                def step(k, acc):
                    blk = acc & (NBLK - 1)
                    dma = pltpu.make_async_copy(
                        hbm_ref.at[pl.ds(blk * 8, 8), :], scratch, sem)
                    dma.start()
                    dma.wait()
                    return acc + scratch[0, 0] + 1

                out_ref[0, 0] = jax.lax.fori_loop(0, KD, step, idx_ref[0, 0])

            pl.run_scoped(body, scratch=pltpu.VMEM((8, 128), jnp.int32),
                          sem=pltpu.SemaphoreType.DMA(()))

        @jax.jit
        def run8(hbm, idx):
            return pl.pallas_call(
                kern8, interpret=INTERPRET,
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            )(hbm, idx)

        idx = jnp.zeros((1, 1), jnp.int32)
        dt = timeit(lambda: run8(hbm, idx), reps=10)
        rec(kind="p8_dma_chain", K=KD, us=round(dt * 1e6, 1),
            us_per_dma=round(dt * 1e6 / KD, 2))
    except Exception as e:
        rec(kind="p8_dma_chain", error=_err(e))

    out_f.close()


if __name__ == "__main__":
    main()
