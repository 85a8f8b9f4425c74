"""TPU diagnostics round 3: gather formulations + realistic iteration stats.

The traversal is bound by random-gather throughput (sweep2 E: 0.14 G elem/s
chained).  Candidate fixes measured here:
  G1. gather cost vs batch size          (is it latency- or throughput-bound?)
  G2. gather cost vs table size          (does a cache-sized table help?)
  G3. row-gather: table (N/128, 128), fetch full 512 B rows, lane-select
  G4. sibling-group gather: table (N/8, 8), fetch 32 B child groups
  G5. 2-level: row-gather + take_along_axis vs direct, end-to-end step cost
  B2. iteration stats with the bench camera (probe-placed, like bench.py)
  S.  staged/compacting traversal vs plain while_loop at 480x270
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def timeit(f, n=5):
    out = f()
    out.block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = f()
    out.block_until_ready()
    return (time.time() - t0) / n


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(bench.CACHE_DIR, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from svo_raytracer_tpu.ops import shade, traverse
    from svo_raytracer_tpu.utils.camera import Camera

    tree, _ = bench.build_scene(1024, 512)
    tree = tree.to_device()
    N = tree.n_nodes
    packed = tree.packed_table()
    packed.block_until_ready()
    print(f"scene ready ({N} nodes)", flush=True)

    rng = np.random.default_rng(0)

    # --- G1: batch scaling on the 16M table --------------------------------
    for B in (16384, 131072, 1048576):
        idx = jnp.asarray(rng.integers(0, N, B).astype(np.int32))

        @jax.jit
        def g10(idx):
            x = idx
            for _ in range(10):
                x = packed[x] % jnp.int32(N)
            return x

        dt = timeit(lambda: g10(idx))
        print(f"G1 batch={B}: 10 gathers {dt*1e3:.2f} ms "
              f"({10*B/dt/1e9:.3f} G/s)", flush=True)

    # --- G2: table-size scaling (131072 batch) ------------------------------
    for T in (65536, 1048576, N):
        tab = packed[:T]
        idx = jnp.asarray(rng.integers(0, T, 131072).astype(np.int32))

        @jax.jit
        def g10t(idx, tab):
            x = idx
            for _ in range(10):
                x = tab[x] % jnp.int32(T)
            return x

        dt = timeit(lambda: g10t(idx, tab))
        print(f"G2 table={T}: 10 gathers {dt*1e3:.2f} ms "
              f"({10*131072/dt/1e9:.3f} G/s)", flush=True)

    # --- G3: row-gather (full 128-lane rows) --------------------------------
    Np = (N + 127) // 128 * 128
    tab2 = jnp.pad(packed[:N], (0, Np - N)).reshape(-1, 128)
    idx = jnp.asarray(rng.integers(0, N, 131072).astype(np.int32))

    @jax.jit
    def g_row(idx):
        x = idx
        for _ in range(10):
            rows = tab2[x >> 7]                      # (B, 128) row fetch
            v = jnp.take_along_axis(rows, (x & 127)[:, None], axis=1)[:, 0]
            x = v % jnp.int32(N)
        return x

    dt = timeit(lambda: g_row(idx))
    print(f"G3 row128: 10 gathers {dt*1e3:.2f} ms "
          f"({10*131072/dt/1e9:.3f} G/s)", flush=True)

    # --- G4: sibling-group rows of 8 ----------------------------------------
    Ng = (N + 7) // 8 * 8
    tab8 = jnp.pad(packed[:N], (0, Ng - N)).reshape(-1, 8)

    @jax.jit
    def g_row8(idx):
        x = idx
        for _ in range(10):
            rows = tab8[x >> 3]                      # (B, 8) group fetch
            v = jnp.take_along_axis(rows, (x & 7)[:, None], axis=1)[:, 0]
            x = v % jnp.int32(N)
        return x

    dt = timeit(lambda: g_row8(idx))
    print(f"G4 row8: 10 gathers {dt*1e3:.2f} ms "
          f"({10*131072/dt/1e9:.3f} G/s)", flush=True)

    # --- G4b: (R,128)-shaped 2-D indices (the kernel's actual shape) --------
    idx2 = idx.reshape(-1, 128)

    @jax.jit
    def g_2d(idx2):
        x = idx2
        for _ in range(10):
            x = packed[x] % jnp.int32(N)
        return x

    dt = timeit(lambda: g_2d(idx2))
    print(f"G4b 2d-idx direct: 10 gathers {dt*1e3:.2f} ms "
          f"({10*131072/dt/1e9:.3f} G/s)", flush=True)

    @jax.jit
    def g_row8_2d(idx2):
        x = idx2
        for _ in range(10):
            rows = tab8[(x >> 3).reshape(-1)]
            v = jnp.take_along_axis(rows, (x.reshape(-1) & 7)[:, None],
                                    axis=1)[:, 0]
            x = v.reshape(x.shape) % jnp.int32(N)
        return x

    dt = timeit(lambda: g_row8_2d(idx2))
    print(f"G4c row8 from 2d: 10 gathers {dt*1e3:.2f} ms "
          f"({10*131072/dt/1e9:.3f} G/s)", flush=True)

    # --- B2 + S: realistic camera ------------------------------------------
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
    dirs = shade.pixel_dirs_device(cam5, W, H)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam5[0], dirs.shape)

    @jax.jit
    def iter_stats(o, d):
        res = traverse.intersect_octree(tree.arrays(), o, d, packed=packed)
        it = res.iters.astype(jnp.float32)
        qs = jnp.quantile(it, jnp.asarray([0.5, 0.9, 0.99, 1.0]))
        return jnp.concatenate([qs, jnp.mean(it)[None],
                                jnp.mean(res.hit.astype(jnp.float32))[None]])

    st = jax.device_get(iter_stats(origins, dirs))
    print(f"B2: iters p50/p90/p99/max={np.round(st[:4],1)} mean={st[4]:.1f} "
          f"hit_rate={st[5]:.3f}", flush=True)

    def f_plain():
        res = traverse.intersect_octree(tree.arrays(), origins, dirs,
                                        packed=packed)
        return res.t

    print(f"S: plain {W}x{H}: {timeit(f_plain, 3)*1e3:.1f} ms", flush=True)

    for rs in (64, 128, 256):
        def f_staged():
            res = traverse.intersect_octree_staged(
                tree.arrays(), origins, dirs, packed=packed, round_steps=rs)
            return res.t

        print(f"S: staged rs={rs}: {timeit(f_staged, 3)*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
