"""TPU diagnostics round 2: isolate the per-frame costs.

Experiments (all on the cached 1024^3 scene, one process):
  A. mode-3 render (single traversal) WITH vs WITHOUT scene-cached packed
     table -> measures the 8-scatter make_packed_table per-frame cost.
  B. iteration statistics of the primary-ray batch (max/mean/quantiles) ->
     how bad is the lock-step convoy (all lanes run to the slowest ray)?
  C. row-blocked rendering: split the frame into K row blocks, each its own
     while_loop -> convoy cost only within a block.
  D. inner_steps sensitivity: 8 vs 32 fused steps per outer check.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def timeit(f, n=3):
    out = f()
    out[0].block_until_ready() if isinstance(out, tuple) else out.block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = f()
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
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
    print(f"scene ready ({tree.n_nodes} nodes)", flush=True)

    cam = Camera(pos=np.array([1.35, 1.40, 1.35]))
    cam.rotate(-0.35, 0.4)
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)

    W, H = 480, 270

    t0 = time.time()
    packed = tree.packed_table()
    packed.block_until_ready()
    print(f"packed_table build: {time.time()-t0:.2f}s", flush=True)

    # --- A: packed cached vs derived per frame -----------------------------
    def f_nopack():
        c, _, _ = shade.render_image(tree.arrays(), cam5, W, H, render_mode=3)
        return c

    def f_pack():
        c, _, _ = shade.render_image(tree.arrays(), cam5, W, H, render_mode=3,
                                     packed=packed)
        return c

    print(f"A: mode3 {W}x{H} no-pack {timeit(f_nopack)*1e3:.1f} ms, "
          f"packed {timeit(f_pack)*1e3:.1f} ms", flush=True)

    # --- B: iteration statistics ------------------------------------------
    dirs = shade.pixel_dirs_device(cam5, W, H)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam5[0], dirs.shape)

    @jax.jit
    def iter_stats(o, d):
        res = traverse.intersect_octree(tree.arrays(), o, d, packed=packed)
        it = res.iters.astype(jnp.float32)
        qs = jnp.quantile(it, jnp.asarray([0.5, 0.9, 0.99, 1.0]))
        return qs, jnp.mean(it), jnp.mean(res.hit.astype(jnp.float32))

    qs, mean_it, hit_rate = jax.device_get(iter_stats(origins, dirs))
    print(f"B: iters p50/p90/p99/max={np.round(qs,1)} mean={mean_it:.1f} "
          f"hit_rate={hit_rate:.3f}", flush=True)

    # --- C: row-blocked traversal -----------------------------------------
    for k in (1, 4, 16):
        rows = H // k

        def f_blocked():
            outs = []
            for b in range(k):
                o = origins[b * rows * W:(b + 1) * rows * W]
                d = dirs[b * rows * W:(b + 1) * rows * W]
                res = traverse.intersect_octree(tree.arrays(), o, d,
                                                packed=packed)
                outs.append(res.t)
            return jnp.concatenate(outs)

        print(f"C: {k} blocks -> {timeit(f_blocked)*1e3:.1f} ms", flush=True)

    # --- D: inner_steps ----------------------------------------------------
    for s in (4, 8, 16, 32):
        def f_is():
            res = traverse.intersect_octree(tree.arrays(), origins, dirs,
                                            packed=packed, inner_steps=s)
            return res.t

        print(f"D: inner_steps={s} -> {timeit(f_is)*1e3:.1f} ms", flush=True)

    # --- E: pure gather bandwidth probe ------------------------------------
    n = origins.shape[0]
    idx = jnp.asarray((np.random.default_rng(0)
                       .integers(0, tree.n_nodes, n)).astype(np.int32))

    @jax.jit
    def g(idx):
        x = idx
        for _ in range(100):
            x = packed[x] % jnp.int32(tree.n_nodes)
        return x

    dt = timeit(lambda: g(idx))
    print(f"E: 100 chained gathers of {n} -> {dt*1e3:.1f} ms "
          f"({100*n/dt/1e9:.2f} G elem/s)", flush=True)


if __name__ == "__main__":
    main()
