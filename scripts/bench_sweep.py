"""TPU probe: load the cached 1024^3 scene, render at increasing sizes and
modes, print per-config timing.  One long-lived process (the tunnel's
per-process warmup dominates); every result line flushes immediately.

Usage: python -u scripts/bench_sweep.py [--modes 2,0] [--sizes 480,960,1920]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    modes = [2, 0]
    sizes = [(480, 270), (960, 540), (1920, 1080)]
    for a in sys.argv[1:]:
        if a.startswith("--modes"):
            modes = [int(x) for x in a.split("=")[1].split(",")]
        if a.startswith("--sizes"):
            sizes = [(int(x), int(x) * 9 // 16)
                     for x in a.split("=")[1].split(",")]

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(bench.CACHE_DIR, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from svo_raytracer_tpu.ops import shade, traverse
    from svo_raytracer_tpu.utils.camera import Camera

    tree, build_s = bench.build_scene(1024, 512)
    tree = tree.to_device()
    print(f"scene ready ({tree.n_nodes} nodes, {build_s:.1f}s) on "
          f"{jax.devices()[0].platform}", flush=True)

    # same camera logic as bench.py
    gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
    pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
    probe_o = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                              pxz[:, 1:]], axis=1)
    probe_d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
    probe = traverse.intersect_octree(tree.arrays(), jnp.asarray(probe_o),
                                      jnp.asarray(probe_d))
    ts = np.asarray(probe.t)
    best = int(np.argmax(ts))
    surf_y = 1.999 - float(ts[best])
    cam = Camera(pos=np.array([probe_o[best, 0],
                               min(surf_y + 0.05, 1.99), probe_o[best, 2]]))
    cam.rotate(-0.35, 0.4)
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)
    print(f"camera ready y={cam.pos[1]:.3f}", flush=True)

    for (w, h) in sizes:
        for mode in modes:
            try:
                def frame(n):
                    c, _, _ = shade.render_image(
                        tree.arrays(), cam5, w, h, render_mode=mode,
                        frame_number=n, gi_bounces=1)
                    return c

                t0 = time.time()
                frame(1).block_until_ready()
                compile_s = time.time() - t0
                t0 = time.time()
                n = 3
                for i in range(n):
                    out = frame(i + 2)
                out.block_until_ready()
                dt = (time.time() - t0) / n
                segs = 2 if mode == 0 else (2 if mode == 2 else 1)
                mrays = segs * w * h / dt / 1e6
                print(f"RESULT mode={mode} {w}x{h}: {dt*1000:.1f} ms "
                      f"({mrays:.1f} Mrays/s, compile {compile_s:.1f}s)",
                      flush=True)
            except Exception as e:
                print(f"FAIL mode={mode} {w}x{h}: {type(e).__name__} "
                      f"{str(e)[:200]}", flush=True)
                raise


if __name__ == "__main__":
    main()
