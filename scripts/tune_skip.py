"""Measure the VMEM DDA skip on the real chip + the bench frame with it.

One long-lived TPU process (single-client tunnel).  Appends JSON lines to
.bench_cache/tune_skip.jsonl:
  1. coarse_dda (ops/brick_dda.py) compile + throughput at 2M rays, G=64
  2. skip stats on the bench camera's primary rays (skip fraction, miss
     fraction) — how much ESVO work the skip removes
  3. full 1080p mode-0 frame: skip off vs on (+ beam off variant)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench_cache", "tune_skip.jsonl")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(OUT), "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import bench
    from svo_raytracer_tpu.ops import brick_dda, shade, skip_grid, traverse
    from svo_raytracer_tpu.utils.camera import Camera

    print(f"backend={jax.default_backend()}", flush=True)
    out_f = open(OUT, "a")

    def rec(**kw):
        out_f.write(json.dumps(kw) + "\n")
        out_f.flush()
        print(json.dumps(kw), flush=True)

    tree, load_s = bench.build_scene(1024, 512)
    G = 32
    t0 = time.time()
    words = skip_grid.build_skip_grid(tree, grid_size=G)
    grid_build_s = time.time() - t0
    occ_frac = float((np.asarray(words).view(np.uint32) != 0).mean())
    tree = tree.to_device()
    tab = brick_dda.table_rows(words)
    tab.block_until_ready()
    packed = tree.packed_table()
    packed.block_until_ready()
    rec(kind="skip_grid", grid=G, build_s=round(grid_build_s, 2),
        occupied_word_frac=round(occ_frac, 4))

    # 1. kernel compile + throughput, 2M random rays
    rng = np.random.default_rng(0)
    B = 1 << 21
    o = rng.uniform(0, G, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    try:
        t0 = time.time()
        out = brick_dda.coarse_dda(tab, jnp.asarray(o), jnp.asarray(d),
                                   grid_size=G, interpret=False)
        out["hit"].block_until_ready()
        first = time.time() - t0
        t0 = time.time()
        for _ in range(5):
            out = brick_dda.coarse_dda(tab, jnp.asarray(o), jnp.asarray(d),
                                       grid_size=G)
        out["hit"].block_until_ready()
        dt = (time.time() - t0) / 5
        steps = int(jnp.sum(out["steps"]))
        rec(kind="dda_kernel", B=B, first_s=round(first, 2),
            ms=round(dt * 1e3, 2), mrays_s=round(B / dt / 1e6, 1),
            g_step_s=round(B * 3 * G / dt / 1e9, 2),
            mean_steps=round(steps / B, 1))
    except Exception as e:
        rec(kind="dda_kernel", error=f"{type(e).__name__}: {str(e)[:300]}")
        out_f.close()
        return

    # bench camera
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
    W, H = 1920, 1080

    # 2. skip stats on the primary rays
    dirs_un = shade.pixel_dirs_device(cam5, W, H)
    dirs = dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam5[0], dirs.shape)
    skip, maybe = skip_grid.skip_distances(tab, origins, dirs, grid_size=G)
    rec(kind="skip_stats",
        definite_miss_frac=round(1.0 - float(jnp.mean(maybe.astype(
            jnp.float32))), 4),
        mean_skip=round(float(jnp.sum(skip) / jnp.maximum(
            jnp.sum(maybe), 1)), 4))

    # 3. frames
    def frame(n, **kw):
        color, _, _ = shade.render_frame_staged(
            tree.arrays(), cam5, W, H, render_mode=0, frame_number=n,
            gi_bounces=1, packed=packed, **kw)
        return color

    def measure(tag, reps=3, **kw):
        t0 = time.time()
        frame(1, **kw).block_until_ready()
        first = time.time() - t0
        t0 = time.time()
        for i in range(reps):
            out = frame(i + 2, **kw)
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        rec(kind="frame", tag=tag, first_s=round(first, 2),
            frame_ms=round(dt * 1e3, 1),
            mrays=round(2 * W * H / dt / 1e6, 1), **{
                k: v for k, v in kw.items() if k != "skip_tab"})

    measure("skip+beam", use_beam=True, skip_tab=tab)
    measure("skip-nobeam", use_beam=False, skip_tab=tab)
    measure("noskip", use_beam=True)
    out_f.close()


if __name__ == "__main__":
    main()
