"""Tune the staged frame renderer's knobs on the real chip.

Runs AFTER bench.py has cached the 1024^3 scene (.bench_cache).  One
long-lived process; results appended as JSON lines to
.bench_cache/tune_staged.jsonl so conclusions survive the session.

Knobs swept (see ops/traverse.intersect_octree_staged):
  round_steps  — fused steps between n_active syncs
  inner_steps  — steps fused inside one fori_loop body
  min_rows     — compaction floor
  use_beam     — beam prepass on/off
  row_block    — rows per frame slice (gather batch bound)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench_cache", "tune_staged.jsonl")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(OUT), "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import bench
    from svo_raytracer_tpu.ops import shade, traverse
    from svo_raytracer_tpu.utils.camera import Camera

    print(f"backend={jax.default_backend()}", flush=True)
    out_f = open(OUT, "a")

    def rec(**kw):
        out_f.write(json.dumps(kw) + "\n")
        out_f.flush()
        print(json.dumps(kw), flush=True)

    # R0: tunnel scalar d2h RTT
    x = jnp.zeros((8, 128), jnp.int32)
    s = jnp.sum(x)
    s.block_until_ready()
    t0 = time.time()
    for _ in range(20):
        s = jnp.sum(x)
        _ = int(jnp.sum(s))
    rtt = (time.time() - t0) / 20
    rec(kind="rtt", scalar_d2h_ms=rtt * 1e3)

    # scene (cached by bench.py)
    tree, load_s = bench.build_scene(1024, 512)
    tree = tree.to_device()
    packed = tree.packed_table()
    packed.block_until_ready()
    rec(kind="scene", nodes=int(tree.n_nodes), load_s=load_s)

    # G1: standalone random-gather throughput over the 16M-word table
    rng = np.random.default_rng(0)
    n = int(tree.n_nodes)
    g = jax.jit(lambda t, i: t[i])
    for bsz in (1 << 15, 1 << 18, 1 << 21):
        idx = jnp.asarray(rng.integers(0, n, bsz, dtype=np.int32)
                          ).reshape(-1, 128)
        out = g(packed, idx)
        out.block_until_ready()
        t0 = time.time()
        for _ in range(10):
            out = g(packed, idx)
        out.block_until_ready()
        dt = (time.time() - t0) / 10
        rec(kind="gather", batch=bsz, ms=round(dt * 1e3, 3),
            gelem_s=round(bsz / dt / 1e9, 4))

    # B1: _run_block cost vs rows and steps (latency- or throughput-bound?)
    from svo_raytracer_tpu.ops.traverse import (_run_block, _setup_jit)
    o = np.full((2048 * 128, 3), 1.5, np.float32)
    o += rng.random(o.shape).astype(np.float32) * 0.4
    d = rng.normal(size=o.shape).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    cone = jnp.asarray(False)
    for rows in (256, 1024, 2048):
        bsz = rows * 128
        st, cn = _setup_jit(jnp.asarray(o[:bsz]), jnp.asarray(d[:bsz]),
                            13, False, None, 13, packed)
        for steps in (64, 512):
            f = lambda: _run_block(st, cn, packed, cone, steps, 1500, 13)[0]
            f()["t_min"].block_until_ready()
            t0 = time.time()
            reps = 3 if steps == 512 else 10
            for _ in range(reps):
                out = f()
            out["t_min"].block_until_ready()
            dt = (time.time() - t0) / reps
            rec(kind="run_block", rows=rows, steps=steps,
                ms=round(dt * 1e3, 2),
                glanestep_s=round(rows * 128 * steps / dt / 1e9, 4))

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
        mrays = 2 * W * H / dt / 1e6
        rec(kind="staged", tag=tag, first_s=round(first, 2),
            frame_ms=round(dt * 1e3, 1), mrays=round(mrays, 1), **kw)
        return dt

    # legacy config = the committed bench default (7.07s frame on r1)
    measure("legacy", use_beam=True, round_steps=64, grow_rounds=False,
            pipeline=False)
    # new default: growing rounds + pipelined sync
    measure("grow+pipe", use_beam=True, round_steps=64)
    measure("grow-only", use_beam=True, round_steps=64, pipeline=False)
    # bigger slices: fewer per-frame staged calls (fewer sync chains)
    for rb in (270, 540, 1080):
        measure(f"rowblock{rb}", use_beam=True, round_steps=64, row_block=rb)
    measure("inner8", use_beam=True, round_steps=64, inner_steps=8)
    measure("rs128", use_beam=True, round_steps=128)
    measure("no-beam", use_beam=False, round_steps=64)
    measure("maxrs1024", use_beam=True, round_steps=64, max_round_steps=1024)
    out_f.close()


if __name__ == "__main__":
    main()
