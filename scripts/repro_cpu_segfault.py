"""Minimal repro hunt for the CPU whole-suite segfault (VERDICT r4 item
7; workaround: tests/conftest.py per-module jax.clear_caches()).

r3 observation: ~160 heavyweight interpret-mode Pallas compiles in ONE
process segfault near the end of the full suite (reproducibly at the
same test, while any subset passes); bounding the cache with per-module
clear_caches() avoids it.  Hypothesis: unbounded growth of XLA:CPU
jit-compiled code + tracing caches (each distinct wavefront config
compiles a multi-MB CPU executable; the process accretes GBs).

This script replays that load synthetically: N distinct-shape
interpret-mode wavefront traces in one process, RSS logged each step,
clear_caches optionally disabled.  Run both modes:

    python scripts/repro_cpu_segfault.py 60            # no clearing
    python scripts/repro_cpu_segfault.py 60 --clear    # cleared every 10

If the first crashes (signal 11) where the second survives at flat RSS,
the leak is the accumulated compile cache and the conftest workaround is
the correct mitigation until jax/XLA:CPU bounds it upstream.
"""
import os
import resource
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from svo_raytracer_tpu.core import build_np  # noqa: E402
from svo_raytracer_tpu.ops import brick_scene, wavefront as wf  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
CLEAR = "--clear" in sys.argv

x, y, z = np.meshgrid(*(np.arange(32),) * 3, indexing="ij")
v = (np.sqrt((x - 16) ** 2 + (y - 16) ** 2 + (z - 16) ** 2) <= 9)
tree = build_np.build_octree_np(v.astype(np.uint8))
W = wf.prepare(brick_scene.brickify(tree))
rs = np.random.RandomState(0)

for i in range(N):
    # distinct B each iteration => a fresh trace + interpret compile,
    # like the suite's per-test shape variety
    B = 256 + 128 * i
    o = (rs.rand(B, 3) * 0.8 + 1.1).astype(np.float32)
    d = rs.randn(B, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = wf.intersect_wavefront(W, jnp.asarray(o), jnp.asarray(d),
                               interpret=True)
    jax.block_until_ready(r.t)
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    print(f"iter {i} B={B} rss={rss} MB", flush=True)
    if CLEAR and i % 10 == 9:
        jax.clear_caches()
print("survived", N, "compiles; clear =", CLEAR, flush=True)
