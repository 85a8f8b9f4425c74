"""Rebuild the bench scene cache on CPU (keeps the single-client TPU tunnel
free for kernel experiments; the tunnel's ~1 MB/s device->host path makes
the on-chip build slower than a plain CPU build anyway)."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import bench  # noqa: E402

t0 = time.time()
tree, secs = bench.build_scene(1024, 512)
print(f"scene: {tree.n_nodes} nodes in {time.time() - t0:.0f}s", flush=True)
