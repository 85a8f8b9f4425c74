"""Timing-harness validation: block_until_ready appears not to block
through the axon tunnel (040 reported 2M argsort at 0.04 ms).  Compare
three patterns; the chained + scalar-readback one cannot lie.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, REPO)


def out(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(0)
B = 1 << 21
key = jnp.asarray(rng.integers(0, 4096, B).astype(np.int32))

f = jax.jit(lambda k: jnp.argsort(k))

# p1: same input, block_until_ready (the 040 pattern)
x = f(key)
jax.block_until_ready(x)
t0 = time.time()
for _ in range(5):
    x = f(key)
jax.block_until_ready(x)
out(kind="p1_block", ms=round((time.time() - t0) / 5 * 1e3, 3))

# p2: same input, force scalar readback of last result
x = f(key)
_ = float(jnp.sum(x))
t0 = time.time()
for _ in range(5):
    x = f(key)
v = float(jnp.sum(x))
out(kind="p2_readback", ms=round((time.time() - t0) / 5 * 1e3, 3))

# p3: chained input (each rep depends on previous output) + readback
x = f(key)
_ = float(jnp.sum(x))
k2 = key
t0 = time.time()
for i in range(5):
    x = f(k2)
    k2 = (key + x) % 4096
v = float(jnp.sum(x))
out(kind="p3_chained", ms=round((time.time() - t0) / 5 * 1e3, 3))

# p4: per-rep readback (upper bound incl. sync each time)
t0 = time.time()
for i in range(5):
    x = f(key)
    _ = float(jnp.sum(x))
out(kind="p4_sync_each", ms=round((time.time() - t0) / 5 * 1e3, 3))

# sanity: the known-true dda32 measurement pattern, re-run identically
from svo_raytracer_tpu.ops import brick_dda

occ = rng.random((32, 32, 32)) < 0.08
tab = jnp.asarray(brick_dda.table_rows(brick_dda.pack_occupancy(occ)))
o = rng.uniform(0, 32, (B, 3)).astype(np.float32)
d = rng.normal(size=(B, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
oj, dj = jnp.asarray(o), jnp.asarray(d)
r = brick_dda.coarse_dda(tab, oj, dj, grid_size=32, max_steps=32,
                         interpret=False)
jax.block_until_ready(r)
t0 = time.time()
for _ in range(5):
    r = brick_dda.coarse_dda(tab, oj, dj, grid_size=32, max_steps=32,
                             interpret=False)
jax.block_until_ready(r)
out(kind="dda32_block", ms=round((time.time() - t0) / 5 * 1e3, 2))
t0 = time.time()
for _ in range(5):
    r = brick_dda.coarse_dda(tab, oj, dj, grid_size=32, max_steps=32,
                             interpret=False)
v = float(jnp.sum(r["steps"]))
out(kind="dda32_readback", ms=round((time.time() - t0) / 5 * 1e3, 2))
