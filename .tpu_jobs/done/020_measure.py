import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, REPO)
from svo_raytracer_tpu.ops import brick_dda

rng = np.random.default_rng(0)
B = 1 << 21

# (a) coarse DDA at G=32 over 2M rays — the L0 phase + the in-brick phase cost
occ = rng.random((32, 32, 32)) < 0.08
tab = jnp.asarray(brick_dda.table_rows(brick_dda.pack_occupancy(occ)))
o = rng.uniform(0, 32, (B, 3)).astype(np.float32)
d = rng.normal(size=(B, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
oj, dj = jnp.asarray(o), jnp.asarray(d)
for steps in (32, 96):
    out = brick_dda.coarse_dda(tab, oj, dj, grid_size=32, max_steps=steps,
                               interpret=False)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = brick_dda.coarse_dda(tab, oj, dj, grid_size=32,
                                   max_steps=steps, interpret=False)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    print(json.dumps(dict(kind="dda32", B=B, steps=steps, ms=round(dt * 1e3, 2),
                          mrays=round(B / dt / 1e6, 1),
                          g_lane_steps=round(B * steps / dt / 1e9, 2))))

# (b) argsort of 2M small int keys — the binning sort
keys = jnp.asarray(rng.integers(0, 4096, B).astype(np.int32))
f = jax.jit(lambda k: jnp.argsort(k))
x = f(keys)
jax.block_until_ready(x)
t0 = time.time()
for _ in range(10):
    x = f(keys)
jax.block_until_ready(x)
print(json.dumps(dict(kind="argsort", B=B, ms=round((time.time() - t0) * 100, 2))))

# (b2) sort+take (the full binning shuffle: 7 f32 fields re-ordered)
vals = jnp.asarray(rng.normal(size=(B, 8)).astype(np.float32))
g = jax.jit(lambda k, v: v[jnp.argsort(k)])
x = g(keys, vals)
jax.block_until_ready(x)
t0 = time.time()
for _ in range(10):
    x = g(keys, vals)
jax.block_until_ready(x)
print(json.dumps(dict(kind="argsort_take8", B=B,
                      ms=round((time.time() - t0) * 100, 2))))

# (c) XLA gather rate vs table size (attr-resolve alternative)
for Vm in (1 << 18, 1 << 21, 1 << 24, 1 << 27):
    tabg = jnp.asarray(rng.integers(0, 100, Vm).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, Vm, B).astype(np.int32))
    h = jax.jit(lambda t, i: jnp.sum(t[i]))
    r = h(tabg, idx)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(5):
        r = h(tabg, idx)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / 5
    print(json.dumps(dict(kind="gather", table_words=Vm, B=B,
                          ms=round(dt * 1e3, 2),
                          g_elem_s=round(B / dt / 1e9, 3))))
