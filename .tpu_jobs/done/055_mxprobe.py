"""Why does the compiled round-0 kernel classify every L0 stop as
uniform (active=0)?  Probe the composite fetch + mixed classification
compiled, against host numpy truth.
"""
import sys as _sys
for _m in [m for m in _sys.modules if m.startswith("svo_raytracer_tpu")]:
    del _sys.modules[_m]

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, REPO)
from svo_raytracer_tpu.ops import brick_scene
from svo_raytracer_tpu.ops import wavefront as wf

f32, i32 = jnp.float32, jnp.int32


def out(**kw):
    print(json.dumps(kw), flush=True)


CACHE = os.path.join(REPO, ".bench_cache")
b = np.load(os.path.join(CACHE, "bricks_1024.npz"))
scene_h = brick_scene.BrickScene(
    world_size=1024, grid_size=32, n_mixed=int(b["n_mixed"]),
    l0_table=b["l0_table"], brick_slot=b["brick_slot"],
    brick_attr=b["brick_attr"], occ_words=b["occ_words"], attrs=b["attrs"])
W = wf.prepare(scene_h)
G = 32

# host truth
slot_np = np.asarray(scene_h.brick_slot)
mixed_np = (slot_np >= 0)
mx_dev = np.asarray(W.l0_mixed)  # d2h of 4KB ok
from svo_raytracer_tpu.ops import brick_dda
mx_host = np.asarray(brick_dda.table_rows(brick_dda.pack_occupancy(
    mixed_np.reshape(G, G, G))))
out(kind="mx_table_equal", equal=bool((mx_dev == mx_host).all()),
    host_bits=int(bin(int.from_bytes(mx_host.astype(np.uint32).tobytes(),
                                     "little")).count("1")))

# compiled composite-fetch probe: fetch word w for 1024 query cells
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch_kernel(tab_ref, w_ref, out_ref):
    rows = [jnp.broadcast_to(tab_ref[r:r + 1, :], (8, 128))
            for r in range(tab_ref.shape[0])]
    w = w_ref[:]
    lane = w & 127
    r = w >> 7
    o = jnp.take_along_axis(rows[0], lane, axis=1)
    for k in range(1, len(rows)):
        o = jnp.where(r == k, jnp.take_along_axis(rows[k], lane, axis=1), o)
    out_ref[:] = o


rng = np.random.default_rng(0)
wq = rng.integers(0, 1024, (8, 128)).astype(np.int32)
got = jax.jit(lambda t, w: pl.pallas_call(
    fetch_kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(t, w))(
        W.l0_mixed, jnp.asarray(wq))
want = mx_host.reshape(-1)[wq]
ok = (np.asarray(got) == want).all()
out(kind="compiled_fetch", equal=bool(ok),
    n_bad=int((np.asarray(got) != want).sum()))

# round-0 kernel on rays aimed straight down at known MIXED columns
mix_cells = np.nonzero(mixed_np)[0]
pick = mix_cells[rng.integers(0, len(mix_cells), 1024)]
bx, by, bz = pick // (G * G), (pick // G) % G, pick % G
ox = (bx * 32 + 16).astype(np.float32)
oz = (bz * 32 + 16).astype(np.float32)
o = np.stack([1.0 + ox / 1024.0, np.full(1024, 1.999, np.float32),
              1.0 + oz / 1024.0], 1)
d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (1024, 1))
st0 = wf._init_state(jnp.asarray(o), jnp.asarray(d), jnp.ones(1024, bool),
                     1024, 1024)
none = jnp.full((1, wf.KMAX), -1, i32)
st = wf._run_kernel(none, none, W.l0_occ, W.l0_mixed, W.occ_words, st0,
                    G=32, NM=W.capacity, inner_cap=100, l0_cap=100,
                    early_exit=True, interpret=False)
key = np.asarray(st[0])
vox = np.asarray(st[8])
aidx = np.asarray(st[9])
n_stop_mixed = int((key[:1024] < (1 << 30)).sum())
n_done = int((key[:1024] >= (1 << 30)).sum())
n_hit_uniform = int(((key[:1024] >= (1 << 30)) & (vox[:1024] >= 0)
                     & (aidx[:1024] >= W.capacity * 32768)).sum())
n_hit_mixedattr = int(((key[:1024] >= (1 << 30)) & (vox[:1024] >= 0)
                       & (aidx[:1024] < W.capacity * 32768)).sum())
n_miss = int(((key[:1024] >= (1 << 30)) & (vox[:1024] < 0)).sum())
out(kind="r0_down_mixed_cols", stop_mixed=n_stop_mixed, done=n_done,
    hit_uniform=n_hit_uniform, hit_mixed=n_hit_mixedattr, miss=n_miss)
# which cells did stop-mixed rays report vs truth: a down ray from the
# top should stop at the topmost occupied brick of its column
col_occ = (mixed_np | ((np.asarray(scene_h.brick_attr) & 0xFF) != 0)
           ).reshape(G, G, G)
top = np.full(1024, -1)
for i in range(1024):
    ys = np.nonzero(col_occ[bx[i], :, bz[i]])[0]
    top[i] = ys.max() if len(ys) else -1
want_cell = (bx * G + top) * G + bz
n_cell_match = int(((key[:1024] == want_cell)
                    & (key[:1024] < (1 << 30))).sum())
out(kind="r0_cell_match", match=n_cell_match,
    want_mixed=int(mixed_np[np.clip(want_cell, 0, G**3 - 1)].sum()))
# interpret-mode comparison of the same kernel call
sti = wf._run_kernel(none, none, W.l0_occ, W.l0_mixed, W.occ_words, st0,
                     G=32, NM=W.capacity, inner_cap=100, l0_cap=100,
                     early_exit=True, interpret=True)
keyi = np.asarray(sti[0])
out(kind="interp_vs_compiled", key_equal=bool((keyi == key).all()),
    n_diff=int((keyi != key).sum()),
    interp_stop_mixed=int((keyi[:1024] < (1 << 30)).sum()))
