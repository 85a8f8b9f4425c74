import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, REPO)
from svo_raytracer_tpu.core.octree import Octree
from svo_raytracer_tpu.ops import brick_pallas, brick_scene, brick_trace
from svo_raytracer_tpu.ops import shade, traverse
from svo_raytracer_tpu.utils.camera import Camera

CACHE = os.path.join(REPO, ".bench_cache")
z = np.load(os.path.join(CACHE, "terrain_1024_512.npz"))
tree = Octree(child=z["child"], mask=z["mask"], value=z["value"],
              normal=z["normal"], n_nodes=int(z["n_nodes"]), world_size=1024)
print("nodes:", tree.n_nodes, flush=True)

bs_cache = os.path.join(CACHE, "bricks_1024.npz")
t0 = time.time()
if os.path.exists(bs_cache):
    b = np.load(bs_cache)
    scene_h = brick_scene.BrickScene(
        world_size=1024, grid_size=32, n_mixed=int(b["n_mixed"]),
        l0_table=b["l0_table"], brick_slot=b["brick_slot"],
        brick_attr=b["brick_attr"], occ_words=b["occ_words"],
        attrs=b["attrs"])
else:
    scene_h = brick_scene.brickify(tree)
    np.savez(bs_cache, n_mixed=scene_h.n_mixed, l0_table=scene_h.l0_table,
             brick_slot=scene_h.brick_slot, brick_attr=scene_h.brick_attr,
             occ_words=scene_h.occ_words, attrs=scene_h.attrs)
print(f"brickify: {time.time()-t0:.1f}s n_mixed={scene_h.n_mixed} "
      f"payload={scene_h.n_mixed*132//1024} MB", flush=True)
scene = scene_h.to_device()

# camera like bench.py: probe terrain surface with a few downward rays
dev = tree.to_device()
gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
probe_o = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                          pxz[:, 1:]], axis=1)
probe_d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
probe = brick_trace.intersect_bricks(scene, jnp.asarray(probe_o),
                                     jnp.asarray(probe_d))
ts = np.asarray(probe.t)
best = int(np.argmax(ts))
surf_y = 1.999 - float(ts[best])
cam = Camera(pos=np.array([probe_o[best, 0], min(surf_y + 0.05, 1.99),
                           probe_o[best, 2]]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
print("camera ok", flush=True)

W, H = 1920, 1080
dirs_un = shade.pixel_dirs_device(cam5, W, H)
dirs = dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True)
origins = jnp.broadcast_to(cam5[0], dirs.shape)

t0 = time.time()
res = brick_pallas.intersect_bricks_tpu(scene, origins, dirs,
                                        interpret=False)
jax.block_until_ready(res.hit)
print(json.dumps(dict(kind="wavefront_compile_s",
                      s=round(time.time() - t0, 1))), flush=True)

t0 = time.time()
reps = 5
for _ in range(reps):
    res = brick_pallas.intersect_bricks_tpu(scene, origins, dirs,
                                            interpret=False)
jax.block_until_ready(res.hit)
dt = (time.time() - t0) / reps
B = W * H
print(json.dumps(dict(kind="wavefront_primary", B=B, ms=round(dt * 1e3, 1),
                      mrays=round(B / dt / 1e6, 1))), flush=True)
hits = float(jnp.mean(res.hit.astype(jnp.float32)))
print(json.dumps(dict(kind="wavefront_hitfrac", frac=round(hits, 4))),
      flush=True)

# sanity: subsample vs the XLA brick reference (same scene format)
idx = np.random.default_rng(0).integers(0, B, 2048)
o_s = origins[idx]
d_s = dirs[idx]
ref = brick_trace.intersect_bricks(scene, o_s, d_s)
got = jax.tree.map(lambda a: a[idx], res)
agree = float(jnp.mean((ref.hit == got.hit).astype(jnp.float32)))
tdiff = float(jnp.max(jnp.where(ref.hit & got.hit,
                                jnp.abs(ref.t - got.t), 0.0)))
vagree = float(jnp.mean(jnp.where(ref.hit & got.hit,
                                  (ref.value == got.value), True)
                        .astype(jnp.float32)))
print(json.dumps(dict(kind="wavefront_sanity", hit_agree=round(agree, 4),
                      max_tdiff=round(tdiff, 6),
                      value_agree=round(vagree, 4))), flush=True)

# full GI frame (mode 0): primary + 1 bounce via the brick isect
import functools
isect = functools.partial(brick_pallas.intersect_bricks_tpu, scene,
                          interpret=False)
px = jnp.tile(jnp.arange(W, dtype=jnp.float32), H)
py = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)
t0 = time.time()
col, depth, iters = shade.shade_gi(None, origins, dirs, px, py, 1,
                                   gi_bounces=1, intersect_fn=isect)
jax.block_until_ready(col)
print(json.dumps(dict(kind="gi_first_s", s=round(time.time() - t0, 1))),
      flush=True)
t0 = time.time()
for i in range(3):
    col, depth, iters = shade.shade_gi(None, origins, dirs, px, py, i + 2,
                                       gi_bounces=1, intersect_fn=isect)
jax.block_until_ready(col)
dt = (time.time() - t0) / 3
print(json.dumps(dict(kind="gi_frame", ms=round(dt * 1e3, 1),
                      mrays=round(2 * B / dt / 1e6, 1))), flush=True)
