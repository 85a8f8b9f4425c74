"""Build the New Zealand heightmap world from the reference's real
assets (assets/heightmaps/nz.png + assets/matmaps/materials.png — the
8192^2 nzbig variants are absent from the mount, so 1024^3 is the full
available resolution, 1:1 texel:column like WorldGenerator.java:24-26).
Cache tree + bricks, save .svo, render wavefront frames, record stats.
"""
import sys as _sys
for _m in [m for m in _sys.modules if m.startswith("svo_raytracer_tpu")]:
    del _sys.modules[_m]

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, REPO)
from svo_raytracer_tpu.core import svo_format
from svo_raytracer_tpu.models import heightmap as hm_mod
from svo_raytracer_tpu.models import world
from svo_raytracer_tpu.ops import brick_scene, shade
from svo_raytracer_tpu.ops import render_wave, wavefront as wf
from svo_raytracer_tpu.io.image import write_png
from svo_raytracer_tpu.utils.camera import Camera

f32, i32 = jnp.float32, jnp.int32


def out(**kw):
    print(json.dumps(kw), flush=True)


CACHE = os.path.join(REPO, ".bench_cache")
REF = "/root/reference/assets"

from PIL import Image

hm = np.asarray(Image.open(os.path.join(REF, "heightmaps/nz.png")))
mm = np.asarray(Image.open(os.path.join(REF, "matmaps/materials.png")))
mm = np.where(mm <= 3, mm, 1).astype(np.int32)  # sanitize stray ids
hm_j = jnp.asarray(hm.astype(np.uint16))
mm_j = jnp.asarray(mm)

tree_cache = os.path.join(CACHE, "nz_1024_512.npz")
if os.path.exists(tree_cache):
    from svo_raytracer_tpu.core.octree import Octree

    z = np.load(tree_cache)
    tree = Octree(child=z["child"], mask=z["mask"], value=z["value"],
                  normal=z["normal"], n_nodes=int(z["n_nodes"]),
                  world_size=1024)
    out(kind="nz_tree", cached=True, nodes=tree.n_nodes)
else:
    def gen(origin):
        return hm_mod.generate_chunk_heightmap(
            hm_j, mm_j, jnp.asarray(origin, jnp.int32), chunk_size=512,
            height_scale=512)

    t0 = time.time()
    tree = world.build_world(1024, 512, gen, chunk_capacity=1 << 24,
                             world_offset=(0, 0, 0), verbose=False)
    build_s = time.time() - t0
    tree = tree.to_numpy()
    np.savez(tree_cache + ".tmp.npz", child=tree.child[:tree.n_nodes],
             mask=tree.mask[:tree.n_nodes], value=tree.value[:tree.n_nodes],
             normal=tree.normal[:tree.n_nodes],
             n_nodes=np.asarray(tree.n_nodes))
    os.replace(tree_cache + ".tmp.npz", tree_cache)
    out(kind="nz_tree", cached=False, nodes=tree.n_nodes,
        build_s=round(build_s, 1))
    counts = tree.node_counts()
    out(kind="nz_counts", **{k: int(v) for k, v in counts.items()})

# .svo snapshot (the WorldGenerator.java:39 debug.svo analog)
svo_path = os.path.join(CACHE, "nz_1024.svo")
if not os.path.exists(svo_path):
    t0 = time.time()
    svo_format.write_svo_file(tree, svo_path)
    out(kind="nz_svo", mb=round(os.path.getsize(svo_path) / 1e6, 1),
        s=round(time.time() - t0, 1))

bcache = os.path.join(CACHE, "bricks_nz_1024.npz")
if os.path.exists(bcache):
    bz = np.load(bcache)
    scene_h = brick_scene.BrickScene(
        world_size=1024, grid_size=32, n_mixed=int(bz["n_mixed"]),
        l0_table=bz["l0_table"], brick_slot=bz["brick_slot"],
        brick_attr=bz["brick_attr"], occ_words=bz["occ_words"],
        attrs=bz["attrs"])
else:
    t0 = time.time()
    scene_h = brick_scene.brickify(tree)
    out(kind="nz_brickify", s=round(time.time() - t0, 1),
        n_mixed=scene_h.n_mixed)
    np.savez(bcache + ".tmp.npz", n_mixed=scene_h.n_mixed,
             l0_table=scene_h.l0_table, brick_slot=scene_h.brick_slot,
             brick_attr=scene_h.brick_attr, occ_words=scene_h.occ_words,
             attrs=scene_h.attrs)
    os.replace(bcache + ".tmp.npz", bcache)

W = wf.prepare(scene_h)
jax.block_until_ready(W.attr_comb)

# camera over a scenic spot: probe a grid, pick a mid-height column
gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
probe_o = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                          pxz[:, 1:]], axis=1)
probe_d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wf.intersect_wavefront(W, jnp.asarray(probe_o), jnp.asarray(probe_d),
                            interpret=False)
ts = np.asarray(pr.t)
best = int(np.argsort(ts)[len(ts) // 2])  # median column: on a hillside
surf_y = 1.999 - float(ts[best])
cam = Camera(pos=np.array([probe_o[best, 0], min(surf_y + 0.08, 1.99),
                           probe_o[best, 2]]))
cam.rotate(-0.25, 0.5)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
out(kind="nz_camera", y=round(cam.pos[1], 3), surf=round(surf_y, 3))

os.makedirs(os.path.join(REPO, "assets", "renders"), exist_ok=True)
for mode, name in ((2, "nz_direct"), (0, "nz_gi")):
    t0 = time.time()
    col, depth, iters = render_wave.render_frame_wavefront(
        W, cam5, 480, 270, render_mode=mode, frame_number=3, gi_bounces=1,
        interpret=False)
    c = np.asarray(jnp.clip(col, 0, 1))
    out(kind=f"{name}_render", s=round(time.time() - t0, 1),
        mean=round(float(c.mean()), 4))
    write_png(os.path.join(REPO, "assets", "renders", f"{name}.png"), c)

# full-res GI benchmark on the NZ world
WD, HT = 1920, 1080
B = WD * HT
col, d_, it_ = render_wave.render_frame_wavefront(
    W, cam5, WD, HT, render_mode=0, frame_number=1, gi_bounces=1,
    interpret=False)
_ = float(jnp.sum(col))
t0 = time.time()
for i in range(3):
    col, d_, it_ = render_wave.render_frame_wavefront(
        W, cam5, WD, HT, render_mode=0, frame_number=i + 2, gi_bounces=1,
        interpret=False)
_ = float(jnp.sum(col))
dt = (time.time() - t0) / 3
out(kind="nz_gi_frame", ms=round(dt * 1e3, 1),
    mrays=round(2 * B / dt / 1e6, 1))
