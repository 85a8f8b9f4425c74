"""Build the 2048^3 New Zealand heightmap world (the reference's
chunked full-scale build, WorldGenerator.java:12-40 + Octree.java:237-250
scaled to the available 1024^2 DEM upsampled 2x) and render it through
the wavefront fast path (G=64 support).  Caches tree + bricks, saves
.svo, records build stats + frame times."""
import sys as _sys
for _m in [m for m in _sys.modules if m.startswith("svo_raytracer_tpu")]:
    del _sys.modules[_m]
import json, os, sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, REPO)
from svo_raytracer_tpu.core import svo_format
from svo_raytracer_tpu.models import heightmap as hm_mod
from svo_raytracer_tpu.models import world
from svo_raytracer_tpu.ops import brick_scene, shade
from svo_raytracer_tpu.ops import render_wave, wavefront as wf
from svo_raytracer_tpu.io.image import write_png
from svo_raytracer_tpu.utils.camera import Camera

f32 = jnp.float32
def out(**kw): print(json.dumps(kw), flush=True)
CACHE = os.path.join(REPO, ".bench_cache")
SIZE, CHUNK = 2048, 512

from PIL import Image
hm = np.asarray(Image.open("/root/reference/assets/heightmaps/nz.png"))
mm = np.asarray(Image.open("/root/reference/assets/matmaps/materials.png"))
mm = np.where(mm <= 3, mm, 1).astype(np.int32)
# upsample the 1024^2 DEM 2x bilinearly to 2048^2 (nzbig.png, the
# reference's full-res map, is absent from the mount)
hm2 = np.asarray(Image.fromarray(hm).resize((SIZE, SIZE), Image.BILINEAR))
mm2 = np.asarray(Image.fromarray(mm.astype(np.uint8)).resize(
    (SIZE, SIZE), Image.NEAREST)).astype(np.int32)
hm_j = jnp.asarray(hm2.astype(np.uint16))
mm_j = jnp.asarray(mm2)

tree_cache = os.path.join(CACHE, f"nz_{SIZE}_{CHUNK}.npz")
from svo_raytracer_tpu.core.octree import Octree
if os.path.exists(tree_cache):
    z = np.load(tree_cache)
    tree = Octree(child=z["child"], mask=z["mask"], value=z["value"],
                  normal=z["normal"], n_nodes=int(z["n_nodes"]),
                  world_size=SIZE)
    out(kind="nz2_tree", cached=True, nodes=tree.n_nodes)
else:
    def gen(origin):
        return hm_mod.generate_chunk_heightmap(
            hm_j, mm_j, jnp.asarray(origin, jnp.int32), chunk_size=CHUNK,
            height_scale=SIZE // 2)

    t0 = time.time()
    tree = world.build_world(SIZE, CHUNK, gen, chunk_capacity=1 << 24,
                             world_offset=(0, 0, 0), verbose=False)
    build_s = time.time() - t0
    tree = tree.to_numpy()
    np.savez(tree_cache + ".tmp.npz", child=tree.child[:tree.n_nodes],
             mask=tree.mask[:tree.n_nodes], value=tree.value[:tree.n_nodes],
             normal=tree.normal[:tree.n_nodes],
             n_nodes=np.asarray(tree.n_nodes))
    os.replace(tree_cache + ".tmp.npz", tree_cache)
    out(kind="nz2_tree", cached=False, nodes=tree.n_nodes,
        build_s=round(build_s, 1))
    out(kind="nz2_counts", **{k: int(v) for k, v in
                              tree.node_counts().items()})

svo_path = os.path.join(CACHE, f"nz_{SIZE}.svo")
if not os.path.exists(svo_path):
    t0 = time.time()
    svo_format.write_svo_file(tree, svo_path)
    out(kind="nz2_svo", mb=round(os.path.getsize(svo_path) / 1e6, 1),
        s=round(time.time() - t0, 1))

bcache = os.path.join(CACHE, f"bricks_nz_{SIZE}.npz")
if os.path.exists(bcache):
    bz = np.load(bcache)
    scene_h = brick_scene.BrickScene(
        world_size=SIZE, grid_size=SIZE // 32, n_mixed=int(bz["n_mixed"]),
        l0_table=bz["l0_table"], brick_slot=bz["brick_slot"],
        brick_attr=bz["brick_attr"], occ_words=bz["occ_words"],
        attrs=bz["attrs"])
    out(kind="nz2_bricks", cached=True, n_mixed=scene_h.n_mixed)
else:
    t0 = time.time()
    scene_h = brick_scene.brickify(tree)
    out(kind="nz2_brickify", s=round(time.time() - t0, 1),
        n_mixed=scene_h.n_mixed)
    np.savez(bcache + ".tmp.npz", n_mixed=scene_h.n_mixed,
             l0_table=scene_h.l0_table, brick_slot=scene_h.brick_slot,
             brick_attr=scene_h.brick_attr, occ_words=scene_h.occ_words,
             attrs=scene_h.attrs)
    os.replace(bcache + ".tmp.npz", bcache)

W = wf.prepare(scene_h)
jax.block_until_ready(W.attr_comb)
out(kind="nz2_prepared", capacity=W.capacity)

gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
po = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                     pxz[:, 1:]], axis=1)
pd = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wf.intersect_wavefront(W, jnp.asarray(po), jnp.asarray(pd),
                            interpret=False)
ts = np.asarray(pr.t)
best = int(np.argsort(ts)[len(ts) // 2])
surf_y = 1.999 - float(ts[best])
cam = Camera(pos=np.array([po[best, 0], min(surf_y + 0.08, 1.99),
                           po[best, 2]]))
cam.rotate(-0.25, 0.5)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
out(kind="nz2_camera", y=round(cam.pos[1], 3), surf=round(surf_y, 3))

os.makedirs(os.path.join(REPO, "assets", "renders"), exist_ok=True)
for mode, name in ((2, "nz2048_direct"), (0, "nz2048_gi")):
    t0 = time.time()
    col, depth, iters = render_wave.render_frame_wavefront(
        W, cam5, 480, 270, render_mode=mode, frame_number=3, gi_bounces=1,
        interpret=False)
    c = np.asarray(jnp.clip(col, 0, 1))
    out(kind=f"{name}_render", s=round(time.time() - t0, 1),
        mean=round(float(c.mean()), 4))
    write_png(os.path.join(REPO, "assets", "renders", f"{name}.png"), c)
# (1080p G=64 benchmark deferred — the G=64 Mosaic compiles at 10 ladder
# sizes would not fit the worker window; the 480x270 renders above prove
# the fast path end-to-end at 2048^3.)
