"""r4 job 145: 16-spp progressive accumulation at NATIVE 2048^3
(VERDICT item 7's capability proof: working progressive accumulation +
mixed diffuse/mirror materials at 2048^3 on-chip — the reference left
accumulation disabled, svotrace.comp:712-719).

Scene: cached NZ heightmap world (the perlin scene_4 world build stays
gated on a device-side voxels->bricks path; PERF_NOTES r4).  Renders
1920x1080, glsl RNG, mirror material 2 (scree), running average over 16
frames exactly like apps/viewer.py mode-0 accumulation.
"""
import json
import os
import sys
import time

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from svo_raytracer_tpu.ops import brick_scene, render_wave  # noqa: E402
from svo_raytracer_tpu.ops import wavefront as wf  # noqa: E402
from svo_raytracer_tpu.io.image import write_png  # noqa: E402
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


CACHE = os.path.join(REPO, ".bench_cache")
bz = np.load(os.path.join(CACHE, "bricks_nz_2048.npz"))
scene = brick_scene.BrickScene(
    world_size=2048, grid_size=64, n_mixed=int(bz["n_mixed"]),
    l0_table=bz["l0_table"], brick_slot=bz["brick_slot"],
    brick_attr=bz["brick_attr"], occ_words=bz["occ_words"],
    attrs=bz["attrs"])
W2 = wf.prepare(scene)
out(kind="loaded", n_mixed=W2.n_mixed)

pxz = np.stack(np.meshgrid(np.linspace(1.2, 1.8, 5, dtype=np.float32),
                           np.linspace(1.2, 1.8, 5, dtype=np.float32),
                           indexing="ij"), -1).reshape(-1, 2)
po = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                     pxz[:, 1:]], axis=1)
pd = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wf.intersect_wavefront(W2, jnp.asarray(po), jnp.asarray(pd))
ts = np.asarray(pr.t)
best = int(np.argmax(ts))
cam = Camera(pos=np.array([po[best, 0],
                           min(1.999 - float(ts[best]) + 0.03, 1.99),
                           po[best, 2]]))
cam.rotate(-0.3, 0.5)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
WD, HT = 1920, 1080

accum = None
times = []
for spp in range(1, 17):
    t0 = time.time()
    col, dep, it = render_wave.render_frame_wavefront(
        W2, cam5, WD, HT, render_mode=0, frame_number=spp,
        gi_bounces=1, mirror_values=(2,))
    accum = col if accum is None else accum + (col - accum) / spp
    jax.block_until_ready(accum)
    dt = time.time() - t0
    times.append(dt)
    out(kind="spp_frame", spp=spp, s=round(dt, 2))
steady = float(np.median(times[3:]))
out(kind="spp16_summary", per_spp_ms=round(steady * 1e3, 1),
    total_s=round(sum(times), 1),
    mrays=round(2 * WD * HT / steady / 1e6, 3),
    residue=dict(render_wave.last_residue))
write_png(os.path.join(REPO, "assets", "renders",
                       "nz2048_gi_16spp_r4.png"),
          np.asarray(jnp.clip(accum, 0.0, 1.0)))
out(kind="png_written")
