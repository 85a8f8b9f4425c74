"""local_round1 x defer_sync sweep with 056's probe camera (comparable
to 056's 698 ms primary / 1824 ms GI baselines).
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
from svo_raytracer_tpu.ops import brick_scene, shade
from svo_raytracer_tpu.ops import wavefront as wf
from svo_raytracer_tpu.utils.camera import Camera

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
jax.block_until_ready(W.attr_comb)

# 056's camera: probe 25 columns, deepest free fall
gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
probe_o = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                          pxz[:, 1:]], axis=1)
probe_d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wf.intersect_wavefront(W, jnp.asarray(probe_o), jnp.asarray(probe_d),
                            interpret=False)
ts = np.asarray(pr.t)
best = int(np.argmax(ts))
surf_y = 1.999 - float(ts[best])
cam = Camera(pos=np.array([probe_o[best, 0], min(surf_y + 0.05, 1.99),
                           probe_o[best, 2]]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
out(kind="camera", y=round(cam.pos[1], 4), surf=round(surf_y, 4))

WD, HT = 1920, 1080
B = WD * HT
dirs_un = shade.pixel_dirs_device(cam5, WD, HT)
dirs = dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True)
origins = jnp.broadcast_to(cam5[0], dirs.shape)
jax.block_until_ready(dirs)

for lr1, ds in ((False, False), (True, False), (False, True), (True, True)):
    res = wf.intersect_wavefront(W, origins, dirs, interpret=False,
                                 local_round1=lr1, defer_sync=ds)
    nh = float(jnp.sum(res.hit.astype(f32)))
    t0 = time.time()
    for _i in range(3):
        res = wf.intersect_wavefront(W, origins, dirs, interpret=False,
                                     local_round1=lr1, defer_sync=ds)
    nh = float(jnp.sum(res.hit.astype(f32)))
    dt = (time.time() - t0) / 3
    out(kind="primary_opt", local_r1=lr1, defer=ds, ms=round(dt * 1e3, 1),
        mrays=round(B / dt / 1e6, 1), hitfrac=round(nh / B, 4))

# profile with both on (exact actives recorded)
prof = {}
res = wf.intersect_wavefront(W, origins, dirs, interpret=False,
                             profile=prof)
for rr in prof["rounds"]:
    out(kind="round_profile", **rr)

from svo_raytracer_tpu.ops import render_wave

for gib, tag, f in ((1, "gi_frame", 2), (3, "gi3_frame", 4)):
    col, d_, it_ = render_wave.render_frame_wavefront(
        W, cam5, WD, HT, render_mode=0, frame_number=1, gi_bounces=gib,
        interpret=False)
    _ = float(jnp.sum(col))
    t0 = time.time()
    for i in range(3):
        col, d_, it_ = render_wave.render_frame_wavefront(
            W, cam5, WD, HT, render_mode=0, frame_number=i + 2,
            gi_bounces=gib, interpret=False)
    _ = float(jnp.sum(col))
    dt = (time.time() - t0) / 3
    out(kind=tag, ms=round(dt * 1e3, 1), mrays=round(f * B / dt / 1e6, 1))

# direct + normals + heatmap steady frames (mode coverage on-chip)
for mode in (2, 3, 1):
    col, d_, it_ = render_wave.render_frame_wavefront(
        W, cam5, WD, HT, render_mode=mode, interpret=False)
    _ = float(jnp.sum(col))
    t0 = time.time()
    for _i in range(3):
        col, d_, it_ = render_wave.render_frame_wavefront(
            W, cam5, WD, HT, render_mode=mode, interpret=False)
    _ = float(jnp.sum(col))
    dt = (time.time() - t0) / 3
    out(kind=f"mode{mode}_frame", ms=round(dt * 1e3, 1))
