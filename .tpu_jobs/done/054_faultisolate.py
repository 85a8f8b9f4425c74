"""Isolate the FailedPrecondition device fault from 053: run the round-0
kernel on the surface-camera workload, fori first (known-good pattern),
then the early-exit while_loop, at growing sizes.
"""
import sys as _sys
for _m in [m for m in _sys.modules if m.startswith("svo_raytracer_tpu")]:
    del _sys.modules[_m]

import json
import os
import sys
import time
import traceback

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
out(kind="prepared", capacity=W.capacity)

# surface camera (coordinates from 053: y=1.399 over surf 1.349 at 1.2,1.2)
cam = Camera(pos=np.array([1.2, 1.399, 1.2]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)

for rows in (128, 1080):
    WD, HT = 1920, rows
    B = WD * HT
    dirs_un = shade.pixel_dirs_device(cam5, WD, HT)
    dirs = dirs_un / jnp.linalg.norm(dirs_un, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam5[0], dirs.shape)
    st0 = wf._init_state(origins, dirs, jnp.ones(B, bool), 1024, B)
    S = st0[0].shape[0]
    none = jnp.full((S // wf.TILE, wf.KMAX), -1, i32)
    for early in (False, True):
        try:
            t0 = time.time()
            st = wf._run_kernel(none, none, W.l0_occ, W.l0_mixed,
                                W.occ_words, st0, G=32, NM=W.capacity,
                                inner_cap=100, l0_cap=100,
                                early_exit=early, interpret=False)
            act = float(jnp.sum((st[0] != wf.KEY_DONE).astype(f32)))
            c_s = time.time() - t0
            t0 = time.time()
            for _i in range(3):
                st = wf._run_kernel(none, none, W.l0_occ, W.l0_mixed,
                                    W.occ_words, st0, G=32, NM=W.capacity,
                                    inner_cap=100, l0_cap=100,
                                    early_exit=early, interpret=False)
            _ = float(jnp.sum(st[0].astype(f32)))
            out(kind="r0", rows=rows, early=early, compile_s=round(c_s, 1),
                ms=round((time.time() - t0) / 3 * 1e3, 1), active=int(act))
        except Exception as e:
            traceback.print_exc()
            out(kind="r0", rows=rows, early=early, error=repr(e)[:200])
            raise SystemExit(1)
