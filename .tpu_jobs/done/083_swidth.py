"""Serve-width + sorted-serve sweep: measure the r3 perf fixes.

081 measured 15.1 s/frame with serve_width=1 + pixel-order gi serving —
pure dependent-DMA latency (~48 us x ~hundreds of cells/tile).  The
fixes: (a) V concurrent block DMAs per serve iteration, (b) gi segments
serve AFTER the global sort (tiles span ~16 cells, not hundreds).
This job times 1080p mode-3 (primary-only) and mode-0 (1-bounce GI)
frames at serve_width 4 and 8 on the 1024^3 bench scene."""
import json
import os
import sys
import time

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from svo_raytracer_tpu.ops import render_wave, wavefront  # noqa: E402
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


CACHE = os.path.join(REPO, ".bench_cache")
width, height = 1920, 1080
tree, _ = bench.build_scene(1024, 512)
wsc = wavefront.prepare(bench.build_brick_scene(tree, 1024))
jax.block_until_ready(wsc.attr_comb)

gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
probe_o = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                          pxz[:, 1:]], axis=1)
probe_d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
probe = wavefront.intersect_wavefront(wsc, jnp.asarray(probe_o),
                                      jnp.asarray(probe_d))
ts = np.asarray(probe.t)
best = int(np.argmax(ts))
cam = Camera(pos=np.array([probe_o[best, 0],
                           min(1.999 - float(ts[best]) + 0.05, 1.99),
                           probe_o[best, 2]]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)


def steady(mode, bounces, sw, n=5):
    def frame(k):
        col, _, _ = render_wave.render_frame_wavefront(
            wsc, cam5, width, height, render_mode=mode, frame_number=k,
            gi_bounces=bounces)
        return col

    t0 = time.time()
    frame(1).block_until_ready()
    first = time.time() - t0
    for k in range(2, 2 + n):
        frame(k).block_until_ready()
    t0 = time.time()
    for k in range(2, 2 + n):
        col = frame(k)
    col.block_until_ready()
    dt = (time.time() - t0) / n
    out(kind=f"steady_m{mode}b{bounces}_sw{sw}", first_s=round(first, 1),
        frame_ms=round(dt * 1e3, 1),
        mrays=round((bounces + 1) * width * height / dt / 1e6, 2))
    return dt


for sw in (4, 8):
    wavefront.DEFAULT_SERVE_WIDTH = sw
    steady(3, 0, sw)          # primary only (camera coherent, 1L serve)
    steady(0, 1, sw)          # prim + gi1 (gi serves after the sort)

render_wave.save_schedules(os.path.join(CACHE, "wave_schedules.json"))
render_wave.save_schedules(os.path.join(
    REPO, "svo_raytracer_tpu", "data", "wave_schedules.json"))
out(kind="saved", n=len(render_wave._SCHED))
