"""Final adoption run for the r3 engine config (KMAX=8, ladder+drain@64,
serve_bulk=0): record 1080p schedules through the SAME render path the
driver bench uses, prove 20-frame invariance, time steady gi-1 and gi-3
frames, and persist version-tagged schedules to the bench cache AND the
checked-in snapshot."""
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


assert wavefront.KMAX == 8 and wavefront.DRAIN_TILES == 64
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
out(kind="camera", y=round(float(cam.pos[1]), 3))


def frame(n, bounces):
    color, _, _ = render_wave.render_frame_wavefront(
        wsc, cam5, width, height, render_mode=0, frame_number=n,
        gi_bounces=bounces)
    return color


t0 = time.time()
frame(1, 1).block_until_ready()
out(kind="first_frame_gi1", s=round(time.time() - t0, 1),
    scheds={"|".join(map(str, k)): list(v[0])
            for k, v in render_wave._SCHED.items()})

snap = dict(render_wave._SCHED)
rerecords = 0
t_frames = []
for n in range(2, 22):
    t0 = time.time()
    frame(n, 1).block_until_ready()
    t_frames.append(round(time.time() - t0, 3))
    if render_wave._SCHED != snap:
        rerecords += 1
        snap = dict(render_wave._SCHED)
out(kind="invariance", rerecords=rerecords, frame_s=t_frames)

N = 8
t0 = time.time()
for i in range(N):
    col = frame(2 + (i % 5), 1)
col.block_until_ready()
dt = (time.time() - t0) / N
out(kind="steady_gi1", frame_ms=round(dt * 1e3, 1),
    mrays=round(2 * width * height / dt / 1e6, 2))

t0 = time.time()
frame(1, 3).block_until_ready()
out(kind="first_frame_gi3", s=round(time.time() - t0, 1))
for n in range(2, 8):
    frame(n, 3).block_until_ready()
t0 = time.time()
for i in range(N):
    col3 = frame(2 + (i % 5), 3)
col3.block_until_ready()
dt3 = (time.time() - t0) / N
out(kind="steady_gi3", frame_ms=round(dt3 * 1e3, 1),
    mrays=round(4 * width * height / dt3 / 1e6, 2))

render_wave.save_schedules(os.path.join(CACHE, "wave_schedules.json"))
render_wave.save_schedules(os.path.join(
    REPO, "svo_raytracer_tpu", "data", "wave_schedules.json"))
out(kind="saved", n=len(render_wave._SCHED))

# beauty shot for assets/ (device->host of one 1080p f32 image ~ 25 MB
# at ~1 MB/s would stall; render a 960x540 preview instead)
col, _, _ = render_wave.render_frame_wavefront(
    wsc, cam5, 960, 540, render_mode=0, frame_number=5, gi_bounces=3)
img = np.clip(np.asarray(col) / 3.0, 0, 1)
from svo_raytracer_tpu.io.image import write_png  # noqa: E402
os.makedirs(os.path.join(REPO, "assets", "renders"), exist_ok=True)
write_png(os.path.join(REPO, "assets", "renders", "bench_gi3.png"), img)
out(kind="beauty", mean=round(float(img.mean()), 4))
