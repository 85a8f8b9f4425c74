"""r5 job 230: K-hit differentiable train step at production resolution
(VERDICT r5 item 5).  One compiled K=2 train step at 960x540 on the
1024^3 bench scene: compile cost + steady step time, recorded to
gate.jsonl as wave_diff_960x540.
"""
import json
import os
import sys
import time

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from svo_raytracer_tpu.parallel import render_wave_sharded as rws  # noqa: E402
from svo_raytracer_tpu.ops import wavefront as wf  # noqa: E402
from svo_raytracer_tpu.diff import wave_diff as wd  # noqa: E402
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402

GATE = os.path.join(REPO, ".bench_cache", "gate.jsonl")


def emit(row):
    row["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(row), flush=True)
    with open(GATE, "a") as f:
        f.write(json.dumps(row) + "\n")


tree, _ = bench.build_scene(1024, 512)
b0 = bench.build_brick_scene(tree, 1024)
W = wf.prepare(b0)
jax.block_until_ready(W.attr_comb)

WD, HT, K = 960, 540, 2
cam = Camera(pos=np.array([1.45, 1.62, 1.45]))
cam.rotate(-0.4, 0.5)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)

params = wd.init_params(W)
warr = rws._warrays(W)
step = wd.make_wave_train_step(W, WD, HT, K=K, interpret=False)
tgt = jnp.zeros((HT, WD, 3), jnp.float32)
t0 = time.time()
params2, loss = step(params, warr, cam5, tgt)
jax.block_until_ready(loss)
compile_s = time.time() - t0
t0 = time.time()
n = 3
for _ in range(n):
    params2, loss = step(params2, warr, cam5, tgt)
jax.block_until_ready(loss)
step_ms = (time.time() - t0) / n * 1e3
emit(dict(kind="wave_diff_960x540", K=K, B=WD * HT,
          step_ms=round(step_ms, 1), compile_s=round(compile_s, 1),
          loss=round(float(loss), 6),
          ok=bool(np.isfinite(float(loss)))))
print("done")
