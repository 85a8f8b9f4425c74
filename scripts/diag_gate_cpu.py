"""Reproduce the TPU gate's wavefront_vs_bricks comparison on CPU in
interpret mode: same cached 1024^3 scene, same RandomState(31) rays.
If hit_agree < 0.995 here too, the gate failure is semantic (not a
Mosaic lowering difference) and debuggable locally."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from svo_raytracer_tpu.ops import brick_scene, brick_trace  # noqa: E402
from svo_raytracer_tpu.ops import wavefront as wf  # noqa: E402

cache = os.path.join(REPO, ".bench_cache", "bricks_1024.npz")
b = np.load(cache)
scene = brick_scene.BrickScene(
    world_size=1024, grid_size=32, n_mixed=int(b["n_mixed"]),
    l0_table=b["l0_table"], brick_slot=b["brick_slot"],
    brick_attr=b["brick_attr"], occ_words=b["occ_words"], attrs=b["attrs"])
W = wf.prepare(scene)
dscene = scene.to_device()

rs = np.random.RandomState(31)
n = int(os.environ.get("N_RAYS", "2048"))
o_full = (rs.rand(8192, 3) * 0.9 + 1.05).astype(np.float32)
d_full = rs.randn(8192, 3).astype(np.float32)
d_full /= np.linalg.norm(d_full, axis=1, keepdims=True)
o, d = o_full[:n], d_full[:n]

print(f"tracing {n} rays, interpret=True ...", flush=True)
t0 = time.time()
ref = brick_trace.intersect_bricks(dscene, jnp.asarray(o), jnp.asarray(d))
print(f"oracle done {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
prof = {}
got = wf.intersect_wavefront(W, jnp.asarray(o), jnp.asarray(d),
                             interpret=True, profile=prof)
print(f"wavefront done {time.time()-t0:.1f}s rounds={len(prof['rounds'])}",
      flush=True)
rh, gh = np.asarray(ref.hit), np.asarray(got.hit)
agree = float((rh == gh).mean())
both = rh & gh
tok = float((np.abs(np.asarray(ref.t) - np.asarray(got.t))[both]
             <= 2e-4).mean()) if both.any() else 1.0
vok = float((np.asarray(ref.value)[both]
             == np.asarray(got.value)[both]).mean()) if both.any() else 1.0
print(f"hit_agree={agree:.5f} t_ok={tok:.5f} v_ok={vok:.5f} "
      f"nhit_both={int(both.sum())} ref_hits={int(rh.sum())} "
      f"got_hits={int(gh.sum())}", flush=True)
bad = np.nonzero(rh != gh)[0]
print(f"n_disagree={len(bad)}")
if len(bad):
    print("first disagreements (idx, ref_hit, got_hit, ref_t, got_t, "
          "got_iters):")
    it = np.asarray(got.iters)
    rt, gt = np.asarray(ref.t), np.asarray(got.t)
    for i in bad[:12]:
        print(f"  {i:5d} ref={bool(rh[i])} got={bool(gh[i])} "
              f"rt={rt[i]:.4f} gt={gt[i]:.4f} it={it[i]}")
    print("rounds profile:", [r["active"] for r in prof["rounds"]])
