"""Diagnose the gate's 0.78 hit agreement on random interior rays:
is it the 96-round cap (each occupied-brick crossing costs one round
at extra=0), and does raising max_rounds or in-kernel continuation
(extra>0) close it?"""
import sys as _sys
for _m in [m for m in list(_sys.modules)
           if _m.startswith("svo_raytracer_tpu") or _m == "bench"]:
    del _sys.modules[_m]
import json, os, sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, REPO)
from svo_raytracer_tpu.ops import brick_scene, brick_trace
from svo_raytracer_tpu.ops import wavefront as wf

def out(**kw): print(json.dumps(kw), flush=True)
CACHE = os.path.join(REPO, ".bench_cache")
b = np.load(os.path.join(CACHE, "bricks_1024.npz"))
scene = brick_scene.BrickScene(world_size=1024, grid_size=32,
    n_mixed=int(b["n_mixed"]), l0_table=b["l0_table"],
    brick_slot=b["brick_slot"], brick_attr=b["brick_attr"],
    occ_words=b["occ_words"], attrs=b["attrs"])
W = wf.prepare(scene)
dscene = scene.to_device()

rs = np.random.RandomState(31)
n = 8192
o = (rs.rand(n, 3) * 0.9 + 1.05).astype(np.float32)
d = rs.randn(n, 3).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
ref = brick_trace.intersect_bricks(dscene, jnp.asarray(o), jnp.asarray(d))
rh = np.asarray(ref.hit)

for tag, kw in [("mr96", dict(max_rounds=96)),
                ("mr384", dict(max_rounds=384)),
                ("mr96_extra2", dict(max_rounds=96, extra=2)),
                ("mr384_extra2", dict(max_rounds=384, extra=2))]:
    prof = {}
    t0 = time.time()
    got = wf.intersect_wavefront(W, jnp.asarray(o), jnp.asarray(d),
                                 interpret=False, profile=prof, **kw)
    gh = np.asarray(got.hit)
    agree = float((rh == gh).mean())
    both = rh & gh
    tok = float((np.abs(np.asarray(ref.t) - np.asarray(got.t))[both]
                 <= 2e-4).mean()) if both.any() else 1.0
    rounds = prof.get("rounds", [])
    out(kind="gatediag", tag=tag, agree=round(agree, 5),
        t_ok=round(tok, 5), nhit=int(both.sum()),
        ref_hits=int(rh.sum()), got_hits=int(gh.sum()),
        rounds=len(rounds), last_active=rounds[-1]["active"] if rounds else -1,
        s=round(time.time() - t0, 1))
