"""Compiled-Pallas regression gate — run on the TPU each round.

Re-runs the tests/test_wavefront.py comparison COMPILED (interpret=False)
against the XLA brick reference on the cached 1024^3 bench scene, plus a
small camera-mode + static-schedule replay check, and appends one JSON
line per check to .bench_cache/gate.jsonl.  Mosaic lowering differences
(vs the interpret mode the CPU suite uses) are exactly what this catches.

Usage: drop into .tpu_jobs/ as a job (exec'd by scripts/tpu_worker.py,
which provides REPO in the namespace), or run standalone on a TPU host:
    python scripts/tpu_gate.py
"""
import json
import os
import sys
import time

if "REPO" not in dir():
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

for _m in [m for m in list(sys.modules) if m.startswith("svo_raytracer_tpu")]:
    del sys.modules[_m]

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from svo_raytracer_tpu.ops import brick_scene, brick_trace, shade  # noqa
from svo_raytracer_tpu.ops import wavefront as wf  # noqa: E402
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402

GATE = os.path.join(REPO, ".bench_cache", "gate.jsonl")


def emit(row):
    row["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(row), flush=True)
    with open(GATE, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    cache = os.path.join(REPO, ".bench_cache", "bricks_1024.npz")
    b = np.load(cache)
    scene = brick_scene.BrickScene(
        world_size=1024, grid_size=32, n_mixed=int(b["n_mixed"]),
        l0_table=b["l0_table"], brick_slot=b["brick_slot"],
        brick_attr=b["brick_attr"], occ_words=b["occ_words"],
        attrs=b["attrs"])
    W = wf.prepare(scene)
    dscene = scene.to_device()

    rs = np.random.RandomState(31)
    n = 8192
    o = (rs.rand(n, 3) * 0.9 + 1.05).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = brick_trace.intersect_bricks(dscene, jnp.asarray(o),
                                       jnp.asarray(d))
    t0 = time.time()
    got = wf.intersect_wavefront(W, jnp.asarray(o), jnp.asarray(d),
                                 interpret=False)
    rh, gh = np.asarray(ref.hit), np.asarray(got.hit)
    agree = float((rh == gh).mean())
    both = rh & gh
    tok = float((np.abs(np.asarray(ref.t) - np.asarray(got.t))[both]
                 <= 2e-4).mean()) if both.any() else 1.0
    vok = float((np.asarray(ref.value)[both]
                 == np.asarray(got.value)[both]).mean()) if both.any() else 1.0
    ok = agree >= 0.995 and tok >= 0.98 and vok >= 0.98
    emit(dict(kind="wavefront_vs_bricks_compiled", ok=bool(ok),
              hit_agree=round(agree, 5), t_ok=round(tok, 5),
              v_ok=round(vok, 5), nhit=int(both.sum()),
              s=round(time.time() - t0, 1)))

    # camera mode + static replay at a small resolution
    cam = Camera(pos=np.array([1.5, 1.6, 1.85]))
    cam.rotate(-0.35, 0.4)
    cam5 = jnp.asarray(cam.uniform(), jnp.float32)
    WD, HT = 256, 128
    du = shade.pixel_dirs_device(cam5, WD, HT)
    dirs = du / jnp.linalg.norm(du, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam5[0], dirs.shape)
    prof = {}
    r_dyn = wf.intersect_wavefront(W, origins, dirs, camera=(cam5, WD, HT),
                                   interpret=False, profile=prof)
    r_exp = wf.intersect_wavefront(W, origins, dirs, interpret=False)
    r_st, n_left = wf.intersect_wavefront(W, origins, dirs,
                                          camera=(cam5, WD, HT),
                                          interpret=False,
                                          schedule=prof["schedule"])
    cam_agree = float((np.asarray(r_dyn.hit) == np.asarray(r_exp.hit))
                      .mean())
    st_agree = float((np.asarray(r_st.hit) == np.asarray(r_dyn.hit)).mean())
    # replay may leave the same sub-0.01% stall residue the dynamic
    # loop itself retires as misses (render_wave._stale_tol semantics)
    ok2 = (cam_agree >= 0.999 and st_agree >= 0.999
           and int(n_left) <= max(8, (WD * HT) // 10000))
    emit(dict(kind="camera_and_static_compiled", ok=bool(ok2),
              cam_agree=round(cam_agree, 5), static_agree=round(st_agree, 5),
              n_left=int(n_left)))

    # sharded wavefront path, COMPILED (a 1-device tiles mesh on the real
    # chip: exercises the shard_map-wrapped Pallas ladder through Mosaic —
    # r2 only ever ran it interpret=True on the virtual CPU mesh)
    from svo_raytracer_tpu.parallel import mesh as mesh_mod  # noqa: E402
    from svo_raytracer_tpu.parallel import render_wave_sharded as rws  # noqa
    m1 = mesh_mod.tile_mesh(1)
    scheds = ((0, 0, 0),)
    render_sh = rws.make_wave_sharded_render(m1, W, WD, HT, scheds,
                                             render_mode=3, interpret=False)
    img_sh, nl_sh = render_sh(rws._warrays(W), cam5, 1)
    # zero-normal voxels decode to NaN normals BY DESIGN (stale-mask
    # GLSL parity quirk) and mode 3 shows them raw — sanitize before
    # the finite/hit checks
    img_sh = np.nan_to_num(np.asarray(img_sh), nan=0.5)
    ref_img = np.asarray(r_dyn.hit).reshape(HT, WD)
    sh_hit = img_sh.sum(-1) > 0
    sh_agree = float((sh_hit == ref_img).mean())
    ok3 = (int(nl_sh) <= max(8, (WD * HT) // 10000) and sh_agree >= 0.995
           and np.isfinite(img_sh).all())
    emit(dict(kind="sharded_wavefront_compiled", ok=bool(ok3),
              hit_agree=round(sh_agree, 5), n_left=int(nl_sh)))

    # K-hit differentiable chain, COMPILED (VERDICT r3 weak #3: every
    # wave_diff test and the multichip dryrun ran interpret=True — the
    # r2 lesson is that interpret green proves nothing about Mosaic).
    # Compiled chain must equal the interpret chain field-for-field,
    # and a small compiled train step must produce a finite loss.
    from svo_raytracer_tpu.diff import wave_diff as wd  # noqa: E402
    warr = rws._warrays(W)
    t0 = time.time()
    K = 2
    Bd = WD * HT
    ch_c = wd.khit_chain(warr, origins, dirs, K, W.grid_size, 1024,
                         W.capacity, interpret=False)
    ch_i = wd.khit_chain(warr, origins, dirs, K, W.grid_size, 1024,
                         W.capacity, interpret=True)
    aidx_eq = float((np.asarray(ch_c.aidx) == np.asarray(ch_i.aidx)).mean())
    hitm_eq = float((np.asarray(ch_c.hitm) == np.asarray(ch_i.hitm)).mean())
    params = wd.init_params(W)
    step = wd.make_wave_train_step(W, WD, HT, K=K, interpret=False)
    tgt = jnp.zeros((HT, WD, 3), jnp.float32)
    t1 = time.time()
    params2, loss = step(params, warr, cam5, tgt)
    jax.block_until_ready(loss)
    compile_step_s = time.time() - t1
    t2 = time.time()
    params2, loss = step(params2, warr, cam5, tgt)
    jax.block_until_ready(loss)
    step_ms = (time.time() - t2) * 1e3
    ok4 = (aidx_eq >= 0.999 and hitm_eq >= 0.999
           and bool(np.isfinite(float(loss))))
    emit(dict(kind="wave_diff_compiled", ok=bool(ok4),
              aidx_eq=round(aidx_eq, 5), hitm_eq=round(hitm_eq, 5),
              loss=round(float(loss), 6), K=K, B=Bd,
              step_ms=round(step_ms, 1),
              compile_s=round(compile_step_s + t1 - t0, 1)))

    if not (ok and ok2 and ok3 and ok4):
        raise AssertionError("gate FAILED — see gate.jsonl")
    print("gate OK")


main()
