"""r5 job 220: paged-L0 at REAL scale (VERDICT r5 items 3/6).

Loads the host-built NZ 4096^3 / 8192^3 BrickScenes
(scripts/build_bigworlds.py -> .bench_cache/bricks_nz_{size}.npz),
gates hit-t against the closed-form heightmap surface (straight-down
probes: solid iff wy <= h, so the top face is at world y
1+(h+1)/size), then times frames and lands renders:

  * 4096^3: GI-1 960x540 + 1080p steady timings, 8-spp 1080p PNG
  * 8192^3 (attr16): primary normal-mode 1080p timing + PNG, one
    timed GI-1 960x540 frame for the record
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from svo_raytracer_tpu.ops import brick_scene, render_wave  # noqa: E402
from svo_raytracer_tpu.ops import wavefront as wf  # noqa: E402
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402
from svo_raytracer_tpu.io.image import write_png  # noqa: E402

CACHE = os.path.join(REPO, ".bench_cache")


def out(**kw):
    print(json.dumps(kw), flush=True)


def load_scene(size):
    p = os.path.join(CACHE, f"bricks_nz_{size}.npz")
    for _ in range(600):  # host build may still be running
        if os.path.exists(p):
            break
        time.sleep(10)
    z = np.load(p)
    return brick_scene.BrickScene(
        world_size=size, grid_size=size // 32, n_mixed=int(z["n_mixed"]),
        l0_table=z["l0_table"], brick_slot=z["brick_slot"],
        brick_attr=z["brick_attr"], occ_words=z["occ_words"],
        attrs=z["attrs"])


def expected_h(size):
    hm = np.asarray(Image.open("/root/reference/assets/heightmaps/nz.png"))
    hm_u = np.asarray(Image.fromarray(hm).resize((size, size),
                                                 Image.BILINEAR))
    return (hm_u.astype(np.float64) / 65536.0 * (size // 2)).astype(np.int64)


def probe_gate(W, size, h, n=512):
    rs = np.random.RandomState(3)
    vx = rs.randint(16, size - 16, n)
    vz = rs.randint(16, size - 16, n)
    o = np.stack([1 + (vx + 0.5) / size,
                  np.full(n, 1.999),
                  1 + (vz + 0.5) / size], 1).astype(np.float32)
    d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (n, 1))
    r = wf.intersect_wavefront(W, jnp.asarray(o), jnp.asarray(d))
    t = np.asarray(r.t)
    hit = np.asarray(r.hit)
    t_exp = 1.999 - (1 + (h[vx, vz] + 1) / size)
    ok = hit & (np.abs(t - t_exp) < 2e-3)
    return float(ok.mean()), float(hit.mean())


def place_cam(W):
    gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
    pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
    po = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                         pxz[:, 1:]], axis=1)
    pd = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
    pr = wf.intersect_wavefront(W, jnp.asarray(po), jnp.asarray(pd))
    ts = np.asarray(pr.t)
    best = int(np.argmax(ts))
    cam = Camera(pos=np.array([po[best, 0],
                               min(1.999 - float(ts[best]) + 0.05, 1.99),
                               po[best, 2]]))
    cam.rotate(-0.35, 0.4)
    return jnp.asarray(cam.uniform(), jnp.float32)


def steady(W, cam5, w, hgt, mode, bounces, n=3, f0=2):
    def frame(i):
        c, dep, it = render_wave.render_frame_wavefront(
            W, cam5, w, hgt, render_mode=mode, frame_number=i,
            gi_bounces=bounces)
        return c
    t0 = time.time()
    jax.block_until_ready(frame(1))
    first = time.time() - t0
    for i in range(f0, f0 + n):
        jax.block_until_ready(frame(i))
    t0 = time.time()
    for i in range(f0, f0 + n):
        c = frame(i)
    jax.block_until_ready(c)
    dt = (time.time() - t0) / n
    return c, round(dt * 1e3, 1), round(first, 1)


# ---------------- 4096^3 -------------------------------------------------
try:
    sc4 = load_scene(4096)
    W4 = wf.prepare(sc4)
    jax.block_until_ready(W4.attr_comb)
    out(kind="scene4096", n_mixed=int(W4.n_mixed))
    h4 = expected_h(4096)
    agree, hitf = probe_gate(W4, 4096, h4)
    out(kind="probe_gate_4096", t_agree=round(agree, 4),
        hitfrac=round(hitf, 4), ok=bool(agree >= 0.99))
    cam5 = place_cam(W4)
    _, ms, first = steady(W4, cam5, 960, 540, 0, 1)
    out(kind="gi1_4096_960x540", frame_ms=ms, first_s=first,
        mrays=round(2 * 960 * 540 / ms / 1e3, 2),
        residue=dict(render_wave.last_residue))
    _, ms, first = steady(W4, cam5, 1920, 1080, 0, 1)
    out(kind="gi1_4096_1080p", frame_ms=ms, first_s=first,
        mrays=round(2 * 1920 * 1080 / ms / 1e3, 2),
        residue=dict(render_wave.last_residue))
    # 8-spp progressive accumulation, device-side
    acc = None
    t0 = time.time()
    for i in range(2, 10):
        c, dep, it = render_wave.render_frame_wavefront(
            W4, cam5, 1920, 1080, render_mode=0, frame_number=i,
            gi_bounces=1)
        acc = c if acc is None else acc + c
    img = jax.block_until_ready(acc / 8.0)
    out(kind="spp8_4096_1080p", total_s=round(time.time() - t0, 1))
    write_png(os.path.join(REPO, "assets", "renders", "nz4096_gi_8spp_r5.png"),
              np.clip(np.nan_to_num(np.asarray(img), nan=0.0), 0, 1))
    out(kind="png4096", path="assets/renders/nz4096_gi_8spp_r5.png")
    del W4, sc4
except Exception:
    traceback.print_exc()
    out(kind="fail4096")

# ---------------- 8192^3 (attr16) ---------------------------------------
try:
    if time.time() > DEADLINE - 1500:
        raise RuntimeError("deadline too close for 8192")
    sc8 = load_scene(8192)
    W8 = wf.prepare(sc8, attr16=True)
    jax.block_until_ready(W8.attr_comb)
    out(kind="scene8192", n_mixed=int(W8.n_mixed))
    h8 = expected_h(8192)
    agree, hitf = probe_gate(W8, 8192, h8)
    out(kind="probe_gate_8192", t_agree=round(agree, 4),
        hitfrac=round(hitf, 4), ok=bool(agree >= 0.99))
    cam5 = place_cam(W8)
    c, ms, first = steady(W8, cam5, 1920, 1080, 3, 1)
    out(kind="prim_8192_1080p", frame_ms=ms, first_s=first,
        mrays=round(1920 * 1080 / ms / 1e3, 2))
    img = np.nan_to_num(np.asarray(c), nan=0.5)
    write_png(os.path.join(REPO, "assets", "renders", "nz8192_prim_r5.png"),
              np.clip(img, 0, 1))
    out(kind="png8192", path="assets/renders/nz8192_prim_r5.png")
    c, ms, first = steady(W8, cam5, 960, 540, 0, 1, n=1)
    out(kind="gi1_8192_960x540", frame_ms=ms, first_s=first,
        mrays=round(2 * 960 * 540 / ms / 1e3, 2),
        residue=dict(render_wave.last_residue))
    write_png(os.path.join(REPO, "assets", "renders", "nz8192_gi_r5.png"),
              np.clip(np.nan_to_num(np.asarray(c), nan=0.0), 0, 1))
    out(kind="png8192gi", path="assets/renders/nz8192_gi_r5.png")
except Exception:
    traceback.print_exc()
    out(kind="fail8192")
out(kind="done")
