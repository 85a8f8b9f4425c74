"""Host-side 4096^3 / 8192^3 NZ BrickScene builds -> .bench_cache npz.

Pure NumPy (models/bigworld.py) — safe to run alongside the TPU worker
(never touches the tunnel).  The TPU jobs load the npz instead of
spending worker time on the build.

Usage: python scripts/build_bigworlds.py [4096] [8192]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from svo_raytracer_tpu.models import bigworld  # noqa: E402

CACHE = os.path.join(REPO, ".bench_cache")
HM = "/root/reference/assets/heightmaps/nz.png"
MM = "/root/reference/assets/matmaps/materials.png"


def build(size):
    out = os.path.join(CACHE, f"bricks_nz_{size}.npz")
    if os.path.exists(out):
        print(f"{out} present", flush=True)
        return
    hm = np.asarray(Image.open(HM))
    mm = np.asarray(Image.open(MM))
    t0 = time.time()
    hm_u = np.asarray(Image.fromarray(hm).resize((size, size),
                                                 Image.BILINEAR))
    mm_u = np.asarray(Image.fromarray(mm.astype(np.uint8)).resize(
        (size, size), Image.NEAREST))
    scene = bigworld.heightmap_brick_scene(
        hm_u.astype(np.uint16), mm_u.astype(np.int32), size)
    print(f"{size}: n_mixed={scene.n_mixed} built in "
          f"{time.time() - t0:.0f}s", flush=True)
    os.makedirs(CACHE, exist_ok=True)
    tmp = out + f".tmp{os.getpid()}.npz"
    np.savez(tmp, n_mixed=scene.n_mixed, l0_table=scene.l0_table,
             brick_slot=scene.brick_slot, brick_attr=scene.brick_attr,
             occ_words=scene.occ_words, attrs=scene.attrs)
    os.replace(tmp, out)
    print(f"{size}: cached -> {out} "
          f"({os.path.getsize(out) / 1e9:.1f} GB)", flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 8192]
    for s in sizes:
        build(s)
