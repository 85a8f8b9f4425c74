"""Isolate the Mosaic failure in brick_dda.coarse_dda on the real chip."""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".bench_cache", "xla"))
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from svo_raytracer_tpu.ops import brick_dda

    i32 = jnp.int32
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # T0: bare sublane gather over (8192,128) VMEM table
    V = 8192
    tab = jnp.asarray(rng.integers(0, V, (V, 128), np.int32))
    idx = jnp.asarray(rng.integers(0, V, (8, 128), np.int32))

    def kern0(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    try:
        out = pl.pallas_call(
            kern0,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx)
        out.block_until_ready()
        print("T0 sublane-gather (8192,128): OK", flush=True)
    except Exception:
        print("T0 FAILED:", flush=True)
        traceback.print_exc()

    # T1: the real coarse_dda, small batch, full traceback
    G = 32
    vox = rng.random((G, G, G)) < 0.05
    tab2 = brick_dda.replicate_lanes(brick_dda.pack_occupancy(vox))
    B = 1024
    o = rng.uniform(0, G, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    try:
        out = brick_dda.coarse_dda(tab2, jnp.asarray(o), jnp.asarray(d),
                                   grid_size=G, interpret=False)
        out["hit"].block_until_ready()
        print(f"T1 coarse_dda: OK hits={int(jnp.sum(out['hit']))}",
              flush=True)
    except Exception:
        print("T1 FAILED:", flush=True)
        traceback.print_exc()

    # T2: coarse_dda with max_steps=8 (tiny loop) — is it the loop length?
    try:
        out = brick_dda.coarse_dda(tab2, jnp.asarray(o), jnp.asarray(d),
                                   grid_size=G, max_steps=8, interpret=False)
        out["hit"].block_until_ready()
        print("T2 coarse_dda max_steps=8: OK", flush=True)
    except Exception:
        print("T2 FAILED:", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
