"""Offline world generator CLI — the WorldGenerator.test analog.

The reference runs world generation as a JUnit entry point
(``src/tests/WorldGenerator.java:12-40``): load heightmap + matmap textures,
dispatch the chunkgen shaders over every chunk, build the octree, print node
counts, write ``debug.svo``.  Same pipeline here, device-side:

  python -m svo_raytracer_tpu.apps.worldgen --size 1024 --chunk 512 \
      --kind perlin --out assets/debug.svo
  python -m svo_raytracer_tpu.apps.worldgen --kind heightmap \
      --heightmap assets/heightmaps/nzbig.png \
      --matmap assets/matmaps/nz/materials.png --size 8192
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--kind", default="perlin",
                    choices=["perlin", "sphere", "box", "heightmap"])
    ap.add_argument("--heightmap", default="./assets/heightmaps/nzbig.png")
    ap.add_argument("--matmap", default="./assets/matmaps/nz/materials.png")
    ap.add_argument("--height-scale", type=int, default=2048)
    ap.add_argument("--max-lod", type=int, default=None,
                    help="depth cap within each chunk")
    ap.add_argument("--capacity", type=int, default=1 << 24)
    ap.add_argument("--out", default="./assets/debug.svo")
    ap.add_argument("--offset-y", type=int, default=None,
                    help="world y offset (default -size/2 for perlin, 0 else)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from ..core import svo_format
    from ..models import heightmap as hm_mod
    from ..models import procgen, world

    if args.offset_y is None:
        args.offset_y = -args.size // 2 if args.kind == "perlin" else 0

    if args.kind == "heightmap":
        from ..io.image import read_heightmap, read_png

        hm = jnp.asarray(read_heightmap(args.heightmap))
        mm = jnp.asarray(read_png(args.matmap).astype("int32"))

        def gen(origin):
            return hm_mod.generate_chunk_heightmap(
                hm, mm, jnp.asarray(origin, jnp.int32),
                chunk_size=args.chunk, height_scale=args.height_scale)
    else:
        def gen(origin):
            return procgen.generate_chunk(jnp.asarray(origin, jnp.int32),
                                          chunk_size=args.chunk,
                                          kind=args.kind)

    t0 = time.time()
    tree = world.build_world(args.size, args.chunk, gen,
                             max_lod=args.max_lod,
                             chunk_capacity=args.capacity,
                             world_offset=(0, args.offset_y, 0), verbose=True)
    print(f"built {tree.n_nodes} nodes in {time.time() - t0:.1f}s",
          file=sys.stderr)
    counts = tree.to_numpy().node_counts()
    for k, v in counts.items():  # printNodeCounts analog (Octree.java:1018)
        print(f"{k}: {v:,}", file=sys.stderr)
    svo_format.write_svo_file(tree.to_numpy(), args.out)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
