"""Isolate which stage of the compiled primary trace dies at 1080p:
round-0 L0 classify, the local tile tables, or the 1L static-candidate
kernel (084: staticonly retired ~0 rays compiled, but retires ~all in
interpret mode and at smaller viewports)."""
import json
import os
import sys

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from svo_raytracer_tpu.ops import render_wave, shade, wavefront as wf  # noqa
from svo_raytracer_tpu.utils.camera import Camera  # noqa: E402

i32 = jnp.int32


def out(**kw):
    print(json.dumps(kw), flush=True)


tree, _ = bench.build_scene(1024, 512)
wsc = wf.prepare(bench.build_brick_scene(tree, 1024))
jax.block_until_ready(wsc.attr_comb)
G = wsc.grid_size

W, H = 1920, 1080
B = W * H
gx = np.linspace(1.2, 1.8, 5, dtype=np.float32)
pxz = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
po = np.concatenate([pxz[:, :1], np.full((25, 1), 1.999, np.float32),
                     pxz[:, 1:]], axis=1)
pd = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (25, 1))
pr = wf.intersect_wavefront(wsc, jnp.asarray(po), jnp.asarray(pd))
ts = np.asarray(pr.t)
best = int(np.argmax(ts))
cam = Camera(pos=np.array([po[best, 0], min(1.999 - float(ts[best]) + 0.05,
                                            1.99), po[best, 2]]))
cam.rotate(-0.35, 0.4)
cam5 = jnp.asarray(cam.uniform(), jnp.float32)
cam16 = wf.cam16(cam5)
cam_dims = (W, H, wsc.world_size)
inner_cap, l0_cap = wf._resolve_caps(G)


def stats(key, pack):
    return dict(
        n_init=int(jnp.sum(key == wf.KEY_INIT)),
        n_done=int(jnp.sum(key == wf.KEY_DONE)),
        n_cell=int(jnp.sum((key >= 0) & (key < wf.KEY_DONE))),
        n_hit=int(jnp.sum(pack >= 0)),
        n_miss=int(jnp.sum(pack == wf.PACK_MISS)))


state = wf._init_state_cam(B)
S = state[0].shape[0]
none_slot = jnp.full((S // wf.TILE, wf.KMAX), -1, i32)

common = dict(G=G, NM=wsc.capacity, inner_cap=inner_cap, l0_cap=l0_cap,
              early_exit=True, interpret=False, cam=cam16,
              cam_dims=cam_dims, brick_slot=wsc.brick_slot,
              sc_words=wsc.sc_words, sc_skip=True, l0_sc=wsc.l0_sc)

state = wf._run_kernel(none_slot, none_slot, wsc.l0_occ, wsc.l0_mixed,
                       wsc.occ_words, state, serve=0, **common)
out(kind="after_round0", **stats(state[0], state[2]))

tile_slot, tile_cell, _n = wf._tile_tables_local(state[0], wsc.brick_slot)
tc = np.asarray(tile_cell)
key_t = np.asarray(state[0]).reshape(-1, wf.TILE)
covered = (key_t[:, :, None] == tc[:, None, :]).any(-1)
pend = (key_t >= 0) & (key_t < wf.KEY_DONE)
out(kind="tables", tiles=int(tc.shape[0]),
    tiles_with_cand=int((tc[:, 0] >= 0).sum()),
    cand_per_tile=float((tc >= 0).sum(1).mean()),
    pend_rays=int(pend.sum()),
    covered_frac=float((covered & pend).sum() / max(pend.sum(), 1)),
    distinct_cells_sample=[int(len(np.unique(key_t[i][pend[i]])))
                           for i in (0, 500, 1000, 1500, 2000)])

state2 = wf._run_kernel(tile_slot, tile_cell, wsc.l0_occ, wsc.l0_mixed,
                        wsc.occ_words, state, serve=0, **common)
out(kind="after_1L_static", **stats(state2[0], state2[2]))

state3 = wf._run_kernel(tile_slot, tile_cell, wsc.l0_occ, wsc.l0_mixed,
                        wsc.occ_words, state, serve=wf.DEFAULT_SERVE,
                        serve_width=4, **common)
out(kind="after_1L_serve", **stats(state3[0], state3[2]))
