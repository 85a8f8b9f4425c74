import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from conftest import make_terrain_voxels
from svo_raytracer_tpu.core import build_np
from svo_raytracer_tpu.ops import brick_scene, brick_trace, wavefront
from test_traverse_batch import random_rays

vox = make_terrain_voxels(64, seed=3)
tree = build_np.build_octree_np(vox)
o, d = random_rays(128, seed=13)
scene = brick_scene.brickify(tree).to_device()
ws = wavefront.prepare(scene)
ref = brick_trace.intersect_bricks(scene, jnp.asarray(o), jnp.asarray(d))
ee = wavefront.intersect_wavefront(ws, jnp.asarray(o), jnp.asarray(d),
                                   interpret=True, early_exit=True)
ne = wavefront.intersect_wavefront(ws, jnp.asarray(o), jnp.asarray(d),
                                   interpret=True, early_exit=False)
rh = np.asarray(ref.hit); eh = np.asarray(ee.hit); nh = np.asarray(ne.hit)
print("ee agree", (rh == eh).mean(), "ne agree", (rh == nh).mean())
bad = np.nonzero(rh != nh)[0]
print("bad idx", bad[:10])
print("ref hit", rh[bad[:10]])
print("ne t", np.asarray(ne.t)[bad[:10]])
print("ee t", np.asarray(ee.t)[bad[:10]])
print("ne iters", np.asarray(ne.iters)[bad[:10]])
print("ee iters", np.asarray(ee.iters)[bad[:10]])
