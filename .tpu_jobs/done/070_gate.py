"""Round-2 compiled-Pallas regression gate (scripts/tpu_gate.py).
The bench caches were wiped at round restart: rebuild the brick cache
from the freshly built terrain tree before running the gate."""
import os
import sys
sys.path.insert(0, REPO)
import bench

_tree, _s = bench.build_scene(1024, 512)
print(f"# terrain tree ready ({_tree.n_nodes} nodes, {_s:.1f}s)", flush=True)
_scene = bench.build_brick_scene(_tree, 1024)
print(f"# brick scene ready (n_mixed={_scene.n_mixed})", flush=True)
del _tree, _scene

exec(open(os.path.join(REPO, "scripts", "tpu_gate.py")).read(),
     {"REPO": REPO, "__name__": "__tpu_job__"})
