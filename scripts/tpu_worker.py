"""Single long-lived TPU worker: warm up once, rebuild the bench scene
cache, then execute job scripts dropped into .tpu_jobs/.

Why: the axon TPU tunnel is single-client and per-process warmup is
10-20 min (CLAUDE.md), so ALL on-chip experiments of a session must share
one process.  Protocol:

  * drop `NNN_name.py` into .tpu_jobs/ -> worker exec()s it (namespace has
    jax/jnp/np/repo on sys.path), stdout+stderr tee'd to .tpu_jobs/NNN_name.out,
    then the job file moves to .tpu_jobs/done/.
  * touch .tpu_jobs/STOP -> worker exits promptly (frees the tunnel).
  * hard deadline (--deadline seconds, default 2400) as a backstop so the
    worker can never hold the tunnel into the driver's end-of-round bench.
"""

import glob
import io
import os
import shutil
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
JOBS = os.path.join(REPO, ".tpu_jobs")
DONE = os.path.join(JOBS, "done")
os.makedirs(DONE, exist_ok=True)

DEADLINE = time.time() + float(
    sys.argv[sys.argv.index("--deadline") + 1] if "--deadline" in sys.argv
    else 2400)


def log(msg):
    print(f"[worker +{time.time() - T0:7.1f}s] {msg}", flush=True)


T0 = time.time()
log("importing jax ...")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

log(f"backend={jax.default_backend()} devices={jax.devices()}")
# warmup: tiny jit round-trip (absorbs the tunnel's first-compile penalty)
x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128), jnp.float32))
x.block_until_ready()
log("warmup jit done")

# rebuild the bench scene cache if missing (the driver's end-of-round
# bench.py loads it; rebuilding inline there would eat the bench budget)
if "--no-scene" not in sys.argv:
    try:
        import bench

        cache = os.path.join(REPO, ".bench_cache", "terrain_1024_512.npz")
        if not os.path.exists(cache):
            log("scene cache missing -> rebuilding 1024^3 terrain ...")
            tree, secs = bench.build_scene(1024, 512)
            log(f"scene built in {secs:.0f}s, {tree.n_nodes} nodes")
        else:
            log("scene cache present")
    except Exception:
        traceback.print_exc()
        log("scene build FAILED (continuing to job loop)")

log("entering job loop")
while time.time() < DEADLINE:
    if os.path.exists(os.path.join(JOBS, "STOP")):
        log("STOP seen")
        break
    jobs = sorted(p for p in glob.glob(os.path.join(JOBS, "*.py")))
    if not jobs:
        time.sleep(2)
        continue
    job = jobs[0]
    name = os.path.basename(job)
    out_path = os.path.join(JOBS, name[:-3] + ".out")
    log(f"running job {name}")
    buf = io.StringIO()

    class Tee:
        def __init__(self, *ws):
            self.ws = ws

        def write(self, s):
            for w in self.ws:
                w.write(s)
            sys.__stdout__.flush()
            return len(s)

        def flush(self):
            for w in self.ws:
                w.flush()

        def close(self):  # interpreter shutdown may close sys.stdout
            pass

    old_out, old_err = sys.stdout, sys.stderr
    sys.stdout = sys.stderr = Tee(buf, sys.__stdout__)
    try:
        # drop cached repo modules so jobs always see the checked-out code
        # (one long-lived process serves many jobs across edits)
        for mod in [m for m in sys.modules
                    if m.startswith("svo_raytracer_tpu") or m == "bench"]:
            del sys.modules[mod]
        ns = {"jax": jax, "jnp": jnp, "np": np, "REPO": REPO,
              "DEADLINE": DEADLINE, "__name__": "__tpu_job__"}
        with open(job) as f:
            code = f.read()
        exec(compile(code, job, "exec"), ns)
        status = "OK"
    except Exception:
        traceback.print_exc()
        status = "FAIL"
    finally:
        sys.stdout, sys.stderr = old_out, old_err
    with open(out_path, "w") as f:
        f.write(buf.getvalue() + f"\n== {status} ==\n")
    shutil.move(job, os.path.join(DONE, name))
    log(f"job {name}: {status}")

log("worker exiting")
