import runpy

runpy.run_path(REPO + "/scripts/bench_pallas_prims.py", run_name="__main__")
