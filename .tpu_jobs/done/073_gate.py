"""Re-run the compiled-Pallas gate on the post-livelock-fix code."""
import os
exec(open(os.path.join(REPO, "scripts", "tpu_gate.py")).read(),
     {"REPO": REPO, "__name__": "__tpu_job__"})
