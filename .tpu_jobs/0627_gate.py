"""Round-2 compiled-Pallas regression gate (scripts/tpu_gate.py)."""
import os
exec(open(os.path.join(REPO, "scripts", "tpu_gate.py")).read(),
     {"REPO": REPO, "__name__": "__tpu_job__"})
