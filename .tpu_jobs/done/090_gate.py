"""Gate re-run on the ADOPTED r3 config (KMAX=8, ladder+drain,
serve_bulk=0) — 082's green gate compiled the KMAX=4 kernels; the
driver bench will run these."""
import os
exec(open(os.path.join(REPO, "scripts", "tpu_gate.py")).read(),
     {"REPO": REPO, "__name__": "__tpu_job__"})
