"""Compiled-Pallas gate on the serve-loop engine (r3): the in-kernel
while_loop{vote, DMA, cross} must agree with the bricks oracle on random
interior rays — the r2 failure (hit_agree 0.784) was round exhaustion,
fixed by serving every pending cell in-kernel."""
import os
exec(open(os.path.join(REPO, "scripts", "tpu_gate.py")).read(),
     {"REPO": REPO, "__name__": "__tpu_job__"})
