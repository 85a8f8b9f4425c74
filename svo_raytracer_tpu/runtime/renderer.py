"""Device-resident octree management — the Renderer.java analog.

The reference's L1 runtime wraps GL objects: SSBO create/full-update/ranged
update, texture create/readback, compute dispatch (``Renderer.java:43-150``).
The XLA equivalents: "dispatch" is a jitted call; "SSBO" is the set of device
arrays below; "ranged update" is ``array.at[lo:hi].set`` (XLA
dynamic-update-slice, which donates and updates in place when shapes allow);
"readback" is ``np.asarray``.

:class:`DeviceTree` keeps the node table padded to a stable capacity so edit
uploads never trigger recompilation, and grows geometrically on overflow.
"""

from __future__ import annotations

import numpy as np

from ..core.octree import Octree
from ..core.sdf import ChangeBounds


class DeviceTree:
    """Padded device mirror of a host octree with incremental uploads."""

    def __init__(self, tree: Octree, min_capacity: int = 1 << 16,
                 slack: float = 2.0):
        self._slack = slack
        self.host = tree.to_numpy()
        cap = max(min_capacity, int(self.host.n_nodes * slack))
        self.dev = self.host.to_device(pad_to=cap)

    @property
    def capacity(self) -> int:
        return self.dev.capacity

    def arrays(self):
        return self.dev.arrays()

    @property
    def n_nodes(self) -> int:
        return self.dev.n_nodes

    def full_upload(self, tree: Octree) -> None:
        """Whole-buffer upload (addSSBO/updateSSBO full variants,
        Renderer.java:123-134)."""
        self.host = tree.to_numpy()
        cap = self.capacity
        if self.host.n_nodes > cap:
            cap = max(int(self.host.n_nodes * self._slack), cap * 2)
        self.dev = self.host.to_device(pad_to=cap)

    def ranged_update(self, tree: Octree, cb: ChangeBounds) -> None:
        """Upload only the two dirty windows (updateSSBO ranged variant,
        Renderer.java:136-146; called like Main.java:349-350).  Falls back to
        a growing full upload when the appended range exceeds capacity."""
        host = tree.to_numpy()
        if host.n_nodes > self.capacity:
            self.full_upload(tree)
            return
        import jax.numpy as jnp

        self.host = host
        updated = {}
        for name in ("child", "mask", "value", "normal"):
            d = getattr(self.dev, name)
            h = np.asarray(getattr(host, name))
            for lo, hi in ((cb.start0, cb.end0), (cb.start1, cb.end1)):
                if hi > lo:
                    d = d.at[lo:hi].set(jnp.asarray(h[lo:hi]))
            updated[name] = d
        self.dev = Octree(n_nodes=host.n_nodes, world_size=host.world_size,
                          **updated)
