"""Device->host drain helpers.

Every separate device->host transfer pays the link's full round-trip
latency (~25-90 ms measured through the tunneled dev chip,
docs/architecture.md "link-state variance"; ~micro-seconds but still a
queue entry on PCIe hosts).  When several device arrays become ready at
the same point in the program, draining them as ONE flattened transfer
replaces k round trips with one at the cost of a device-side
concatenate that is free next to the RTT.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_ravel_cat = jax.jit(lambda *xs: jnp.concatenate([x.ravel() for x in xs]))


def drain_together(*arrays) -> list[np.ndarray]:
    """Fetch several float32 device arrays in one device->host transfer.

    Flatten-concatenates on device (one jitted program, cached per shape
    set), reads the single result back, and splits it to the original
    shapes on the host.  All inputs must share a dtype (the concat would
    otherwise upcast)."""
    flat = np.asarray(_ravel_cat(*arrays))
    out: list[np.ndarray] = []
    off = 0
    for a in arrays:
        size = math.prod(a.shape)
        out.append(flat[off : off + size].reshape(a.shape))
        off += size
    return out
