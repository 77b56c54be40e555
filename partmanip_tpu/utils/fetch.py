"""Single-transfer host fetch of scalar metric dicts.

Over the tunneled TPU runtime each device->host transfer pays ~40 ms of
round-trip latency, so ``{k: float(v) for ...}`` on a 25-key metrics dict
costs ~1 s per training iteration — 3-4x the fused train step itself. One
on-device ``jnp.stack`` plus one array fetch turns N round-trips into two.

(The reference never hits this: gymtorch aliases live in host-visible CUDA
memory and ``.item()`` is nanoseconds, ``ppo.py:269-273``.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fetch_scalars(metrics: dict) -> dict:
    """Fetch a dict of on-device scalars as python floats in one transfer."""
    if not metrics:
        return {}
    keys = list(metrics)
    vals = np.asarray(jnp.stack([jnp.asarray(metrics[k]).reshape(())
                                 for k in keys]))
    return {k: float(x) for k, x in zip(keys, vals)}
