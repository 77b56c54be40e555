"""Checkpoint save/resume (≙ the per-algo ``save()``/``resume()`` pairs,
``algorithms/ppo.py:83-137``).

Pytrees are materialized to host numpy and pickled; ``restore_like`` pours
loaded leaves back into a freshly-initialized target structure so device
placement/sharding follows the live training state, not the checkpoint.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(tree):
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, (jnp.ndarray, np.ndarray))
        else x, tree)


def save(path: str, obj: Any):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_host(obj), f)


def load(path: str) -> Any:
    assert os.path.exists(path), path
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_like(target: Any, loaded: Any) -> Any:
    """Map loaded leaves onto the target pytree structure (device arrays
    replace matching leaves; mismatched structure raises)."""
    t_leaves, treedef = jax.tree.flatten(target)
    l_leaves = jax.tree.leaves(loaded)
    assert len(t_leaves) == len(l_leaves), (
        f"checkpoint structure mismatch: {len(t_leaves)} vs {len(l_leaves)}")
    new = [jnp.asarray(l) if isinstance(t, (jnp.ndarray, np.ndarray)) else l
           for t, l in zip(t_leaves, l_leaves)]
    return jax.tree.unflatten(treedef, new)
