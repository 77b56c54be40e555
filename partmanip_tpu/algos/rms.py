"""Running mean/std observation normalization as a pytree.

≙ ``algorithms/algo_utils/RMS.py``: Chan's parallel-variance update
(``RMS.py:10-17``) where each call folds one batch in with weight 1/n, and
``Normalization.__call__`` divides by std (no epsilon, matching ``RMS.py:44``
— S is seeded with 1e-4 so std never hits exact zero).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class RMSState(NamedTuple):
    n: jnp.ndarray      # i32 scalar: number of batches folded in
    mean: jnp.ndarray   # [1, D]
    S: jnp.ndarray      # [1, D] accumulated (n × variance)

    @property
    def std(self) -> jnp.ndarray:
        return jnp.sqrt(self.S / jnp.maximum(self.n, 1))


def init_rms(shape: int) -> RMSState:
    return RMSState(
        n=jnp.zeros((), jnp.int32),
        mean=jnp.zeros((1, shape)),
        S=jnp.ones((1, shape)) * 1e-4,
    )


def update_rms(state: RMSState, x: jnp.ndarray) -> RMSState:
    """Fold one batch [B, D] in (≙ ``RunningMeanStd.update``)."""
    n = state.n + 1
    batch_mean = x.mean(axis=0, keepdims=True)
    mean = state.mean + (batch_mean - state.mean) / n
    S = (state.S
         + jnp.mean((x - batch_mean) ** 2, axis=0, keepdims=True)
         + (state.mean - batch_mean) ** 2 * (n - 1) / n)
    return RMSState(n=n, mean=mean, S=S)


def normalize(state: RMSState, x: jnp.ndarray,
              update: jnp.ndarray | bool = True
              ) -> Tuple[jnp.ndarray, RMSState]:
    """(x − mean)/std with optional state update (``Normalization.__call__``).

    ``update`` may be a traced bool (the freeze-at-50%-success flag,
    ``ppo.py:200-201``)."""
    upd = update_rms(state, x)
    state = RMSState(*[jnp.where(update, a, b) for a, b in zip(upd, state)])
    return (x - state.mean) / state.std, state
