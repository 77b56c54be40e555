"""Rollout storage semantics: GAE with done-masking and success-pinned
returns, plus minibatch index generation.

The reference's mutable ``RolloutStorage`` buffers
(``algorithms/algo_utils/storage.py``) become stacked ``lax.scan`` outputs;
only the *semantics* live here:

* GAE (``storage.py:96-114``): advantage is zeroed across done boundaries
  via ``next_is_not_terminal`` — the post-reset transition carries no
  gradient — and returns are pinned to ``succ_value`` on success steps;
* minibatching (``storage.py:125-138``): sequential or random permutation of
  the flattened [T·E] buffer, minibatch size min(total//n_minibatches, 2048),
  drop-last.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Rollout(NamedTuple):
    """Stacked trajectory arrays, time-major [T, E, ...]."""

    observations: jnp.ndarray     # [T, E, O] (normalized if state-norm on)
    actions: jnp.ndarray          # [T, E, A] activated actions
    rewards: jnp.ndarray          # [T, E]
    dones: jnp.ndarray            # [T, E] bool (reset_buf)
    succs: jnp.ndarray            # [T, E] bool (reset_succ)
    values: jnp.ndarray           # [T, E]
    log_probs: jnp.ndarray        # [T, E]
    mu: jnp.ndarray               # [T, E, A]
    sigma: jnp.ndarray            # [T, E, A] log-std rows


def compute_returns(r: Rollout, last_values: jnp.ndarray, gamma: float,
                    lam: float, succ_value: Optional[float],
                    whole_adv_norm: bool = False):
    """GAE over the rollout (≙ ``storage.compute_returns``).

    Returns (returns [T, E], advantages [T, E]).
    """
    not_terminal = (~r.dones).astype(r.rewards.dtype)
    succs = r.succs.astype(r.rewards.dtype)

    def body(adv_next, xs):
        reward, value, next_value, nt, succ = xs
        delta = reward + gamma * next_value - value
        advantage = nt * (delta + gamma * lam * adv_next)
        if succ_value is not None:
            ret = (1.0 - succ) * (advantage + value) + succ * succ_value
        else:
            ret = advantage + value
        return advantage, ret

    next_values = jnp.concatenate([r.values[1:], last_values[None]], axis=0)
    _, returns = jax.lax.scan(
        body, jnp.zeros_like(last_values),
        (r.rewards, r.values, next_values, not_terminal, succs),
        reverse=True,
    )
    advantages = returns - r.values
    if whole_adv_norm:
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
    return returns, advantages


def minibatch_indices(rng, total: int, num_mini_batches: int,
                      sampler: str = "sequential", n_epochs: int = 1):
    """Index matrix [n_epochs·n_batches, mb_size] over the flattened buffer
    (≙ ``storage.mini_batch_generator``).

    ``random`` draws a *fresh* permutation per epoch (the reference's
    BatchSampler re-shuffles its SubsetRandomSampler each epoch);
    ``sequential`` partitions once and tiles it across epochs."""
    mb = min(total // num_mini_batches, 2048)
    n = total // mb  # drop_last
    if sampler == "sequential":
        idx = jnp.tile(jnp.arange(n * mb).reshape(n, mb), (n_epochs, 1))
    elif sampler == "random":
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, total)[: n * mb]
        )(jax.random.split(rng, n_epochs))
        idx = perms.reshape(n_epochs * n, mb)
    else:
        raise NotImplementedError(sampler)
    return idx


def buffer_minibatch_indices(rng, cap: int, size, n_epochs: int,
                             n_batches: int, mb: int):
    """Without-replacement minibatch indices over the first ``size`` valid
    rows of a [cap]-row ring buffer, a fresh shuffle per epoch (≙ the
    reference's SubsetRandomSampler over ``range(cur_buf_size)``,
    ``storage.py:125-138``).  ``size`` may be traced: each epoch sorts the
    valid rows to the front in random order; batch positions wrap mod
    ``size`` only when an epoch needs more rows than are valid.

    Returns i32 [n_epochs·n_batches, mb].
    """
    def epoch_perm(k):
        key = jax.random.uniform(k, (cap,))
        key = key + (jnp.arange(cap) >= size) * 10.0  # valid rows first
        return jnp.argsort(key)

    perms = jax.vmap(epoch_perm)(jax.random.split(rng, n_epochs))
    pos = jnp.arange(n_batches * mb) % jnp.maximum(size, 1)
    idx = jax.vmap(lambda p: p[pos])(perms)           # [n_epochs, n·mb]
    return idx.reshape(n_epochs * n_batches, mb)
