"""Functional task/env layer: the TPU-native ``BaseTask``.

Re-creates the step contract of ``tasks/hand_base.py:252-290`` as a pure
function over an explicit :class:`EnvState` pytree:

pre-physics (at step T, using reward/progress from T-1):
    1. actions → PD targets via the robot controller;
    2. TRAIN reset rule: reward-stagnation — reset when
       ``progress ≥ epis_max_step + explore_step`` or on success
       (``hand_base.py:369-371``); TEST rule: fixed horizon (``:374-375``);
    3. per-env partial reset by ``jnp.where`` masking (≙ the indexed tensor
       writes of ``reset_idx``, ``open_drawer.py:320-334``): reset envs get
       default state + default targets, others get action targets.

physics: ``control_freq_inv`` × the fused scene step.

post-physics: progress += 1, observations, reward (``hand_base.py:387-392``).

The returned obs when ``reset_buf`` is set is the *post-reset* obs, so the
transition carries no gradient — enforced downstream by adv-masking in GAE
(``algorithms/algo_utils/storage.py:104-106``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..sim import engine
from ..sim.engine import SceneSpec, SceneState


class EnvState(NamedTuple):
    """Carried env-layer state, [E]-leading arrays (a pytree)."""

    sim: SceneState
    progress: jnp.ndarray        # i32 [E]
    rew_buf: jnp.ndarray         # f32 [E]  reward from T-1
    success: jnp.ndarray         # bool [E]
    reset_buf: jnp.ndarray       # bool [E] set during the last step
    reset_succ: jnp.ndarray      # bool [E] success snapshot at reset decision
    epis_max_rew: jnp.ndarray    # f32 [E]
    epis_max_step: jnp.ndarray   # i32 [E]
    rng: jnp.ndarray             # PRNG key
    task_state: Any = None       # task-specific carried state (e.g. the
                                 # per-object success bitmap of open_drawer)


def init_env_state(sim: SceneState, num_envs: int, rng) -> EnvState:
    return EnvState(
        sim=sim,
        progress=jnp.zeros(num_envs, jnp.int32),
        rew_buf=jnp.zeros(num_envs),
        success=jnp.zeros(num_envs, bool),
        reset_buf=jnp.zeros(num_envs, bool),
        reset_succ=jnp.zeros(num_envs, bool),
        epis_max_rew=jnp.full((num_envs,), -100.0),
        epis_max_step=jnp.zeros(num_envs, jnp.int32),
        rng=rng,
    )


def mask_where(mask, new, old):
    """Per-env select over arbitrarily-shaped [E, ...] pytree leaves."""
    def sel(n, o):
        m = mask.reshape(mask.shape + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)
    return jax.tree.map(sel, new, old)


def pre_physics(
    state: EnvState,
    targets: jnp.ndarray,
    default_targets: jnp.ndarray,
    reset_sim_fn: Callable[[SceneState, jnp.ndarray, jnp.ndarray], SceneState],
    explore_step: int,
    max_episode_length: int,
    train: bool,
    force_reset=None,
) -> Tuple[EnvState, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Reset decision + partial reset + target overlay.

    Returns (new state, final PD targets, pre-physics extras).
    """
    extras = {}
    if train:
        # reward-stagnation early reset (hand_base.py:369-371)
        epis_max_step = jnp.where(state.rew_buf < state.epis_max_rew,
                                  state.epis_max_step, state.progress)
        epis_max_rew = jnp.maximum(state.rew_buf, state.epis_max_rew)
        reset_buf = (state.progress >= epis_max_step + explore_step) | state.success
        if force_reset is not None:
            # external reset requests (DAgger's reward-driven early reset)
            reset_buf = reset_buf | force_reset
        reset_succ = state.success
        extras["succ_rate"] = (
            state.success.astype(jnp.float32).sum(keepdims=True)
            / jnp.clip(reset_buf.astype(jnp.float32).sum(keepdims=True), min=1.0)
        )
    else:
        epis_max_step = state.epis_max_step
        epis_max_rew = state.epis_max_rew
        reset_buf = state.progress >= max_episode_length
        reset_succ = state.reset_succ

    rng, sub = jax.random.split(state.rng)
    sim = reset_sim_fn(state.sim, reset_buf, sub)
    final_targets = mask_where(reset_buf, default_targets, targets)

    new = state._replace(
        sim=sim,
        reset_buf=reset_buf,
        reset_succ=reset_succ,
        progress=jnp.where(reset_buf, 0, state.progress),
        success=jnp.where(reset_buf, False, state.success),
        epis_max_rew=jnp.where(reset_buf, -100.0, epis_max_rew),
        epis_max_step=jnp.where(reset_buf, 0, epis_max_step),
        rng=rng,
    )
    return new, final_targets, extras


def run_physics(scene: SceneSpec, sim: SceneState, targets,
                control_freq_inv: int) -> SceneState:
    """control_freq_inv fused physics steps with held targets
    (≙ ``hand_base.py:282-284``)."""
    def body(carry, _):
        return engine.physics_step(scene, carry, targets), None

    sim, _ = jax.lax.scan(body, sim, None, length=control_freq_inv)
    return sim
