"""Device-mesh data parallelism over the env axis.

The reference's entire parallelism story is env batching inside one GPU
(SURVEY.md §2): here the env axis becomes a sharded mesh axis. Sim state,
rollouts and observations are sharded over ``env``; parameters and optimizer
states are replicated; XLA inserts the gradient ``psum`` over ICI during the
loss reduction — no hand-written collectives (the NCCL analog is the
compiler).

Usage:
    mesh = make_mesh(num_devices)
    train_iter = shard_ppo_train_iter(ppo, mesh)
    ts, env_state = place(ppo, mesh, ts, env_state)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(num_devices: int = None, axis_name: str = ENV_AXIS) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(np.array(devices[:n]), (axis_name,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (env) sharding."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _shard_leaf_like(mesh: Mesh, num_envs: int):
    """Heuristic placement: arrays with a leading env axis are sharded over
    it; everything else (params, opt state, scalars, RNG) is replicated."""
    shard = env_sharding(mesh)
    repl = replicated(mesh)

    def placer(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == num_envs:
            return shard
        return repl

    return placer


def place(mesh: Mesh, num_envs: int, *pytrees):
    """Device-put pytrees with env-axis sharding on [E, ...] leaves."""
    placer = _shard_leaf_like(mesh, num_envs)
    out = tuple(
        jax.tree.map(lambda x: jax.device_put(x, placer(x)), t)
        for t in pytrees)
    return out if len(out) > 1 else out[0]


def shard_ppo_train_iter(ppo, mesh: Mesh, ts, env_state):
    """Jit the fused PPO iteration with env-axis input sharding constraints
    (built once from example pytrees — the returned callable does not
    retrace).

    Propagation through the fused program (rollout → GAE → updates) is left
    to GSPMD, which reduces per-minibatch gradients with a psum over ICI.
    """
    placer = _shard_leaf_like(mesh, ppo.num_envs)
    sh_ts = jax.tree.map(placer, ts)
    sh_env = jax.tree.map(placer, env_state)
    return jax.jit(ppo._train_iteration, in_shardings=(sh_ts, sh_env, None))
