"""Device-mesh data parallelism over the env axis.

The reference's entire parallelism story is env batching inside one GPU
(SURVEY.md §2): here the env axis becomes a sharded mesh axis. Sim state,
rollouts and observations are sharded over ``env``; parameters and optimizer
states are replicated; XLA inserts the gradient ``psum`` over ICI during the
loss reduction — no hand-written collectives (the NCCL analog is the
compiler).

Placement is **path-based**, not shape-based: a leaf is replicated when any
of its pytree path names is in :data:`REPLICATED_FIELDS` (params, optimizer
states, RMS, PRNG keys, ring-buffer cursors), sharded on its leading axis
otherwise.  The old heuristic ("leading dim == num_envs ⇒ shard") would
silently row-shard [512, 512] MLP weight matrices at num_envs=512.

The fused Pallas inner step does not partition under GSPMD by itself;
:func:`shard_physics_step` wraps it in ``shard_map`` so each device runs the
Mosaic kernel on its env shard (engine.physics_step dispatches here whenever
a mesh is active — see ``activate``).

Usage:
    mesh = make_mesh(num_devices)
    activate(mesh)                       # engine shard_maps the fused kernel
    train_iter = shard_ppo_train_iter(ppo, mesh, ts, env_state)
    ts, env_state = place(mesh, ts, env_state)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"

# Pytree field names whose subtrees hold per-host/replicated state: network
# parameters, optimizer states, obs-RMS, PRNG keys, scalar ring cursors.
REPLICATED_FIELDS = frozenset({
    "rng", "params", "opt_actor", "opt_critic", "rms", "update_rms",
    "student", "teacher", "opt", "write_idx", "size", "log_std",
})

# The mesh the training loop is sharding over (None = single device).  Set
# via activate(); consulted by engine.physics_step to shard_map the fused
# kernel over the env axis.
_ACTIVE_MESH: list = []


def activate(mesh: Mesh):
    _ACTIVE_MESH.clear()
    if mesh is not None:
        _ACTIVE_MESH.append(mesh)


def active_mesh():
    return _ACTIVE_MESH[-1] if _ACTIVE_MESH else None


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


def _path_names(path):
    names = []
    for p in path:
        n = getattr(p, "name", None)
        if n is None:
            n = getattr(p, "key", None)
        if isinstance(n, str):
            names.append(n)
    return names


def tree_shardings(mesh: Mesh, tree):
    """Sharding pytree for a train/env state: path-based placement."""
    shard = env_sharding(mesh)
    repl = replicated(mesh)

    def placer(path, x):
        if any(n in REPLICATED_FIELDS for n in _path_names(path)):
            return repl
        if hasattr(x, "ndim") and x.ndim >= 1:
            return shard
        return repl

    return jax.tree_util.tree_map_with_path(placer, tree)


def place(mesh: Mesh, *pytrees):
    """Device-put pytrees with path-based env-axis sharding."""
    out = tuple(
        jax.tree.map(jax.device_put, t, tree_shardings(mesh, t))
        for t in pytrees)
    return out if len(out) > 1 else out[0]


def _per_env_leaves(nt, E: int):
    """Names of a spec NamedTuple's fields with a leading env axis."""
    if nt is None:
        return {}
    out = {}
    for k, v in nt._asdict().items():
        a = np.asarray(v)
        if a.ndim >= 1 and a.shape[0] == E and E > 1:
            out[k] = a
    return out


# Trace-time dispatch counter: incremented whenever the shard_map'd fused
# path is traced, so harnesses (e.g. __graft_entry__.dryrun_multichip) can
# assert the multi-chip trainer actually took the Pallas kernel route and
# not the jnp fallback (VERDICT r4 #5).
SHARD_DISPATCH_COUNT = 0


def shard_physics_step(mesh: Mesh, scene, state, pos_targets):
    """Run the fused Pallas inner step under ``shard_map`` over the env
    axis: each device executes the Mosaic kernel on its local env shard.

    Heterogeneous scenes (per-env obj specs — e.g. 16 drawer variants)
    are supported by tiling the GLOBAL spec arrays with the PER-DEVICE
    tile shape (R = fused.shard_tile(E, n)) and passing them through
    ``shard_map`` as inputs: contiguous blocks of the tiled axis are
    exactly the device env shards, so each device's kernel sees its own
    variants.  Per-env leaves of obj_tree/obj_grids additionally ride in
    for the XLA-side grid narrowphase (mesh-SDF scenes)."""
    from jax.experimental.shard_map import shard_map

    from ..sim import fused

    global SHARD_DISPATCH_COUNT
    SHARD_DISPATCH_COUNT += 1
    ax = mesh.axis_names[0]
    n = int(mesh.devices.size)
    E = state.robot.qpos.shape[0]
    R = fused.shard_tile(E, n)
    meta, spec_tiled, _ = fused._get_prepared(scene, E, R)
    per_tree = _per_env_leaves(scene.obj_tree, E)
    per_grid = _per_env_leaves(scene.obj_grids, E)

    def body(st, tg, spec, pt, pg):
        sc = scene
        if pt:
            sc = sc._replace(obj_tree=sc.obj_tree._replace(**pt))
        if pg:
            sc = sc._replace(obj_grids=sc.obj_grids._replace(**pg))
        return fused.fused_physics_step(
            sc, st, tg, local={"meta": meta, "spec": spec,
                               "RC": (R, fused.LANE)})

    f = shard_map(
        body, mesh=mesh,
        in_specs=(P(ax), P(ax), {k: P(ax) for k in spec_tiled},
                  {k: P(ax) for k in per_tree},
                  {k: P(ax) for k in per_grid}),
        out_specs=P(ax), check_rep=False)
    return f(state, pos_targets, spec_tiled, per_tree, per_grid)


def shard_ppo_train_iter(ppo, mesh: Mesh, ts, env_state):
    """Jit the fused PPO iteration with env-axis input sharding constraints
    (built once from example pytrees — the returned callable does not
    retrace).

    Propagation through the fused program (rollout → GAE → updates) is left
    to GSPMD, which reduces per-minibatch gradients with a psum over ICI;
    the physics inner step itself runs under shard_map (see
    ``shard_physics_step``).
    """
    return jax.jit(ppo._train_iteration,
                   in_shardings=(tree_shardings(mesh, ts),
                                 tree_shardings(mesh, env_state), None))
