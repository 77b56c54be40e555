"""Env-axis data parallelism: the trainer's sharded iteration on the
8-virtual-device CPU mesh (conftest provisions the devices).

SURVEY §2 parallelism inventory: env-sharded sim/rollouts, replicated
params, GSPMD gradient psum.  The sharded iteration must (a) execute with
leaves actually placed on the mesh and (b) reproduce the unsharded metrics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partmanip_tpu import config
from partmanip_tpu.envs.grasp_cube import GraspCubeEnv
from partmanip_tpu.algos.ppo import PPO


class _L:
    save_ckpt_dir = "/tmp/partmanip_par_ckpt"

    def info(self, *a, **k):
        pass


def _make_ppo(n_devices):
    cfg, sp = config.process_cfgs([
        "--algo.num_envs", "16", "--algo.n_steps", "2",
        "--algo.n_updates", "1", "--algo.n_minibatches", "2",
        "--sim.inner_substeps", "1",
        "--task.maxEpisodeLength", "8",
        "--algo.model.network.hid_dim", "32", "32",
    ])
    cfg["algo"]["parallel"] = {"num_devices": n_devices}
    env = GraspCubeEnv(cfg["task"], sp)
    return PPO(env, cfg["algo"], _L())


class TestShardedTrainIter:
    def test_sharded_matches_unsharded(self):
        assert len(jax.devices()) >= 8, "conftest must provision 8 devices"
        ppo1 = _make_ppo(1)
        ppo8 = _make_ppo(8)
        assert ppo8.mesh is not None and ppo1.mesh is None

        ts1, es1 = ppo1.init_state(seed=3)
        ts8, es8 = ppo8.init_state(seed=3)

        # leaves with an env axis really live sharded on the mesh
        sh = es8.sim.robot.qpos.sharding
        assert len(sh.device_set) == 8, sh
        assert ts8.params.actor is not None
        p_sh = jax.tree.leaves(ts8.params.actor)[0].sharding
        assert len(p_sh.device_set) == 8 and p_sh.is_fully_replicated

        ts1, es1, m1 = ppo1._jit_train_iter(ts1, es1, ppo1.lr)
        ts8, es8, m8 = ppo8._jit_train_iter(ts8, es8, ppo8.lr)
        m1 = {k: float(v) for k, v in m1.items()}
        m8 = {k: float(v) for k, v in m8.items()}
        for k in m1:
            assert np.isfinite(m8[k]), k
            np.testing.assert_allclose(
                m8[k], m1[k], rtol=1e-3, atol=1e-4,
                err_msg=f"sharded metric {k} diverges")

        # outputs stay sharded across iterations (no silent gather)
        assert len(es8.sim.robot.qpos.sharding.device_set) == 8
        ts8, es8, m8b = ppo8._jit_train_iter(ts8, es8, ppo8.lr)
        assert np.isfinite(float(m8b["Train/kl"]))

    def test_eval_round_sharded(self):
        ppo8 = _make_ppo(8)
        ts8, es8 = ppo8.init_state(seed=1)
        es8, metrics, curve = ppo8._jit_eval_round(ts8, es8)
        assert np.isfinite(float(metrics["succ_rate_mean"]))
        assert curve.shape == (ppo8.max_episode_length,)


class TestShardedFusedKernel:
    """The fused Pallas inner step under shard_map over the env mesh
    (VERDICT r2 #4): per-device Mosaic (interpret on CPU) kernels on env
    shards must reproduce the whole-batch fused step."""

    def test_shard_map_fused_parity(self):
        from partmanip_tpu.sim import fused
        from partmanip_tpu.parallel import mesh as mesh_lib
        from partmanip_tpu.envs.grasp_cube import GraspCubeEnv

        E = 256  # 128 per device on a 2-device mesh
        cfg, sp = config.process_cfgs(
            ["--taskcfg", "grasp_cube", "--algo.num_envs", str(E)])
        one = sp._replace(substeps=1, inner_substeps=1)
        env = GraspCubeEnv(cfg["task"], one)
        env.scene = env.scene._replace(params=one)
        sim = env.init_state(jax.random.PRNGKey(0)).sim
        targets = jnp.tile(jnp.asarray(env.default_dof), (E, 1))

        mesh = mesh_lib.make_mesh(2)
        old = fused.ALLOW_INTERPRET
        try:
            fused.ALLOW_INTERPRET = True
            ref = fused.fused_physics_step(env.scene, sim, targets)
            sharded = mesh_lib.shard_physics_step(mesh, env.scene, sim,
                                                  targets)
        finally:
            fused.ALLOW_INTERPRET = old
        np.testing.assert_allclose(
            np.asarray(sharded.robot.qpos), np.asarray(ref.robot.qpos),
            atol=1e-6, rtol=0)
        np.testing.assert_allclose(
            np.asarray(sharded.body.pos), np.asarray(ref.body.pos),
            atol=1e-6, rtol=0)

    def test_engine_dispatch_under_mesh(self):
        """engine.physics_step routes through shard_map when a mesh is
        active and the per-shard env count is tileable."""
        from partmanip_tpu.sim import fused
        from partmanip_tpu.parallel import mesh as mesh_lib
        from partmanip_tpu.envs.grasp_cube import GraspCubeEnv
        from partmanip_tpu.sim import engine as engine_lib

        E = 256
        cfg, sp = config.process_cfgs(
            ["--taskcfg", "grasp_cube", "--algo.num_envs", str(E)])
        one = sp._replace(substeps=1, inner_substeps=1)
        env = GraspCubeEnv(cfg["task"], one)
        env.scene = env.scene._replace(params=one)
        sim = env.init_state(jax.random.PRNGKey(1)).sim
        targets = jnp.tile(jnp.asarray(env.default_dof), (E, 1))
        mesh = mesh_lib.make_mesh(2)
        old = fused.ALLOW_INTERPRET
        try:
            fused.ALLOW_INTERPRET = True
            mesh_lib.activate(mesh)
            out = engine_lib.physics_step(env.scene, sim, targets)
        finally:
            mesh_lib.activate(None)
            fused.ALLOW_INTERPRET = old
        assert np.isfinite(np.asarray(out.robot.qpos)).all()

    def test_heterogeneous_spec_alignment(self):
        """Heterogeneous scenes (per-env obj specs) under shard_map: the
        globally-tiled spec arrays, sharded in contiguous device blocks,
        must equal per-device tiling of each device's env rows — i.e.
        every device's kernel sees exactly its own variants."""
        import os
        from partmanip_tpu.envs import assets
        from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
        from partmanip_tpu.parallel import mesh as mesh_lib
        from partmanip_tpu.sim import fused

        E, n_dev = 256, 2
        root = "/tmp/partmanip_assets_par"
        cfg, sp = config.process_cfgs(
            ["--taskcfg", "open_drawer", "--algo.num_envs", str(E),
             "--task.asset.num_objects", "2",
             "--task.asset.assetRoot", root])
        env = OpenDrawerEnv(cfg["task"], sp)
        scene = env.scene
        # per-env leaves exist (2 variants tiled over the env axis)
        per = mesh_lib._per_env_leaves(scene.obj_tree, E)
        assert per, "expected per-env obj_tree spec arrays"

        R = fused.shard_tile(E, n_dev)
        assert R == 1  # 128 envs/device -> (1, 128) tiles
        _, spec_g, _ = fused._get_prepared(scene, E, R)
        El = E // n_dev
        Tl = El // (R * fused.LANE)
        for d in range(n_dev):
            rows = slice(d * El, (d + 1) * El)
            local = scene._replace(
                obj_tree=jax.tree.map(
                    lambda x: np.asarray(x)[rows]
                    if (np.ndim(x) >= 1 and np.shape(x)[0] == E) else x,
                    scene.obj_tree),
                obj_boxes=jax.tree.map(
                    lambda x: np.asarray(x)[rows]
                    if (np.ndim(x) >= 1 and np.shape(x)[0] == E) else x,
                    scene.obj_boxes))
            _, spec_l, _ = fused._get_prepared(local, El)
            for k in spec_g:
                np.testing.assert_array_equal(
                    np.asarray(spec_g[k])[d * Tl:(d + 1) * Tl],
                    np.asarray(spec_l[k]), err_msg=k)
