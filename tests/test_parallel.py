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
