"""BC / DAgger / vision-obs tests (SURVEY.md §2 #7-8, §3.4)."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partmanip_tpu import config
from partmanip_tpu.envs.grasp_cube import GraspCubeEnv
from partmanip_tpu.utils import checkpoint as ckpt_lib


class DummyLogger:
    save_ckpt_dir = "/tmp/partmanip_distill_ckpt"

    def info(self, record, iteration):
        pass


def small_cfg(extra=()):
    return config.process_cfgs([
        "--algocfg", "dagger",
        "--algo.num_envs", "2", "--sim.inner_substeps", "1",
        "--task.maxEpisodeLength", "4",
        "--task.obs_mode.tsdf.resolution", "8",
        "--algo.model.network.name", "MLP",
        *extra,
    ])


@pytest.fixture(scope="module")
def vision_env():
    cfg, sp = small_cfg()
    cfg["task"]["im_scale"] = 8
    env = GraspCubeEnv(cfg["task"], sp)
    return env, cfg, sp


class TestVisionObs:
    def test_mesh_tsdf_obs(self, vision_env):
        env, cfg, sp = vision_env
        assert env.learn_input_mode == "mesh_tsdf"
        # 8³ + proprio 25
        assert env.num_obs["mesh_tsdf"] == 512 + 25
        state = env.init_state(jax.random.PRNGKey(0))
        state, obs = jax.jit(env.reset)(state)
        assert obs["mesh_tsdf"].shape == (2, 537)
        vol = np.asarray(obs["mesh_tsdf"][:, :512])
        assert vol.min() >= -1.0 and vol.max() <= 1.0
        # the volume must see *something*: both signs present (robot/cube
        # inside the workspace → negative region, free space → +1)
        assert (vol < 0).any() and (vol > 0.9).any()

    def test_depth_img_obs(self):
        cfg, sp = small_cfg(["--algo.obs_mode", "depth_img"])
        env = GraspCubeEnv(cfg["task"], sp)
        state = env.init_state(jax.random.PRNGKey(0))
        state, obs = jax.jit(env.reset)(state)
        assert obs["depth_img"].shape == (2, 72 * 128 + 25)
        img = np.asarray(obs["depth_img"][0, :72 * 128])
        assert img.min() > 0.1     # nearest surface
        assert (img < 5).sum() > 100  # scene occupies part of the view


class TestOpenDrawerVision:
    """Vision obs on the flagship distillation task (the reference's
    BC/DAgger configs target the drawer, cfg/dagger_tsdf.yaml)."""

    def test_mesh_tsdf_obs(self):
        from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
        cfg, sp = config.process_cfgs([
            "--taskcfg", "open_drawer", "--algocfg", "dagger",
            "--algo.num_envs", "2", "--sim.inner_substeps", "1",
            "--task.maxEpisodeLength", "4",
            "--task.obs_mode.tsdf.resolution", "8",
            "--task.asset.num_objects", "2",
            "--task.asset.assetRoot", "/tmp/partmanip_assets_vis",
        ])
        cfg["task"]["im_scale"] = 8
        env = OpenDrawerEnv(cfg["task"], sp)
        assert env.learn_input_mode == "mesh_tsdf"
        state = env.init_state(jax.random.PRNGKey(0))
        state, obs = jax.jit(env.reset)(state)
        # open_drawer proprio_state is 0 → pure 8³ volume
        assert obs["mesh_tsdf"].shape == (2, 512)
        vol = np.asarray(obs["mesh_tsdf"])
        assert np.isfinite(vol).all()
        # cabinet + robot occupy the workspace: both signs present
        assert (vol < 0).any() and (vol > 0.9).any()
        # stepping with vision obs also works end-to-end
        step = jax.jit(lambda s, a: env.step(s, a, train=True))
        state, obs, rew, reset, extras = step(
            state, jnp.zeros((2, env.num_actions)))
        assert obs["mesh_tsdf"].shape == (2, 512)


def make_teacher_ckpt(path, env, model_cfg):
    """A PPO-format teacher checkpoint on normal_state."""
    from partmanip_tpu.models.actor_critic import ActorCritic
    ac = ActorCritic(env.num_obs["normal_state"], env.num_actions, model_cfg)
    params = ac.init(jax.random.PRNGKey(1))
    ckpt_lib.save(path, {
        "iteration": 0, "params": params, "opt_actor": None,
        "opt_critic": None, "rms": None, "update_rms": False,
        "total_steps": 0,
        "tricks": {"mini_adv_norm": False, "whole_adv_norm": False,
                   "use_state_norm": False, "use_clipped_value_loss": False,
                   "use_grad_clip": True},
        "obs_mode": "normal_state", "model_cfg": model_cfg,
    })


class TestDAgger:
    def test_dagger_iterations(self, vision_env):
        env, cfg, sp = vision_env
        from partmanip_tpu.algos.dagger import DAgger
        model_cfg = {"action_std": 0.1, "action_activate": "tanh",
                     "clipAction": 1.0,
                     "network": {"name": "MLP", "hid_dim": [32],
                                 "activation": "tanh"}}
        with tempfile.TemporaryDirectory() as td:
            tpath = os.path.join(td, "teacher.ckpt")
            make_teacher_ckpt(tpath, env, model_cfg)
            acfg = dict(cfg["algo"])
            acfg.update({"teacher": tpath, "buf_size": 8, "n_steps": 4,
                         "n_updates": 1, "n_minibatches": 2,
                         "reward_reset": False, "model": model_cfg,
                         "test_only": False})
            dag = DAgger(env, acfg, DummyLogger())
            ts, es = dag.init_state(seed=0)
            for _ in range(2):
                ts, es, metrics = dag._jit_iter(ts, es, np.float32(1e-3))
            m = {k: float(v) for k, v in metrics.items()}
            assert np.isfinite(m["Train/dagger_loss"])
            # 4 steps × 2 envs × 2 iters = capacity (8 × 2)
            assert m["Train/cur_buf_size"] == 16
            # student moved
            p0 = dag.init_state(seed=0)[0].student
            diff = max(abs(np.asarray(a - b)).max() for a, b in zip(
                jax.tree.leaves(ts.student.actor),
                jax.tree.leaves(p0.actor)))
            assert diff > 0


class TestDaggerRewardReset:
    def test_force_mask_carries_across_iterations(self, vision_env):
        """The reward-reset mask computed at step t must reset envs at t+1
        even across the scan/iteration boundary (n_steps=1 regime)."""
        env, cfg, sp = vision_env
        from partmanip_tpu.algos.dagger import DAgger
        model_cfg = {"action_std": 0.1, "action_activate": "tanh",
                     "clipAction": 1.0,
                     "network": {"name": "MLP", "hid_dim": [32],
                                 "activation": "tanh"}}
        with tempfile.TemporaryDirectory() as td:
            tpath = os.path.join(td, "teacher.ckpt")
            make_teacher_ckpt(tpath, env, model_cfg)
            # an unbeatable teacher curve: rew < thresh always fires
            rpath = os.path.join(td, "teacher_reward.npy")
            np.save(rpath, np.full(env.max_episode_length + 1, 1e6,
                                   np.float32))
            acfg = dict(cfg["algo"])
            acfg.update({"teacher": tpath, "buf_size": 8, "n_steps": 1,
                         "n_updates": 1, "n_minibatches": 2,
                         "reward_reset": True, "teacher_reward": rpath,
                         "model": model_cfg, "test_only": False})
            dag = DAgger(env, acfg, DummyLogger())
            assert dag.reward_reset
            ts, es = dag.init_state(seed=0)
            # envs past the 10-step grace period with terrible reward
            es = es._replace(progress=jnp.full(env.num_envs, 11, jnp.int32),
                             epis_max_rew=jnp.full(env.num_envs, 1e7),
                             epis_max_step=jnp.full(env.num_envs, 11,
                                                    jnp.int32))
            ts, es, _ = dag._jit_iter(ts, es, np.float32(1e-3))
            # the mask was computed (prog 12 > 10, rew < 1e6) and stored
            assert bool(np.asarray(ts.pending_force).all())
            # ... and fires on the *next* iteration: progress resets to 1
            ts, es, _ = dag._jit_iter(ts, es, np.float32(1e-3))
            np.testing.assert_array_equal(np.asarray(es.progress),
                                          np.ones(env.num_envs))


class TestBC:
    def test_bc_learns_constant_action(self, vision_env):
        env, cfg, sp = vision_env
        from partmanip_tpu.algos.bc import BC
        res = 8
        with tempfile.TemporaryDirectory() as td:
            rng = np.random.RandomState(0)
            for s in range(2):
                d = os.path.join(td, f"scene_{s:05d}")
                os.makedirs(d)
                for t in range(10):
                    np.save(os.path.join(d, f"step_{t:05d}.npy"), {
                        "tsdf": rng.randn(res, res, res).astype(np.float32),
                        "proprio_state": rng.randn(25).astype(np.float32),
                        "action": np.full(env.num_actions, 0.3, np.float32),
                        "tea_obs": np.zeros(37, np.float32),
                    })
            acfg = dict(cfg["algo"])
            acfg.update({
                "algo": "bc", "data_path": td, "max_iterations": 30,
                "n_minibatches": 2, "lr": 1e-2, "lr_schedule": "fixed",
                "save_frequence": 1000, "eval_round": 1,
                "eval_frequence": 1000,
                "model": {"action_std": 0.0, "action_activate": "tanh",
                          "clipAction": 1.0,
                          "network": {"name": "MLP", "hid_dim": [32],
                                      "activation": "tanh"}},
            })
            bc = BC(env, acfg, DummyLogger())
            params = bc.run(seed=0)
            # after fitting, predictions on the *training* observations
            # approach the constant expert action
            from partmanip_tpu.algos.bc import load_demo_tree
            obs, act = load_demo_tree(td, add_proprio=True)
            pred = np.asarray(bc.student.update_act(params, jnp.asarray(obs)))
            assert abs(pred.mean() - 0.3) < 0.1
            assert np.abs(pred - 0.3).max() < 0.25
