"""End-to-end PPO smoke: a few fused train iterations on grasp_cube
(sim + env + learner in one jitted program), plus checkpoint roundtrip."""

import os
import numpy as np
import jax
import pytest

from partmanip_tpu import config
from partmanip_tpu.algos.ppo import PPO
from partmanip_tpu.envs.grasp_cube import GraspCubeEnv


class DummyLogger:
    save_ckpt_dir = "/tmp/partmanip_test_ckpt"

    def info(self, record, iteration):
        pass


@pytest.fixture(scope="module")
def ppo_setup():
    cfg, sp = config.process_cfgs([
        "--algo.num_envs", "4", "--algo.n_steps", "4",
        "--algo.n_updates", "2", "--algo.n_minibatches", "2",
        "--sim.inner_substeps", "2",
        "--algo.model.network.hid_dim", "32", "32",
    ])
    env = GraspCubeEnv(cfg["task"], sp)
    ppo = PPO(env, cfg["algo"], DummyLogger())
    return ppo


class TestPPOSmoke:
    def test_train_iterations_run_and_are_finite(self, ppo_setup):
        ppo = ppo_setup
        ts, env_state = ppo.init_state(seed=0)
        for i in range(3):
            ts, env_state, metrics = ppo._jit_train_iter(ts, env_state, ppo.lr)
        m = {k: float(v) for k, v in metrics.items()}
        for k, v in m.items():
            assert np.isfinite(v), f"{k} not finite: {v}"
        assert m["Train/kl_update_count"] >= 1
        assert "Train/raw_reward_mean" in m
        # params actually moved
        p0 = ppo.init_state(seed=0)[0].params
        diff = jax.tree.map(lambda a, b: float(abs(np.asarray(a - b)).max()),
                            ts.params.actor, p0.actor)
        assert max(jax.tree.leaves(diff)) > 0

    def test_eval_round(self, ppo_setup):
        ppo = ppo_setup
        # short horizon for test speed
        ppo.max_episode_length = 5
        ts, env_state = ppo.init_state(seed=1)
        ts, env_state, log = ppo.eval(ts, env_state)
        assert "Val/succ_rate_mean" in log
        assert all(np.isfinite(v) for v in log.values())

    def test_checkpoint_roundtrip(self, ppo_setup):
        ppo = ppo_setup
        ts, env_state = ppo.init_state(seed=2)
        ts, env_state, _ = ppo._jit_train_iter(ts, env_state, ppo.lr)
        ppo.total_envsteps = 123
        ppo.save(7, ts)
        path = os.path.join(DummyLogger.save_ckpt_dir, "model_7.ckpt")
        ppo2 = ppo
        ts2, _ = ppo2.init_state(seed=3)
        ts2 = ppo2.resume(ts2, path)
        assert ppo2.curr_iter == 7
        assert ppo2.total_envsteps == 123
        for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestEvalCapture:
    def test_pose_and_video_capture(self, tmp_path):
        """_eval_capture dumps per-step pose dicts and video frames from the
        dedicated video camera (≙ hand_base.py:232-244; shrunk to 16x32
        via video_res here — the default is 512x1024 at the rig's view-0
        pose)."""
        cfg, sp = config.process_cfgs([
            "--algo.num_envs", "2", "--task.maxEpisodeLength", "3",
            "--sim.inner_substeps", "1",
            "--algo.model.network.hid_dim", "16",
        ])
        env = GraspCubeEnv(cfg["task"], sp)
        acfg = dict(cfg["algo"])
        acfg["save_pose"] = acfg["save_video"] = True
        acfg["video_res"] = (16, 32)

        class CaptureLogger(DummyLogger):
            save_pose_dir = str(tmp_path / "pose")
            save_video_dir = str(tmp_path / "video")

        ppo = PPO(env, acfg, CaptureLogger())
        ts, env_state = ppo.init_state(seed=0)
        env_state = ppo._eval_capture(ts, env_state)
        pose_dir = os.path.join(CaptureLogger.save_pose_dir, "Iter0")
        assert len(os.listdir(pose_dir)) == 3
        d = np.load(os.path.join(pose_dir, "0.npy"),
                    allow_pickle=True).item()
        assert "rot" in d and "pos" in d and "success" in d
        vid_dir = os.path.join(CaptureLogger.save_video_dir, "Iter0")
        files = os.listdir(vid_dir)
        # path_to_video converts frames to video.mp4 and deletes the pngs
        # (≙ img2video.py:27); without cv2 the raw frames remain
        assert "video.mp4" in files or sum(
            f.endswith(".png") for f in files) == 3, files
