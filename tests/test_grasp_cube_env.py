"""Contract tests for the grasp_cube env (reset/obs/reward semantics,
SURVEY.md §3.3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partmanip_tpu import config
from partmanip_tpu.envs.grasp_cube import GraspCubeEnv


@pytest.fixture(scope="module")
def env_and_state():
    cfg, sp = config.process_cfgs(
        ["--algo.num_envs", "4", "--sim.inner_substeps", "2",
         "--task.maxEpisodeLength", "6"])
    env = GraspCubeEnv(cfg["task"], sp)
    state = env.init_state(jax.random.PRNGKey(0))
    state, obs = jax.jit(env.reset)(state)
    return env, state, obs


class TestGraspCubeEnv:
    def test_obs_shapes(self, env_and_state):
        env, state, obs = env_and_state
        assert obs["normal_state"].shape == (4, 37)

    def test_num_actions_ik(self, env_and_state):
        env, _, _ = env_and_state
        # driveMode ik, fixed base → 7 actions (load_robot.py:15-16)
        assert env.ctrl.drive_mode == "ik"
        assert env.num_actions == 7

    def test_step_shapes_and_sanity(self, env_and_state):
        env, state, _ = env_and_state
        step = jax.jit(lambda s, a: env.step(s, a, train=True))
        a = jnp.zeros((4, env.num_actions))
        state, obs, rew, reset, extras = step(state, a)
        assert rew.shape == (4,)
        assert reset.shape == (4,)
        assert obs["normal_state"].shape == (4, 37)
        assert np.isfinite(np.asarray(obs["normal_state"])).all()
        # reward ≈ −dist + 0.5·rot + 5·close: bounded sanity
        assert np.all(np.asarray(rew) > -10) and np.all(np.asarray(rew) < 5)
        for k in ["reaching_reward", "is_reached", "obj_height", "step_id",
                  "succ_rate", "raw_reward"]:
            assert k in extras

    def test_progress_and_test_mode_horizon_reset(self, env_and_state):
        env, state, _ = env_and_state
        step = jax.jit(lambda s, a: env.step(s, a, train=False))
        a = jnp.zeros((4, env.num_actions))
        # maxEpisodeLength=6: reset_buf fires at the *pre-physics* of step 7
        for i in range(6):
            state, obs, rew, reset, extras = step(state, a)
            assert not bool(reset.any()), f"premature reset at step {i}"
            assert int(state.progress[0]) == i + 1
        state, obs, rew, reset, extras = step(state, a)
        assert bool(reset.all())
        # post-reset obs belongs to the fresh episode; progress restarted
        assert int(state.progress[0]) == 1

    def test_random_reset_randomizes_cube(self, env_and_state):
        env, state, _ = env_and_state
        s1, _ = jax.jit(env.reset)(state)
        s2, _ = jax.jit(env.reset)(s1)
        p1 = np.asarray(s1.sim.body.pos)
        p2 = np.asarray(s2.sim.body.pos)
        assert np.abs(p1[:, :2] - p2[:, :2]).max() > 1e-3
        assert np.all(np.abs(p1[:, :2]) <= 0.151)
        # env positions differ from each other too
        assert np.abs(p1[0, :2] - p1[1, :2]).max() > 1e-4

    def test_stagnation_tracker_mechanics(self, env_and_state):
        """The reward-stagnation tracker (hand_base.py:369-371): epis_max_rew
        is the running max of per-step rewards, and no train-mode reset fires
        before explore_step (=40) steps."""
        env, state, _ = env_and_state
        step = jax.jit(lambda s, a: env.step(s, a, train=True))
        a = jnp.zeros((4, env.num_actions))
        rews = []
        for _ in range(5):
            state, obs, rew, reset, extras = step(state, a)
            assert not bool(reset.any())
            rews.append(np.asarray(rew))
        # tracker updates at the *next* pre-physics, so it has seen the
        # rewards before the last step — plus the phantom 0 that seeds the
        # tracker after a full reset (rew_buf zeros at init ≙
        # hand_base.py:64: the reference has identical behavior).
        running_max = np.maximum(np.max(np.stack(rews[:-1]), axis=0), 0.0)
        np.testing.assert_allclose(np.asarray(state.epis_max_rew),
                                   running_max, atol=1e-5)
