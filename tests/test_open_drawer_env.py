"""Contract tests for the open_drawer task (part-aware reward, handle bbox
FK, per-object success tracking — SURVEY.md §2 #6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partmanip_tpu import config
from partmanip_tpu.envs.open_drawer import OpenDrawerEnv


@pytest.fixture(scope="module")
def env_state():
    cfg, sp = config.process_cfgs(
        ["--taskcfg", "open_drawer", "--algo.num_envs", "4",
         "--sim.inner_substeps", "2", "--task.maxEpisodeLength", "6",
         "--task.asset.num_objects", "3",
         "--task.asset.assetRoot", "/tmp/partmanip_assets"])
    env = OpenDrawerEnv(cfg["task"], sp)
    state = env.init_state(jax.random.PRNGKey(0))
    return env, state


class TestOpenDrawerEnv:
    def test_setup(self, env_state):
        env, state = env_state
        assert env.num_actions == 10      # mobile ik: 3 + 7 (load_robot.py:15-29)
        assert env.num_dofs == 12
        assert env.num_objects == 3
        # env→object round-robin (open_drawer.py:145)
        np.testing.assert_array_equal(env.obj_lstid, [0, 1, 2, 0])

    def test_obs_53(self, env_state):
        env, state = env_state
        state, obs = jax.jit(env.reset)(state)
        assert obs["normal_state"].shape == (4, 53)
        assert np.isfinite(np.asarray(obs["normal_state"])).all()

    def test_handle_bbox_world_fk(self, env_state):
        """Root quat (0,0,1,0) = 180° about z maps the local −x 'out' axis to
        world +x (toward the robot at +0.4 x)."""
        env, state = env_state
        bbox = np.asarray(env._part_bbox(state.sim))
        out = bbox[:, 0] - bbox[:, 4]
        out = out / np.linalg.norm(out, axis=-1, keepdims=True)
        # out must be ±world x with +x dominating (yaw randomization ≤ 15°)
        assert np.all(out[:, 0] > 0.9), out
        # handle z within the scaled cabinet height
        mid = 0.5 * (bbox[:, 0] + bbox[:, 6])
        assert np.all(mid[:, 2] > 0.4) and np.all(mid[:, 2] < 1.3)

    def test_bbox_moves_with_drawer_joint(self, env_state):
        env, state = env_state
        bbox0 = np.asarray(env._part_bbox(state.sim))
        q = state.sim.obj.qpos
        td = jnp.asarray(env.target_dof)
        q2 = q.at[jnp.arange(4), td].add(0.1)
        sim2 = state.sim._replace(obj=state.sim.obj._replace(qpos=q2))
        bbox1 = np.asarray(env._part_bbox(sim2))
        delta = bbox1 - bbox0
        # axis_dir local (−1,0,0) → world ≈ +x after the 180° root yaw
        assert np.all(delta[..., 0] > 0.08), delta[..., 0].min()
        assert np.allclose(delta[..., 2], 0, atol=1e-3)

    def test_step_runs(self, env_state):
        env, state = env_state
        step = jax.jit(lambda s, a: env.step(s, a, train=True))
        a = jnp.zeros((4, env.num_actions))
        state, obs, rew, reset, extras = step(state, a)
        assert np.isfinite(np.asarray(rew)).all()
        for k in ["is_open", "is_grasped", "joint_state_reward",
                  "success_objnum", "rot_reward", "open_frac"]:
            assert k in extras
        assert extras["success_objnum"].shape == (3,)

    def test_success_requires_grasp_and_half_open(self, env_state):
        """Teleport the drawer to 60 % open without a grasp: is_open_notgrasp
        fires but success does not (open_drawer.py:227)."""
        env, state = env_state
        td = jnp.asarray(env.target_dof)
        upper = jnp.asarray(env.joint_upper)
        q2 = state.sim.obj.qpos.at[jnp.arange(4), td].set(0.6 * upper)
        state2 = state._replace(
            sim=state.sim._replace(obj=state.sim.obj._replace(qpos=q2)))
        obs, view, part_bbox = env._observations(state2)
        rew, success, succ_objid, extras = env._reward(
            state2, view, part_bbox, None)
        assert bool(extras["is_open_notgrasp"].all())
        assert not bool(success.any())
        assert not bool(succ_objid.any())


class TestNonTargetDofsSimulated:
    """Every cabinet joint is a real simulated dof (≙ the reference setting
    DOF props for all object dofs, open_drawer.py:162-167)."""

    def test_all_drawers_are_dofs(self, env_state):
        env, state = env_state
        # procedural cabinets carry 2-3 drawers; every one is prismatic
        dof_counts = np.asarray(env.scene.obj_tree.dof_mask).sum(-1)
        assert (dof_counts >= 2).all(), dof_counts

    def test_non_target_dof_inert_for_reward_and_obs(self, env_state):
        env, state = env_state
        td = np.asarray(env.target_dof)
        D = state.sim.obj.qpos.shape[1]
        # pick a non-target active dof per env
        dm = np.asarray(env.scene.obj_tree.dof_mask)
        nt = np.array([next(d for d in range(D)
                            if dm[e, d] > 0 and d != td[e])
                       for e in range(4)])
        q2 = state.sim.obj.qpos.at[jnp.arange(4), jnp.asarray(nt)].add(0.1)
        state2 = state._replace(
            sim=state.sim._replace(obj=state.sim.obj._replace(qpos=q2)))
        obs0, view0, bbox0 = env._observations(state)
        obs1, view1, bbox1 = env._observations(state2)
        np.testing.assert_allclose(np.asarray(obs0["normal_state"]),
                                   np.asarray(obs1["normal_state"]),
                                   atol=1e-6)
        r0 = env._reward(state, view0, bbox0, None)[0]
        r1 = env._reward(state2, view1, bbox1, None)[0]
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)

    def test_non_target_drawer_moves_when_pushed(self, env_state):
        """A velocity kick on a non-target drawer integrates forward — the
        joint is simulated, not frozen."""
        from partmanip_tpu.sim import engine
        env, state = env_state
        td = np.asarray(env.target_dof)
        D = state.sim.obj.qpos.shape[1]
        dm = np.asarray(env.scene.obj_tree.dof_mask)
        nt = np.array([next(d for d in range(D)
                            if dm[e, d] > 0 and d != td[e])
                       for e in range(4)])
        idx = (jnp.arange(4), jnp.asarray(nt))
        v2 = state.sim.obj.qvel.at[idx].set(0.5)
        sim = state.sim._replace(obj=state.sim.obj._replace(qvel=v2))
        targets = jnp.tile(jnp.asarray(env.default_dof), (4, 1))
        sim2 = jax.jit(lambda s: engine.physics_step(env.scene, s,
                                                     targets))(sim)
        moved = np.asarray(sim2.obj.qpos[idx])
        assert (moved > 1e-3).all(), moved
        # target dof stays put
        t_idx = (jnp.arange(4), jnp.asarray(td))
        assert np.allclose(np.asarray(sim2.obj.qpos[t_idx]), 0.0, atol=1e-4)


class TestStabilityUnderRandomActions:
    def test_no_blowup_at_inner1(self):
        """open_drawer integrates at h = dt/substeps (inner_substeps=1, the
        task-level sim override): random-policy stepping stays bounded and
        finite — the PPO exploration regime."""
        import random as pyrandom
        pyrandom.seed(1)
        cfg, sp = config.process_cfgs(
            ["--taskcfg", "open_drawer", "--algo.num_envs", "2",
             "--task.asset.num_objects", "2", "--task.maxEpisodeLength", "50",
             "--task.asset.assetRoot", "/tmp/partmanip_assets_stab"])
        assert sp.inner_substeps == 1
        env = OpenDrawerEnv(cfg["task"], sp)
        state = env.init_state(jax.random.PRNGKey(0))
        state, obs = jax.jit(env.reset)(state)
        step = jax.jit(lambda s, a: env.step(s, a, train=True))
        rng = np.random.RandomState(0)
        for i in range(60):
            a = jnp.asarray(rng.uniform(-1, 1, (2, env.num_actions))
                            .astype(np.float32))
            state, obs, rew, reset, extras = step(state, a)
        o = np.asarray(obs["normal_state"])
        assert np.isfinite(o).all()
        assert float(jnp.abs(state.sim.robot.qvel).max()) < 10.0
        assert np.isfinite(np.asarray(rew)).all()
