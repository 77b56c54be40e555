"""Golden-trajectory regression: a fixed action sequence through the full
engine must reproduce a committed state trace (VERDICT round-1 #9).

Solver changes that shift physics semantics (gains, contact constants,
integration order) fail here loudly; regenerate the snapshot deliberately
with ``python tests/test_golden_trajectory.py`` after verifying the change
is intended, and commit the new ``tests/golden/*.npy``.

≙ the role of the reference's controller-calibration harness + eyeballed
training curves (``tune_pid.py:102-142``, SURVEY.md §4): here it is an
exact, committed contract.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _rollout():
    """Deterministic 8-step grasp_cube rollout on the CPU backend."""
    from partmanip_tpu import config
    from partmanip_tpu.envs.grasp_cube import GraspCubeEnv

    cfg, sp = config.process_cfgs(
        ["--taskcfg", "grasp_cube", "--algo.num_envs", "2",
         "--task.asset.assetRoot", "/tmp/partmanip_assets_golden"])
    env = GraspCubeEnv(cfg["task"], sp)
    state = env.init_state(jax.random.PRNGKey(7))
    step = jax.jit(lambda s, a: env.step(s, a, train=True))
    rng = np.random.RandomState(11)
    acts = rng.uniform(-1, 1, (8, 2, env.num_actions)).astype(np.float32)
    qpos_trace, obj_trace = [], []
    for t in range(8):
        state, obs, rew, reset, extras = step(state, jnp.asarray(acts[t]))
        qpos_trace.append(np.asarray(state.sim.robot.qpos))
        obj_trace.append(np.asarray(state.sim.body.pos))
    return np.stack(qpos_trace), np.stack(obj_trace)


def test_golden_grasp_cube_trace():
    qpos, obj = _rollout()
    qpos_ref = np.load(os.path.join(GOLDEN_DIR, "grasp_cube_qpos.npy"))
    obj_ref = np.load(os.path.join(GOLDEN_DIR, "grasp_cube_objpos.npy"))
    assert np.isfinite(qpos).all() and np.isfinite(obj).all()
    np.testing.assert_allclose(qpos, qpos_ref, atol=2e-4,
                               err_msg="robot qpos trace drifted — solver "
                               "semantics changed; see module docstring")
    np.testing.assert_allclose(obj, obj_ref, atol=2e-4,
                               err_msg="cube pos trace drifted")


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # snapshots are generated and compared on the CPU backend (conftest
    # forces CPU for the suite; match it here)
    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    qpos, obj = _rollout()
    np.save(os.path.join(GOLDEN_DIR, "grasp_cube_qpos.npy"), qpos)
    np.save(os.path.join(GOLDEN_DIR, "grasp_cube_objpos.npy"), obj)
    print("snapshots written:", qpos.shape, obj.shape)
