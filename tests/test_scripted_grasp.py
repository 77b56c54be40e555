"""Physics-ceiling regression gate: the scripted grasp must succeed.

Runs the hand-written reach/straddle/pinch/lift state machine
(scripts/diag_cube.py) for one deterministic-spawn env and asserts the
task's own success flag fires within the 200-step horizon.  This is the
gate that round 3/4 lacked: contact-model changes that silently break
grasping (drive changes, depenetration budgets, anchor caps) fail here
instead of surfacing as "PPO mysteriously learns nothing" rounds later.
"""
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from diag_cube import run_scripted_grasp  # noqa: E402

from partmanip_tpu.config import process_cfgs
from partmanip_tpu.envs.grasp_cube import GraspCubeEnv


def test_scripted_grasp_and_lift_succeeds():
    cfg, sim_params = process_cfgs(argv=[
        "--taskcfg", "grasp_cube", "--algocfg", "ppo",
        "--algo.num_envs", "1"])
    cfg["task"]["random_reset"] = False
    env = GraspCubeEnv(cfg["task"], sim_params)
    state = env.init_state(jax.random.PRNGKey(0))
    state, _ = env.reset(state)

    succ, state = run_scripted_grasp(env, state, steps=200, verbose=False)
    obj = np.asarray(state.sim.body.pos)[0]
    assert succ.all(), (
        f"scripted grasp failed: final obj pos {obj} (needs to reach within "
        "0.025 of (0,0,0.2) while the tip stays within 0.02 of the cube)")
