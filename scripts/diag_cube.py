"""Scripted grasp-and-lift diagnostic for grasp_cube (VERDICT r2 item #2).

Drives the ik control mode with a hand-written state machine:
reach above cube -> descend -> close -> lift to (0,0,0.2).
If this can't succeed, the problem is physics/control; if it can, the
problem is obs/reward/RL.

Run: python scripts/diag_cube.py [--envs 4] [--random] [--steps 260]
"""
import argparse
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from partmanip_tpu.config import process_cfgs
from partmanip_tpu.envs.grasp_cube import GraspCubeEnv
from partmanip_tpu.sim.types import SimParams
from partmanip_tpu.envs import control as ctrl_lib
from partmanip_tpu.sim import kinematics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4)
    ap.add_argument("--random", action="store_true")
    ap.add_argument("--steps", type=int, default=260)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    cfg, sim_params = process_cfgs(argv=[
        "--taskcfg", "grasp_cube", "--algocfg", "ppo",
        "--algo.num_envs", str(args.envs)])
    tcfg = cfg["task"]
    tcfg["random_reset"] = bool(args.random)
    env = GraspCubeEnv(tcfg, sim_params)

    state = env.init_state(jax.random.PRNGKey(0))
    state, obs = env.reset(state)

    @jax.jit
    def step(state, actions):
        return env.step(state, actions, train=False)

    def views(state):
        view, _ = env._robot_view(state.sim)
        return view

    E = args.envs
    phase = np.zeros(E, np.int32)  # 0 hover, 1 descend, 2 close, 3 lift
    close_timer = np.zeros(E, np.int32)
    grasp_pt = np.zeros((E, 3), np.float32)
    for t in range(args.steps):
        view = views(state)
        tip = np.asarray(view.tip_pos)
        tipq = np.asarray(view.tip_state[:, 3:7])
        gl = np.asarray(view.gripper_length)
        objp = np.asarray(state.sim.body.pos)
        qv = np.asarray(view.qvel)
        arm_spd = np.abs(qv[:, :-2]).max(axis=1)

        act = np.zeros((E, env.num_actions), np.float32)
        for e in range(E):
            if phase[e] == 0:
                tgt = objp[e] + np.array([0, 0, 0.12])
                if np.linalg.norm(tip[e] - tgt) < 0.01:
                    phase[e] = 1
            elif phase[e] == 1:
                tgt = objp[e] + np.array([0, 0, 0.0])
                # settle before closing: a policy closing mid-flight slaps
                # the cube out of the gripper (see CLAUDE.md round-3 notes).
                # 0.025 trigger (was 0.006): with the fingers straddling the
                # cube, rubbing friction stalls the tip-center descent a
                # couple of cm above the cube center — which is already a
                # graspable straddle (fingers extend below the tip).
                if np.linalg.norm(tip[e] - tgt) < 0.025 and arm_spd[e] < 0.1:
                    phase[e] = 2
                    grasp_pt[e] = tgt
            elif phase[e] == 2:
                tgt = grasp_pt[e]      # hold still; do not chase the cube
                close_timer[e] += 1
                if close_timer[e] > 60:
                    phase[e] = 3
            else:
                tgt = np.array([0, 0, 0.2])
            err = tgt - tip[e]
            act[e, :3] = np.clip(err / 0.005, -1, 1)
            # keep hand pointing down: servo orientation toward the
            # reference heuristic grasp quat (-0.5,0.5,0.5,-0.5)
            import partmanip_tpu.ops.rotations as rot
            gq = jnp.asarray([[-0.5, 0.5, 0.5, -0.5]])
            oerr = np.asarray(rot.orientation_error(
                gq, jnp.asarray(tipq[e:e + 1])))[0]
            act[e, 3:6] = np.clip(oerr / 0.005, -1, 1)
            # half-speed close: gentle pinch instead of a slap
            act[e, 6] = 1.0 if phase[e] < 2 else -0.4
        state, obs, rew, reset, extras = step(state, jnp.asarray(act))
        if t % 20 == 0 or t == args.steps - 1 or (55 <= t <= 125 and t % 5 == 0):
            d = np.linalg.norm(tip - objp, axis=-1)
            qv = np.asarray(view.qvel)
            print(f"t={t:3d} phase={phase.tolist()} "
                  f"tcp_to_obj={np.round(d, 4).tolist()} "
                  f"gl={np.round(gl, 4).tolist()} "
                  f"objz={np.round(objp[:, 2], 4).tolist()} "
                  f"reached={np.asarray(extras['is_reached']).tolist()} "
                  f"succ={np.asarray(state.success).tolist()}")
            print(f"      tip0={np.round(tip[0], 3).tolist()} "
                  f"obj0={np.round(objp[0], 3).tolist()} "
                  f"armv0={np.round(qv[0, :7], 2).tolist()} "
                  f"fing0={np.round(np.asarray(view.qpos)[0, -2:], 4).tolist()}")
    print("final success:", np.asarray(state.success).tolist())
    print("final obj pos:", np.round(np.asarray(state.sim.body.pos), 4).tolist())


if __name__ == "__main__":
    main()
