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
    # straddle geometry: the lowest finger-pad sphere (franka.py pads,
    # finger-local z 0.052 r 0.0065) reaches ~14 mm BELOW the tip midpoint
    # (lefttip/righttip at finger-local 0.0445), so pads bracket the cube
    # center when tip_z ≈ obj_z − 0.0075.  Descending to obj_z exactly (the
    # old target) rams the pad spheres into the cube top from ~tip_z 0.065
    # and the rub drags the cube away — the r5 diag failure mode.
    STRADDLE_DZ = -0.0075
    for t in range(args.steps):
        view = views(state)
        tip = np.asarray(view.tip_pos)
        tipq = np.asarray(view.tip_state[:, 3:7])
        gl = np.asarray(view.gripper_length)
        objp = np.asarray(state.sim.body.pos)
        qv = np.asarray(view.qvel)

        act = np.zeros((E, env.num_actions), np.float32)
        for e in range(E):
            slow_z = False
            if phase[e] == 0:
                tgt = objp[e] + np.array([0, 0, 0.10])
                if np.linalg.norm(tip[e] - tgt) < 0.008:
                    phase[e] = 1
            elif phase[e] == 1:
                # vertical straddle descent: track the cube in xy, creep in
                # z (clip ±0.35) so pad contact cannot turn into a drag
                tgt = objp[e] + np.array([0, 0, STRADDLE_DZ])
                slow_z = True
                xy_err = np.linalg.norm(tip[e][:2] - objp[e][:2])
                if xy_err < 0.008 and tip[e][2] - tgt[2] < 0.01:
                    phase[e] = 2
                    grasp_pt[e] = tgt
            elif phase[e] == 2:
                tgt = grasp_pt[e]      # hold still; do not chase the cube
                close_timer[e] += 1
                if close_timer[e] > 60:
                    phase[e] = 3
            else:
                # success wants obj within 0.025 of (0,0,0.2); a grasped obj
                # rides ~7.5 mm above the tip midpoint
                tgt = np.array([0, 0, 0.1925])
            err = tgt - tip[e]
            act[e, :3] = np.clip(err / 0.005, -1, 1)
            if slow_z:
                act[e, 2] = np.clip(act[e, 2], -0.35, 0.35)
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
