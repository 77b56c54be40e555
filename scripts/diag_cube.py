"""Scripted grasp-and-lift diagnostic for grasp_cube (VERDICT r2 item #2).

Drives the ik control mode with a hand-written state machine:
reach above cube -> straddle descend -> pinch -> lift to (0,0,0.2).
If this can't succeed, the problem is physics/control; if it can, the
problem is obs/reward/RL.  tests/test_scripted_grasp.py runs the same
state machine as the physics-ceiling regression gate.

Run: python scripts/diag_cube.py [--envs 4] [--random] [--steps 200] [--tpu]
"""
import argparse
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_scripted_grasp(env, state, steps: int = 200, verbose: bool = True):
    """Drive the hand-written reach/straddle/pinch/lift state machine.

    Returns (ever_succeeded [E] bool, final EnvState).  The whole grasp is
    budgeted to fit in maxEpisodeLength (200 steps) — the env resets at the
    horizon, which reads as "the lift dropped the cube" if the script
    dawdles.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import partmanip_tpu.ops.rotations as rot

    @jax.jit
    def step(state, actions):
        return env.step(state, actions, train=False)

    E = state.progress.shape[0]
    phase = np.zeros(E, np.int32)  # 0 hover, 1 descend, 2 close, 3 lift
    close_timer = np.zeros(E, np.int32)
    grasp_pt = np.zeros((E, 3), np.float32)
    ever_succ = np.zeros(E, bool)
    # straddle geometry: the lowest finger-pad sphere CENTERS (franka.py
    # pads, finger-local z 0.052; fingertips at 0.0445) sit 7.5 mm below the
    # tip midpoint, so the pads grip the cube side near its center height
    # when tip_z ~= obj_z.  The pads straddle at y = tip_y ± 0.0465 (inner
    # faces ±0.04) vs cube half-width 0.025 — 15 mm clearance per side
    # while the hand keeps its reset orientation.
    STRADDLE_DZ = +0.0025
    # Hold the RESET orientation (0,1,0,0): hand pointing down, fingers
    # opening along y — already a perfect straddle pose for the
    # axis-aligned cube.  The reference's heuristic grasp quat
    # (-0.5,0.5,0.5,-0.5) is expressed in ISAAC's tip frame; in this sim's
    # tip frame servoing to it TILTS the hand ~70° (the gripper axis goes
    # near-vertical, the lower pad hangs ~46 mm under the tip over the
    # cube's top face and bats it away — the round-5 diag failure mode).
    gq = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])

    for t in range(steps):
        view, _ = env._robot_view(state.sim)
        tip = np.asarray(view.tip_pos)
        tipq = np.asarray(view.tip_state[:, 3:7])
        gl = np.asarray(view.gripper_length)
        objp = np.asarray(state.sim.body.pos)

        act = np.zeros((E, env.num_actions), np.float32)
        oerr = np.asarray(rot.orientation_error(gq, jnp.asarray(tipq)))
        for e in range(E):
            if phase[e] == 0:
                tgt = objp[e] + np.array([0, 0, 0.10])
                if np.linalg.norm(tip[e] - tgt) < 0.015:
                    phase[e] = 1
            elif phase[e] == 1:
                # vertical straddle descent: track the cube in xy, creep in
                # z so pad contact cannot turn into a drag
                tgt = objp[e] + np.array([0, 0, STRADDLE_DZ])
                xy_err = np.linalg.norm(tip[e][:2] - objp[e][:2])
                if xy_err < 0.008 and tip[e][2] - tgt[2] < 0.01:
                    phase[e] = 2
                    grasp_pt[e] = tgt
            elif phase[e] == 2:
                # hold still while pinching (chasing the cube in z feeds
                # back into the squeeze-extrusion and the cube climbs);
                # once the pinch settles, re-center ONCE on the cube's
                # settled height (closing pops it up ~1.5 cm against the
                # ground depen — gripping the bottom edge slips on lift).
                if close_timer[e] == 20:
                    grasp_pt[e][2] = objp[e][2] + STRADDLE_DZ
                tgt = grasp_pt[e]
                close_timer[e] += 1
                if close_timer[e] > 30:
                    phase[e] = 3
            else:
                # success wants obj within 0.025 of (0,0,0.2) AND tip within
                # 0.02 of the obj; a grasped obj rides ~7.5 mm below the tip
                tgt = np.array([0, 0, 0.2075])
            err = tgt - tip[e]
            act[e, :3] = np.clip(err / 0.005, -1, 1)
            if phase[e] in (1, 2):
                act[e, 2] = np.clip(act[e, 2], -0.5, 0.5)
            elif phase[e] == 3:
                # moderate lift speed (with recede-damped contacts the
                # grasp holds; the horizon is the binding constraint)
                act[e, 2] = np.clip(act[e, 2], -0.8, 0.8)
            act[e, 3:6] = np.clip(oerr[e] / 0.005, -1, 1)
            # half-speed close: a gentle pinch holds; harder squeezing
            # extrudes the cube upward out of the point-contact grip
            act[e, 6] = 1.0 if phase[e] < 2 else -0.4
        state, obs, rew, reset, extras = step(state, jnp.asarray(act))
        ever_succ |= np.asarray(state.success)
        if verbose and (t % 20 == 0 or t == steps - 1):
            d = np.linalg.norm(tip - objp, axis=-1)
            print(f"t={t:3d} phase={phase.tolist()} "
                  f"tcp_to_obj={np.round(d, 4).tolist()} "
                  f"gl={np.round(gl, 4).tolist()} "
                  f"objz={np.round(objp[:, 2], 4).tolist()} "
                  f"reached={np.asarray(extras['is_reached']).tolist()} "
                  f"succ={np.asarray(state.success).tolist()}")
    return ever_succ, state


def main():
    import jax

    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from partmanip_tpu.config import process_cfgs
    from partmanip_tpu.envs.grasp_cube import GraspCubeEnv

    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4)
    ap.add_argument("--random", action="store_true")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    cfg, sim_params = process_cfgs(argv=[
        "--taskcfg", "grasp_cube", "--algocfg", "ppo",
        "--algo.num_envs", str(args.envs)])
    tcfg = cfg["task"]
    tcfg["random_reset"] = bool(args.random)
    env = GraspCubeEnv(tcfg, sim_params)
    state = env.init_state(jax.random.PRNGKey(0))
    state, _ = env.reset(state)

    succ, state = run_scripted_grasp(env, state, args.steps)
    print("ever success:", succ.tolist())
    print("final obj pos:",
          np.round(np.asarray(state.sim.body.pos), 4).tolist())


if __name__ == "__main__":
    main()
