"""Controller calibration harness (≙ ``tune_pid.py``).

Drives the mobile Franka with random ik-mode actions and reports achieved-
vs-commanded tip / base / gripper deltas over ``control_freq_inv`` physics
steps (``tune_pid.py:102-142``) — the tool that validates the PD gain table
and the 0.005 action scale against the simulator.

Usage: python tools/tune_pid.py [--envs 10] [--steps 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=10)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cfi", type=int, default=2)
    ap.add_argument("--const", action="store_true",
                    help="steady-state mode: hold one constant unit command "
                         "per channel and report achieved delta per control "
                         "step vs commanded (tracking-bandwidth view; the "
                         "default random mode measures transients)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from partmanip_tpu.envs import control
    from partmanip_tpu.sim import engine, franka, kinematics
    from partmanip_tpu.sim.types import SimParams, TreeState

    E = args.envs
    built = franka.build_franka(mobile=True)
    spheres = franka.franka_collision_spheres(built)
    bi = franka.franka_body_indices(built)
    params = SimParams(coriolis=False, inner_substeps=2)
    scene = engine.SceneSpec(robot=built.spec, spheres=spheres, params=params)

    q0 = np.array([0, 0, 0, -0.2724, -0.1511, 0.2898, -2.3792, -2.8973,
                   2.4690, 2.3973, 0.04, 0.04], np.float32)
    state = engine.SceneState(robot=TreeState(
        qpos=jnp.tile(jnp.asarray(q0), (E, 1)), qvel=jnp.zeros((E, 12)),
        root_pos=jnp.zeros((E, 3)),
        root_quat=jnp.tile(jnp.array([0.0, 0, 0, 1]), (E, 1))))

    cfg = control.FrankaControlConfig(
        drive_mode="ik", mobile=True, dt=params.dt, num_dofs=12,
        lefttip_idx=bi["lefttip"], righttip_idx=bi["righttip"])

    @jax.jit
    def step(state, action):
        fk = kinematics.forward_kinematics(scene.robot, state.robot)
        view = control.robot_view(cfg, scene.robot, fk, state.robot)
        tgt = control.compute_targets(cfg, scene.robot, view, action)
        new = state
        for _ in range(args.cfi):
            new = engine.physics_step(scene, new, tgt)
        fk2 = kinematics.forward_kinematics(scene.robot, new.robot)
        view2 = control.robot_view(cfg, scene.robot, fk2, new.robot)
        return new, view, view2

    if args.const:
        # one channel at a time: base x (a0), tip x (a3), gripper (a9)
        # gripper starts fully open → command closing (−1)
        chans = {"base_x": (0, 1.0, 0.005), "tip_x": (3, 1.0, 0.005),
                 "grip": (9, -1.0, -2 * params.dt / 5)}
        for name, (ci, sign, scale) in chans.items():
            st = state
            a = jnp.zeros((E, 10)).at[:, ci].set(sign)
            deltas = []
            for i in range(10):
                st, v0, v1 = step(st, a)
                if name == "base_x":
                    d = np.asarray(v1.qpos[:, 0] - v0.qpos[:, 0]).mean()
                elif name == "tip_x":
                    d = np.asarray(v1.tip_pos[:, 0] - v0.tip_pos[:, 0]).mean()
                else:
                    d = np.asarray(v1.gripper_length
                                   - v0.gripper_length).mean()
                deltas.append(d)
            ss = float(np.mean(deltas[3:]))
            print(f"{name}: commanded {scale:+.5f}/ctrl-step, "
                  f"achieved {ss:+.5f} (ratio {ss / scale:.3f}), "
                  f"first-step {deltas[0]:+.5f}")
        return

    rng = np.random.RandomState(0)
    errs = {"tip": [], "base": [], "grip": []}
    for i in range(args.steps):
        a = jnp.asarray(rng.uniform(-1, 1, (E, 10)).astype(np.float32))
        state, v0, v1 = step(state, a)
        tgt_tip = np.asarray(v0.tip_pos) + np.asarray(a[:, 3:6]) * 0.005
        tgt_base = (np.asarray(v0.qpos[:, :3])
                    + np.asarray(a[:, :3]) * 0.005)  # identity root
        tgt_grip = np.asarray(v0.gripper_length) \
            + 2 * np.asarray(a[:, -1]) * params.dt / 5
        n = lambda x: np.linalg.norm(x, axis=-1)
        errs["tip"].append(np.mean(
            n(np.asarray(v1.tip_pos) - tgt_tip)
            / np.maximum(n(tgt_tip - np.asarray(v0.tip_pos)), 1e-9)))
        errs["base"].append(np.mean(
            n(np.asarray(v1.qpos[:, :3]) - tgt_base)
            / np.maximum(n(tgt_base - np.asarray(v0.qpos[:, :3])), 1e-9)))
        errs["grip"].append(np.mean(
            np.abs(np.asarray(v1.gripper_length) - tgt_grip)
            / np.maximum(np.abs(tgt_grip - np.asarray(v0.gripper_length)),
                         1e-9)))
        print(f"step {i}: rel-err tip={errs['tip'][-1]:.3f} "
              f"base={errs['base'][-1]:.3f} grip={errs['grip'][-1]:.3f}")
    print("\nmean relative error (achieved vs commanded delta):")
    for k, v in errs.items():
        print(f"  {k}: {np.mean(v):.3f}")


if __name__ == "__main__":
    main()
