"""Scripted grasp-and-pull diagnostic for open_drawer.

Drives the ik control mode with a hand-written state machine:
pre-grasp in front of the handle -> approach -> close -> pull along the
opening axis.  If this can't reach open_frac ~1, the ceiling is
physics/control (drive strength, anchor stiction); if it can, the expert's
plateau is an RL/asset-difficulty issue.  (Counterpart of diag_cube.py,
which validated the braking-aware drive on grasp_cube.)

Run: python scripts/diag_drawer.py [--envs 4] [--steps 220] [--tpu]
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
from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
import partmanip_tpu.ops.rotations as rot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=220)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--asset_root", default="assets")
    ap.add_argument("--probe", action="store_true",
                    help="open-loop tracking probe: command pure-axis tip "
                         "deltas (no orientation servo) and report achieved "
                         "vs commanded motion per 20-step leg")
    ap.add_argument("--probe_orn", action="store_true",
                    help="probe legs also command the grasp orientation")
    ap.add_argument("--fric", type=float, default=None,
                    help="override ALL object joint friction (reference "
                         "fixes 5.0 for every drawer dof, open_drawer.py:165)")
    ap.add_argument("--damp", type=float, default=None,
                    help="override ALL object joint damping (reference: 20)")
    args = ap.parse_args()

    import random as pyrandom
    pyrandom.seed(0)          # env→variant shuffle (open_drawer.py:82)
    np.random.seed(0)
    cfg, sim_params = process_cfgs(argv=[
        "--taskcfg", "open_drawer", "--algocfg", "ppo",
        "--algo.num_envs", str(args.envs),
        "--task.asset.assetRoot", args.asset_root])
    tcfg = cfg["task"]
    tcfg["random_reset"] = False
    env = OpenDrawerEnv(tcfg, sim_params)
    if args.fric is not None or args.damp is not None:
        ot = env.scene.obj_tree
        if args.fric is not None:
            ot = ot._replace(dof_friction=np.full_like(
                np.asarray(ot.dof_friction), args.fric))
        if args.damp is not None:
            ot = ot._replace(dof_damping=np.full_like(
                np.asarray(ot.dof_damping), args.damp))
        env.scene = env.scene._replace(obj_tree=ot)
        print(f"override obj dof friction={args.fric} damping={args.damp}")

    state = env.init_state(jax.random.PRNGKey(0))
    state, obs = env.reset(state)

    @jax.jit
    def step(state, actions):
        return env.step(state, actions, train=False)

    def views(state):
        view, _ = env._robot_view(state.sim)
        return view

    E = args.envs
    bbox = np.asarray(env.part_bbox_init)            # [E, 8, 3] local
    ext = bbox.max(axis=1) - bbox.min(axis=1)        # [E, 3]
    bar_vertical = ext[:, 2] > ext[:, 1]
    tgt_dof = np.asarray(env.target_dof)
    upper = np.asarray(env.joint_upper)

    @jax.jit
    def handle_world(sim):
        # handle center + opening dir in WORLD frame via the env's own FK
        # (part_bbox_init / part_axis_dir are cabinet-local; _part_bbox
        # applies root_quat/root_pos)
        pb = env._part_bbox(sim)
        mid = 0.5 * (pb.min(axis=1) + pb.max(axis=1))
        R = rot.quat_to_mat(sim.obj.root_quat)
        ax = jnp.einsum("eab,eb->ea", R, jnp.asarray(env.part_axis_dir))
        return mid, ax

    # grasp orientation (matches the reward's alignment terms): hand z
    # (approach) = -out = world -x (cabinet sits at x=-0.6 rotated 180°, so
    # drawers open toward +x); hand y (finger separation) along the bar's
    # SHORT axis: world z for a horizontal bar, world y for a vertical one.
    # Columns of the matrix are (hand_x, hand_y, hand_z) in world.
    q_h = np.asarray(rot.mat_to_quat(jnp.asarray(
        np.array([[0, 0, -1], [-1, 0, 0], [0, 1, 0]], np.float32)[None])))[0]
    q_v = np.asarray(rot.mat_to_quat(jnp.asarray(
        np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float32)[None])))[0]
    grasp_q = np.where(bar_vertical[:, None], q_v[None], q_h[None])

    # mobile franka: actions are [base(3), dpos(3), dorn(3), grip];
    # fixed-base grasp_cube layout is [dpos(3), dorn(3), grip]
    off = 3 if env.ctrl.mobile else 0

    if args.probe:
        # Six 20-step legs: +x -x +y -y +z -z, each commanding a saturated
        # pure-axis delta (0.005 m/step).  Perfect tracking moves the tip
        # 0.1 m along the commanded axis and ~0 along the others.
        legs = [(0, +1), (0, -1), (1, +1), (1, -1), (2, +1), (2, -1)]
        for ax, sgn in legs:
            view = views(state)
            start = np.asarray(view.tip_pos)
            for t in range(20):
                view = views(state)
                act = np.zeros((E, env.num_actions), np.float32)
                act[:, off + ax] = sgn
                if args.probe_orn:
                    tipq = np.asarray(view.tip_state[:, 3:7])
                    oerr = np.asarray(rot.orientation_error(
                        jnp.asarray(grasp_q), jnp.asarray(tipq)))
                    act[:, off + 3:off + 6] = np.clip(oerr / 0.005, -1, 1)
                state, obs, rew, reset, extras = step(state, jnp.asarray(act))
            view = views(state)
            end = np.asarray(view.tip_pos)
            moved = end - start
            qv = np.asarray(view.qvel)
            arm_spd = np.abs(qv[:, 3:-2] if off else qv[:, :-2]).max(axis=1)
            want = np.zeros(3)
            want[ax] = sgn * 20 * 0.005
            print(f"leg axis={'xyz'[ax]}{'+' if sgn > 0 else '-'} "
                  f"want={np.round(want, 3).tolist()} "
                  f"moved0={np.round(moved[0], 3).tolist()} "
                  f"moved1={np.round(moved[1], 3).tolist()} "
                  f"arm_spd={np.round(arm_spd, 2).tolist()}")
        return

    print("handle ext (out,long,short ~ x,?,?):", np.round(ext, 3).tolist())
    print("bar_vertical:", bar_vertical.tolist(),
          "travel:", np.round(upper, 3).tolist())

    phase = np.zeros(E, np.int32)  # 0 pre, 1 approach, 2 close, 3 pull
    close_timer = np.zeros(E, np.int32)
    appr_timer = np.zeros(E, np.int32)
    for t in range(args.steps):
        view = views(state)
        tip = np.asarray(view.tip_pos)
        tipq = np.asarray(view.tip_state[:, 3:7])
        gl = np.asarray(view.gripper_length)
        q = np.asarray(state.sim.obj.qpos)[np.arange(E), tgt_dof]
        handle_j, axis_j = handle_world(state.sim)
        handle = np.asarray(handle_j)
        axis_dir = np.asarray(axis_j, np.float64)

        act = np.zeros((E, env.num_actions), np.float32)
        for e in range(E):
            if phase[e] == 0:
                tgt = handle[e] + 0.12 * axis_dir[e]
                if np.linalg.norm(tip[e] - tgt) < 0.015:
                    phase[e] = 1
            elif phase[e] == 1:
                tgt = handle[e]
                appr_timer[e] += 1
                # close when centered — or when jammed close enough that a
                # squeeze would still catch the bar (RL closes there too)
                if (np.linalg.norm(tip[e] - tgt) < 0.008
                        or (appr_timer[e] > 60
                            and np.linalg.norm(tip[e] - tgt) < 0.025)):
                    phase[e] = 2
            elif phase[e] == 2:
                tgt = handle[e]
                close_timer[e] += 1
                if close_timer[e] > 40:
                    phase[e] = 3
            else:
                tgt = handle[e] + 0.08 * axis_dir[e]  # keep leading the pull
            err = tgt - tip[e]
            act[e, off:off + 3] = np.clip(err / 0.005, -1, 1)
            if off:
                # walk the mobile base toward the work too — without it the
                # arm IK deadlocks at the workspace boundary (DLS damps to
                # zero at full extension; handles at x≈-0.43 from base x=0.4
                # are at the reach limit).  The controller subtracts the
                # commanded base delta from the IK residual, so commanding
                # both splits the motion naturally (control.py:130-133).
                # Net frame: control rotates the action by Rᵀ into base
                # joint space and FK maps joint offsets back through R, so
                # the commanded action IS the world-frame delta (verified
                # empirically: pre-rotating drives the base away).
                act[e, :3] = np.clip(err / 0.005, -1, 1)
            oerr = np.asarray(rot.orientation_error(
                jnp.asarray(grasp_q[e:e + 1]),
                jnp.asarray(tipq[e:e + 1])))[0]
            act[e, off + 3:off + 6] = np.clip(oerr / 0.005, -1, 1)
            act[e, off + 6] = 1.0 if phase[e] < 2 else -1.0
        state, obs, rew, reset, extras = step(state, jnp.asarray(act))
        if t % 20 == 0 or t == args.steps - 1:
            d = np.linalg.norm(tip - handle, axis=-1)
            of = q / np.maximum(upper, 1e-6)
            qv = np.asarray(view.qvel)
            arm_spd = np.abs(qv[:, 3:-2] if off else qv[:, :-2]).max(axis=1)
            base = np.asarray(view.qpos)[:, :3] if off else np.zeros((E, 3))
            print(f"t={t:3d} phase={phase.tolist()} "
                  f"tip_to_handle={np.round(d, 4).tolist()} "
                  f"gl={np.round(gl, 4).tolist()} "
                  f"open_frac={np.round(of, 3).tolist()} "
                  f"arm_spd={np.round(arm_spd, 2).tolist()} "
                  f"base={np.round(base, 3).tolist()} "
                  f"grasped={np.asarray(extras['is_grasped']).tolist()} "
                  f"succ={np.asarray(state.success).tolist()}")
            print(f"      tip0={np.round(tip[0], 3).tolist()} "
                  f"handle0={np.round(handle[0], 3).tolist()} "
                  f"axis0={np.round(axis_dir[0], 2).tolist()} "
                  f"tip1={np.round(tip[1], 3).tolist()} "
                  f"handle1={np.round(handle[1], 3).tolist()}")
    print("final success:", np.asarray(state.success).tolist())


if __name__ == "__main__":
    main()
