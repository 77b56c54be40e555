"""Contact-energy poke test for the grasp_cube scene (round-4 diagnosis).

Drives the tip DOWN beside the cube then LATERALLY through its position at
policy-speed (saturated 5 mm/step actions), and reports how far the cube is
displaced and how high it bounces.  A 125 g cube pushed at ~0.3 m/s by a
finger should slide a few cm and stay on the ground; the trained-policy
probe (scripts/probe_cube_policy.py) saw 30 cm displacement and z up to
0.054 (rest 0.025) — this isolates whether that energy comes from the
contact model (anchor-spring slingshot / penetration pop) or the policy.

Run: python scripts/poke_cube.py [--envs 1] [--steps 160]
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
import partmanip_tpu.ops.rotations as rot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1)
    ap.add_argument("--steps", type=int, default=160)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    cfg, sim_params = process_cfgs(argv=[
        "--taskcfg", "grasp_cube", "--algocfg", "ppo",
        "--algo.num_envs", str(args.envs)])
    tcfg = cfg["task"]
    tcfg["random_reset"] = False          # cube at (0, 0, 0.025)
    env = GraspCubeEnv(tcfg, sim_params)

    state = env.init_state(jax.random.PRNGKey(0))
    state, obs = env.reset(state)

    @jax.jit
    def step(state, actions):
        return env.step(state, actions, train=False)

    E = args.envs
    gq = jnp.asarray([[-0.5, 0.5, 0.5, -0.5]])
    max_disp = 0.0
    max_z = 0.0
    for t in range(args.steps):
        view, _ = env._robot_view(state.sim)
        tip = np.asarray(view.tip_pos)
        tipq = np.asarray(view.tip_state[:, 3:7])
        objp = np.asarray(state.sim.body.pos)
        objv = np.asarray(state.sim.body.linvel)

        # phased like scripts/diag_cube.py (proven to track):
        # 0: hover above a point offset 5.5 cm beside the cube;
        # 1: descend to fingertip height beside the cube;
        # 2: sweep through the cube position at full action speed.
        if t < 70:
            tgt = np.array([0.0, -0.055, 0.14], np.float32)
        elif t < 110:
            tgt = np.array([0.0, -0.055, 0.055], np.float32)
        else:
            tgt = np.array([0.0, 0.10, 0.055], np.float32)

        act = np.zeros((E, env.num_actions), np.float32)
        for e in range(E):
            err = tgt - tip[e]
            act[e, :3] = np.clip(err / 0.005, -1, 1)
            oerr = np.asarray(rot.orientation_error(
                gq, jnp.asarray(tipq[e:e + 1])))[0]
            act[e, 3:6] = np.clip(oerr / 0.005, -1, 1)
            act[e, 6] = -1.0   # fingers closed: poke with a fingertip
        state, obs, rew, reset, extras = step(state, jnp.asarray(act))

        disp = float(np.linalg.norm(objp[0, :2]))
        max_disp = max(max_disp, disp)
        max_z = max(max_z, float(objp[0, 2]))
        if t % 10 == 0 or 58 <= t <= 100:
            print(f"t={t:3d} tip={np.round(tip[0], 3).tolist()} "
                  f"obj={np.round(objp[0], 4).tolist()} "
                  f"|objv|={float(np.linalg.norm(objv[0])):.3f}")
    print(f"RESULT max_xy_disp={max_disp:.4f} m  max_z={max_z:.4f} m "
          f"(rest z 0.025; PhysX-like expectation: disp < ~0.08, z < ~0.035)")


if __name__ == "__main__":
    main()
