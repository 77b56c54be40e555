"""Eval-probe for a trained grasp_cube PPO ckpt: watch what the policy DOES.

Loads a ckpt, rolls the deterministic policy on a few envs, and prints the
tip trajectory vs the cube — distinguishes (a) policy sits still,
(b) moves the wrong way (obs/frame bug), (c) oscillates (control fight).

Run: python scripts/probe_cube_policy.py --ckpt logs/ckpts/grasp_cube_ppo/cube_r3_seed101/model_14000.ckpt
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
from partmanip_tpu.algos import rms as rms_lib
from partmanip_tpu.utils.logger import Logger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--envs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--stochastic", action="store_true")
    args = ap.parse_args()

    cfg, sim_params = process_cfgs(argv=[
        "--taskcfg", "grasp_cube", "--algocfg", "ppo",
        "--algo.num_envs", str(args.envs)])
    env = GraspCubeEnv(cfg["task"], sim_params)

    from partmanip_tpu.algos.ppo import PPO
    logger = Logger(cfg, "probe_cube", "grasp_cube", "ppo")
    runner = PPO(env, cfg["algo"], logger)
    ts, env_state = runner.init_state(seed=3)
    ts = runner.resume(ts, args.ckpt)

    @jax.jit
    def step_fn(ts, env_state, o, k):
        if args.stochastic:
            actions, _, _, mu, _ = runner.ac.random_act_cri(ts.params, o, k)
        else:
            actions, _ = runner.ac.act_cri(ts.params, o)
            mu = actions
        env_state, next_obs, rew, dones, extras = env.step(
            env_state, actions, train=False)
        o2 = runner._select_obs(next_obs)
        if runner.tricks["use_state_norm"]:
            o2, _ = rms_lib.normalize(ts.rms, o2, False)
        return env_state, o2, actions, rew, extras

    env_state, obs = runner._jit_reset(env_state)
    o = runner._select_obs(obs)
    if runner.tricks["use_state_norm"]:
        o, _ = rms_lib.normalize(ts.rms, o, False)

    rng = jax.random.PRNGKey(0)
    for t in range(args.steps):
        rng, k = jax.random.split(rng)
        env_state, o, act, rew, extras = step_fn(ts, env_state, o, k)
        if t % 5 == 0 or t == args.steps - 1:
            view, _ = env._robot_view(env_state.sim)
            tip = np.asarray(view.tip_pos)
            objp = np.asarray(env_state.sim.body.pos)
            d = np.linalg.norm(tip - objp, axis=-1)
            a = np.asarray(act)
            print(f"t={t:3d} d={np.round(d, 4).tolist()} "
                  f"tip0={np.round(tip[0], 3).tolist()} "
                  f"obj0={np.round(objp[0], 3).tolist()} "
                  f"act0={np.round(a[0], 2).tolist()} rew0={float(rew[0]):.3f}")
    # RMS sanity: what does the normalizer think of obj_pos dims (7:10)?
    mean = np.asarray(ts.rms.mean)[0]
    std = np.asarray(ts.rms.std)[0]
    print("rms mean[0:12]:", np.round(mean[:12], 3).tolist())
    print("rms std [0:12]:", np.round(std[:12], 4).tolist())


if __name__ == "__main__":
    main()
