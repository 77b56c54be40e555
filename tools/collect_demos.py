"""Collect vision-labelled expert demonstrations for BC/DAgger.

≙ the reference's demo pipeline: PPO eval pose dumps (``ppo.py:177-189``) +
offline TSDF re-rendering (``data_proc/``, ``cfg/algos/bc.yaml:data_path``).
Here both happen in one pass: roll a trained state-based PPO teacher while
the env also renders the student observation (mesh_tsdf by default), and
write ``scene_XXXXX/step_XXXXX.npy`` dicts with keys
``tsdf``, ``action``, ``proprio_state``, ``tea_obs`` — the layout
``Tsdf_Dataset`` / ``add_transitions_offline`` consume
(``algorithms/bc.py:12-31``, ``algo_utils/storage.py:58-82``).

Usage:
    python tools/collect_demos.py --teacher logs/ckpts/.../model_X.ckpt \
        --out ./logs/tsdf_demos --episodes 4 --algo.num_envs 16
"""

import argparse
import os
import sys
from os.path import join as pjoin

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", required=True)
    ap.add_argument("--out", default="./logs/tsdf_demos")
    ap.add_argument("--episodes", type=int, default=1)
    ap.add_argument("--obs_mode", default="mesh_tsdf")
    ap.add_argument("--only_success", action="store_true",
                    help="keep only successful episodes "
                         "(≙ data_proc/choose_success_scene_pose.py)")
    args, others = ap.parse_known_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from partmanip_tpu import config
    from partmanip_tpu.envs.grasp_cube import GraspCubeEnv
    from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
    from partmanip_tpu.models.actor_critic import ActorCritic
    from partmanip_tpu.utils import checkpoint as ckpt_lib

    cfg, sp = config.process_cfgs(
        others + ["--algo.obs_mode", args.obs_mode,
                  "--algo.add_proprio_obs"])
    cfg["task"]["learn_input_mode"] = args.obs_mode
    cfg["task"]["add_proprio_obs"] = True
    env_cls = {"grasp_cube": GraspCubeEnv,
               "open_drawer": OpenDrawerEnv}[cfg["task_name"]]
    env = env_cls(cfg["task"], sp)

    tea = ckpt_lib.load(args.teacher)
    tea_mode = tea["obs_mode"]
    teacher = ActorCritic(env.num_obs[tea_mode], env.num_actions,
                          tea["model_cfg"])
    tparams = ckpt_lib.restore_like(teacher.init(jax.random.PRNGKey(0)),
                                    tea["params"])

    step = jax.jit(lambda s, a: env.step(s, a, train=False))
    reset = jax.jit(env.reset)
    tea_rms = None
    if tea.get("tricks", {}).get("use_state_norm") and "rms" in tea:
        from partmanip_tpu.algos import rms as rms_lib
        tea_rms = jax.tree.map(jnp.asarray, tea["rms"])

    def _act(o):
        if tea_rms is not None:
            o, _ = rms_lib.normalize(tea_rms, o, False)
        return teacher.act(tparams, o)
    act = jax.jit(_act)

    state = env.init_state(jax.random.PRNGKey(0))
    scene_id = 0
    res = int(cfg["task"]["obs_mode"]["tsdf"]["resolution"])
    for ep in range(args.episodes):
        state, obs = reset(state)
        records = [[] for _ in range(env.num_envs)]
        ever_success = np.zeros(env.num_envs, bool)
        for t in range(env.max_episode_length):
            a = act(obs[tea_mode])
            vis = np.asarray(obs[args.obs_mode])
            prop = np.asarray(obs.get(
                "proprio_state", jnp.zeros((env.num_envs, 0))))
            tea_obs = np.asarray(obs[tea_mode])
            state, obs, rew, reset_buf, extras = step(state, a)
            ever_success |= np.asarray(state.success)
            a_np = np.asarray(a)
            for e in range(env.num_envs):
                n_prop = prop.shape[1]
                tsdf = vis[e][:vis.shape[1] - n_prop] if n_prop else vis[e]
                records[e].append({
                    "tsdf": tsdf.reshape(res, res, res),
                    "proprio_state": prop[e],
                    "action": a_np[e],
                    "tea_obs": tea_obs[e],
                })
        success = ever_success | np.asarray(state.success)
        for e in range(env.num_envs):
            if args.only_success and not success[e]:
                continue
            d = pjoin(args.out, f"scene_{scene_id:05d}")
            os.makedirs(d, exist_ok=True)
            for t, rec in enumerate(records[e]):
                np.save(pjoin(d, f"step_{t:05d}.npy"), rec)
            scene_id += 1
    print(f"wrote {scene_id} episodes to {args.out}")


if __name__ == "__main__":
    main()
