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

    reset = jax.jit(env.reset)
    tea_rms = None
    if tea.get("tricks", {}).get("use_state_norm") and "rms" in tea:
        from partmanip_tpu.algos import rms as rms_lib
        tea_rms = jax.tree.map(jnp.asarray, tea["rms"])

    def _act(o):
        if tea_rms is not None:
            o, _ = rms_lib.normalize(tea_rms, o, False)
        return teacher.act(tparams, o)

    # Whole-episode device-side rollout: the per-step host loop costs one
    # ~8 MB obs fetch + 40 ms dispatch RTT per step (tens of minutes for 4
    # episodes at 16 envs); a lax.scan stacking (vis bf16, proprio, action,
    # tea_obs, success) on device and ONE device_get per episode amortizes
    # both (VERDICT r2 #10; ≙ the pose dumps at reference ppo.py:177-189).
    def _episode(state, obs):
        def body(carry, _):
            state, obs = carry
            a = _act(obs[tea_mode])
            out = {
                "vis": obs[args.obs_mode].astype(jnp.bfloat16),
                "prop": obs.get("proprio_state",
                                jnp.zeros((env.num_envs, 0))),
                "tea": obs[tea_mode],
                "act": a,
            }
            state, obs, rew, reset_buf, extras = env.step(state, a,
                                                          train=False)
            out["succ"] = state.success
            return (state, obs), out

        (state, obs), outs = jax.lax.scan(
            body, (state, obs), None, length=env.max_episode_length)
        return state, obs, outs

    episode = jax.jit(_episode)

    state = env.init_state(jax.random.PRNGKey(0))
    scene_id = 0
    res = int(cfg["task"]["obs_mode"]["tsdf"]["resolution"])
    for ep in range(args.episodes):
        state, obs = reset(state)
        state, obs, outs = episode(state, obs)
        outs = jax.device_get(outs)           # single transfer per episode
        vis = np.asarray(outs["vis"], np.float32)   # [T, E, O_vis]
        prop = np.asarray(outs["prop"])
        success = np.asarray(outs["succ"]).any(axis=0)
        n_prop = prop.shape[-1]
        for e in range(env.num_envs):
            if args.only_success and not success[e]:
                continue
            d = pjoin(args.out, f"scene_{scene_id:05d}")
            os.makedirs(d, exist_ok=True)
            for t in range(env.max_episode_length):
                tsdf = vis[t, e][:vis.shape[-1] - n_prop] \
                    if n_prop else vis[t, e]
                np.save(pjoin(d, f"step_{t:05d}.npy"), {
                    "tsdf": tsdf.reshape(res, res, res),
                    "proprio_state": prop[t, e],
                    "action": np.asarray(outs["act"][t, e]),
                    "tea_obs": np.asarray(outs["tea"][t, e]),
                })
            scene_id += 1
    print(f"wrote {scene_id} episodes to {args.out}")


if __name__ == "__main__":
    main()
