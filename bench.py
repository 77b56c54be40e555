"""Benchmark: aggregate PPO env-steps/sec on open_drawer.

Measures the reference's headline FPS metric (``Progress/FPS``,
``algorithms/ppo.py:269``): n_steps × num_envs / (collection + learn) for the
fused train iteration (sim + render-free obs + GAE + updates in one program)
at the BASELINE.json workload (4096 envs, PPO 8 steps / 5 updates / 8
minibatches, MLP 512³).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N/1e6}
"""

import argparse
import json
import sys
import time


def vision_main(args):
    """--vision: depth-camera throughput at the reference camera workload
    [envs, 3 views, 288, 512] (``tasks/hand_base.py:318-322``)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from partmanip_tpu import config
    from partmanip_tpu.envs import vision
    from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
    from partmanip_tpu.ops import raymarch

    cfg, sp = config.process_cfgs([
        "--taskcfg", "open_drawer",
        "--algo.num_envs", str(args.envs),
        "--task.asset.num_objects", "16",
    ])
    env = OpenDrawerEnv(cfg["task"], sp)
    rig = vision.VisionRig(cfg["task"]["cam"], cfg["task"]["obs_mode"]["tsdf"],
                           "depth_tsdf")
    state = env.init_state(jax.random.PRNGKey(0))

    @jax.jit
    def render(sim):
        prims = vision.scene_prims(env, sim)
        return raymarch.render_depth(prims, rig.poses, rig.intrinsic,
                                     rig.im_h, rig.im_w)

    d = render(state.sim)
    _ = float(d[0, 0, 0, 0])          # force compile + completion
    t0 = time.time()
    for _ in range(args.iters):
        d = render(state.sim)
    _ = float(d[0, 0, 0, 0])
    dt = time.time() - t0
    frames = args.envs * args.iters   # one frame = 3 views
    value = frames / dt
    print(json.dumps({
        "metric": f"depth_render_env_frames_per_sec_{args.envs}envs_3x288x512",
        "value": round(value, 1),
        "unit": "env-frames/s",
        # fraction of rendering EVERY control step (30 Hz) for all envs
        "vs_baseline": round(value / (30.0 * args.envs), 4),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--task", default="open_drawer")
    ap.add_argument("--vision", action="store_true",
                    help="bench the depth renderer instead of PPO")
    ap.add_argument("--mesh", action="store_true",
                    help="mesh-handle assets (baked-SDF contact workload)")
    args = ap.parse_args()
    if args.vision:
        return vision_main(args)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from partmanip_tpu import config
    from partmanip_tpu.algos.ppo import PPO

    class _L:
        save_ckpt_dir = "/tmp/bench_ckpt"

        def info(self, *a, **k):
            pass

    cfg_args = [
        "--taskcfg", args.task,
        "--algo.num_envs", str(args.envs),
        "--task.asset.num_objects", "16",
    ]
    if args.mesh:
        cfg_args.append("--task.asset.mesh_handle")
    cfg, sp = config.process_cfgs(cfg_args)
    if args.task == "open_drawer":
        from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
        env = OpenDrawerEnv(cfg["task"], sp)
    else:
        from partmanip_tpu.envs.grasp_cube import GraspCubeEnv
        env = GraspCubeEnv(cfg["task"], sp)
    ppo = PPO(env, cfg["algo"], _L())

    import jax
    ts, env_state = ppo.init_state(seed=0)
    # warmup twice: the first call compiles for the weak-typed init state,
    # the second for the canonical (fed-back) signature used steadily.
    ts, env_state, metrics = ppo._jit_train_iter(ts, env_state, ppo.lr)
    _ = float(list(metrics.values())[0])
    ts, env_state, metrics = ppo._jit_train_iter(ts, env_state, ppo.lr)
    _ = float(list(metrics.values())[0])

    # Pipelined metric fetch, matching PPO.run: iteration i's scalars are
    # pulled while i+1 runs on-device, so the loop never blocks on the
    # device→host RTT; the trailing fetch forces completion of the last
    # iteration (block_until_ready returns early through tunneled runtimes).
    t0 = time.time()
    prev = None
    for _ in range(args.iters):
        ts, env_state, metrics = ppo._jit_train_iter(ts, env_state, ppo.lr)
        if prev is not None:
            _ = float(list(prev.values())[0])
        prev = metrics
    _ = float(list(prev.values())[0])
    dt = time.time() - t0

    steps = ppo.n_steps * args.envs * args.iters
    value = steps / dt
    task_tag = args.task + ("_mesh" if args.mesh else "")
    print(json.dumps({
        "metric": f"aggregate_env_steps_per_sec_{task_tag}_{args.envs}envs",
        "value": round(value, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(value / 1_000_000, 4),
    }))


if __name__ == "__main__":
    main()
