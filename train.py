"""Training entry point (≙ reference ``train.py``).

Usage:
    python train.py --taskcfg grasp_cube --algocfg ppo --algo.num_envs 512
Every YAML key is exposed as a dotted CLI flag (see partmanip_tpu/config.py).
"""

import os
import random
import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from partmanip_tpu.config import process_cfgs
from partmanip_tpu.utils.logger import Logger


def set_seed(seed, exp_name, resume):
    """Seed resolution incl. seed-from-exp-name and seed-from-resume-path
    (≙ ``train.py:16-50``)."""
    if "seed" in exp_name:
        seed = int(exp_name.split("seed")[-1])
    elif resume:
        try:
            seed = int(resume.split("/")[-2].split("seed")[-1])
        except (ValueError, IndexError):
            seed = 1234
    elif seed == -1:
        seed = np.random.randint(0, 10000)
    if "seed" not in exp_name:
        exp_name = exp_name + f"_seed{seed}"
    print(f"Setting seed: {seed}")
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed, exp_name


def make_env(cfg, sim_params):
    name = cfg["task_name"]
    if name == "grasp_cube":
        from partmanip_tpu.envs.grasp_cube import GraspCubeEnv
        return GraspCubeEnv(cfg["task"], sim_params)
    if name == "open_drawer":
        from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
        return OpenDrawerEnv(cfg["task"], sim_params)
    raise NotImplementedError(name)


def make_runner(env, cfg, logger):
    name = cfg["algo_name"]
    if name == "ppo":
        from partmanip_tpu.algos.ppo import PPO
        return PPO(env, cfg["algo"], logger)
    if name == "dagger":
        from partmanip_tpu.algos.dagger import DAgger
        return DAgger(env, cfg["algo"], logger)
    if name == "bc":
        from partmanip_tpu.algos.bc import BC
        return BC(env, cfg["algo"], logger)
    raise NotImplementedError(name)


def main(argv=None):
    cfg, sim_params = process_cfgs(argv)
    cfg["seed"], cfg["exp_name"] = set_seed(
        cfg["seed"], cfg["exp_name"], cfg.get("resume"))
    logger = Logger(cfg=cfg, exp_name=cfg["exp_name"],
                    task_name=cfg["task_name"], algo_name=cfg["algo_name"])
    if cfg.get("resume"):
        cfg["algo"]["resume"] = cfg["resume"] = logger.update_resume_path(
            cfg["resume"])
    if cfg.get("pretrain"):
        cfg["algo"]["pretrain"] = cfg["pretrain"] = logger.update_resume_path(
            cfg["pretrain"])

    env = make_env(cfg, sim_params)
    runner = make_runner(env, cfg, logger)
    runner.run(seed=cfg["seed"], resume=cfg["algo"].get("resume"))


if __name__ == "__main__":
    main()
