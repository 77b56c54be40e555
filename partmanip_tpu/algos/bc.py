"""Behavior cloning from offline TSDF demo trees (≙ ``algorithms/bc.py``).

Dataset layout (≙ ``Tsdf_Dataset``, ``bc.py:12-31``): a directory of
``scene_*/step_*.npy`` dicts with keys ``tsdf``, ``action``,
``proprio_state``; the whole set is loaded to device once (it is small —
16 envs × 200 steps) and iterated as shuffled minibatches.  Loss is L2 on
*activated* actions (``bc.py:135-138``); lr schedules fixed / linear /
step-decay (``bc.py:151-163``).
"""

from __future__ import annotations

import os
import time
from os.path import join as pjoin
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.actor_critic import ActorCritic
from ..utils import checkpoint as ckpt_lib


def load_demo_tree(data_path: str, add_proprio: bool):
    """Load all (obs, action) pairs from a scene/step .npy tree."""
    scenes = sorted(os.listdir(data_path))
    obs_list, act_list = [], []
    for scene in scenes:
        for step in sorted(os.listdir(pjoin(data_path, scene))):
            d = np.load(pjoin(data_path, scene, step),
                        allow_pickle=True).item()
            o = np.asarray(d["tsdf"], np.float32).reshape(-1)
            if add_proprio:
                o = np.concatenate(
                    [o, np.asarray(d["proprio_state"], np.float32).reshape(-1)])
            obs_list.append(o)
            act_list.append(np.asarray(d["action"], np.float32).reshape(-1))
    return np.stack(obs_list), np.stack(act_list)


class BC:
    def __init__(self, env, cfg: dict, logger):
        self.env = env
        self.cfg = cfg
        self.logger = logger
        self.obs_mode = cfg["obs_mode"]
        self.add_proprio_obs = cfg.get("add_proprio_obs", False)
        # env.num_obs already includes the proprio concat (env._init_vision)
        self.num_obs = env.num_obs[self.obs_mode]
        proprio = env.num_obs["proprio_state"] if self.add_proprio_obs else 0
        self.num_actions = env.num_actions
        self.model_cfg = cfg["model"]
        self.max_iter = cfg["max_iterations"]
        self.n_minibatches = cfg["n_minibatches"]
        self.data_path = cfg["data_path"]
        self.save_freq = cfg["save_frequence"]
        self.save_ckpt_dir = logger.save_ckpt_dir
        self.lr_schedule = cfg["lr_schedule"]
        self.lr = cfg["lr"]

        self.student = ActorCritic(self.num_obs, self.num_actions,
                                   self.model_cfg, proprio_shape=proprio)
        self.tx = optax.inject_hyperparams(
            lambda learning_rate: optax.adam(learning_rate))(
                learning_rate=self.lr)
        self.curr_iter = 0

        def update(params, opt, obs, act, lr):
            def loss_fn(p):
                stu = self.student.update_act(p, obs)
                return ((act - stu) ** 2).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            opt.hyperparams["learning_rate"] = lr
            updates, opt = self.tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        self._jit_update = jax.jit(update)

    def _lr_now(self):
        if self.lr_schedule == "linear_decay":
            return np.float32(self.lr * (1 - self.curr_iter / self.max_iter))
        if self.lr_schedule == "step_decay":
            return np.float32(
                self.lr if self.curr_iter < self.max_iter / 2 else self.lr * 0.1)
        return np.float32(self.lr)

    def save(self, it, params, opt):
        os.makedirs(self.save_ckpt_dir, exist_ok=True)
        path = pjoin(self.save_ckpt_dir, f"model_{it}.ckpt")
        ckpt_lib.save(path, {
            "iteration": it, "params": params, "opt": opt,
            "obs_mode": self.obs_mode, "total_steps": 0,
            "tricks": {"use_state_norm": False}, "teacher": None,
            "model_cfg": self.model_cfg,
        })
        print(f"save ckpt to {path}!")

    def resume(self, params, opt, path):
        if not path:
            return params, opt
        d = ckpt_lib.load(path)
        assert d["obs_mode"] == self.obs_mode
        self.curr_iter = d["iteration"]
        return (ckpt_lib.restore_like(params, d["params"]),
                ckpt_lib.restore_like(opt, d["opt"]))

    def run(self, seed: int = 0, resume: Optional[str] = None):
        rng = np.random.RandomState(seed)
        obs, act = load_demo_tree(self.data_path, self.add_proprio_obs)
        obs_d = jnp.asarray(obs)
        act_d = jnp.asarray(act)
        n = obs.shape[0]
        bsz = max(n // self.n_minibatches, 1)

        params = self.student.init(jax.random.PRNGKey(seed))
        opt = self.tx.init(params)
        params, opt = self.resume(params, opt, resume or self.cfg.get("resume"))

        while self.curr_iter < self.max_iter:
            self.curr_iter += 1
            t0 = time.time()
            perm = rng.permutation(n)
            losses = []
            for b in range(self.n_minibatches):
                idx = jnp.asarray(perm[b * bsz:(b + 1) * bsz])
                if idx.shape[0] == 0:
                    continue
                params, opt, loss = self._jit_update(
                    params, opt, obs_d[idx], act_d[idx], self._lr_now())
                losses.append(loss)
            log = {
                "Train/bc_loss": float(jnp.stack(losses).mean()),
                "Train/learning_rate": float(self._lr_now()),
                "Progress/total_steps": self.curr_iter,
                "Progress/iteration_time": time.time() - t0,
            }
            if self.curr_iter % self.save_freq == 0:
                self.save(self.curr_iter, params, opt)
            self.logger.info(log, self.curr_iter)
        return params
