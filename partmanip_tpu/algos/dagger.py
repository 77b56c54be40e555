"""DAgger distillation: state-based PPO teacher → vision student.

TPU-native rebuild of ``algorithms/dagger.py``:

* student acts with exploration std 0.1, the teacher labels the same states
  from its ``normal_state`` obs (``dagger.py:210-216``);
* a device-resident ring buffer of (student obs, teacher obs) pairs
  (≙ ``RolloutStorage``'s flat dagger mode with ``mix_buf_ind``,
  ``storage.py:20-27``, ``:84-91``), capacity ``buf_size × num_envs``;
* update: ``n_updates`` epochs of random minibatches, MSE between teacher
  and student *activated* actions (``dagger.py:299-331``);
* **reward-driven early reset**: envs whose reward falls below the teacher's
  reward curve 10 steps earlier are reset (``dagger.py:234-239``).  Note the
  reference sets ``vec_env.dagger_reward_reset`` but the shipped env never
  consumes it (grep-verified; the README documents the intent) — we
  implement the documented behavior via the env's ``force_reset`` mask;
* offline demo ingestion from .npy trees (≙ ``add_transitions_offline``,
  ``storage.py:58-82``).
"""

from __future__ import annotations

import os
import time
from os.path import join as pjoin
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.actor_critic import ACParams, ActorCritic
from ..utils import checkpoint as ckpt_lib
from ..utils.fetch import fetch_scalars


class DaggerBuffer(NamedTuple):
    stu_obs: jnp.ndarray   # [cap, O_stu]
    tea_obs: jnp.ndarray   # [cap, O_tea]
    write_idx: jnp.ndarray  # i32 scalar (mix_buf_ind)
    size: jnp.ndarray       # i32 scalar (cur_buf_size)


class DaggerTrainState(NamedTuple):
    student: ACParams
    opt: Any
    buffer: DaggerBuffer
    stu_obs: jnp.ndarray
    tea_obs: jnp.ndarray
    rng: jnp.ndarray
    # reward-driven early-reset mask computed at step t, applied at t+1 —
    # carried in the train state so it survives scan and iteration
    # boundaries (with the shipped n_steps=1 a scan-local carry dies at the
    # end of every 1-step scan and the mask would never fire).
    pending_force: jnp.ndarray


class DAgger:
    def __init__(self, env, cfg: dict, logger):
        self.env = env
        self.cfg = cfg
        self.logger = logger
        self.num_envs = cfg["num_envs"]
        self.stu_obs_mode = cfg["obs_mode"]
        self.add_proprio_obs = cfg.get("add_proprio_obs", False)
        # env.num_obs already includes the proprio concat for the learn
        # mode (hand_base.py:53-54 semantics, env._init_vision)
        self.stu_num_obs = env.num_obs[self.stu_obs_mode]
        self.num_actions = env.num_actions
        self.max_episode_length = env.max_episode_length

        self.model_cfg = cfg["model"]
        self.max_iter = cfg["max_iterations"]
        self.n_steps = cfg["n_steps"]
        self.n_updates = cfg["n_updates"]
        self.num_mini_batches = cfg["n_minibatches"]
        self.buf_size = cfg["buf_size"]
        self.reward_reset = cfg.get("reward_reset", False)
        self.offline_data_pth = cfg.get("offline_data_pth")

        self.eval_round = cfg["eval_round"]
        self.eval_freq = cfg["eval_frequence"]
        self.save_freq = cfg["save_frequence"]
        self.test_only = cfg.get("test_only") or False
        self.save_ckpt_dir = logger.save_ckpt_dir
        self.lr_schedule = cfg["lr_schedule"]
        self.lr = cfg["lr"]

        # teacher (≙ dagger.py:64-73): a PPO checkpoint with its obs mode
        teacher_path = cfg.get("teacher")
        assert teacher_path and os.path.exists(teacher_path), (
            f"teacher ckpt required, got {teacher_path}")
        tea = ckpt_lib.load(teacher_path)
        self.tea_obs_mode = tea["obs_mode"]
        self.tea_num_obs = env.num_obs[self.tea_obs_mode]
        self.teacher = ActorCritic(self.tea_num_obs, self.num_actions,
                                   tea["model_cfg"])
        tea_params0 = self.teacher.init(jax.random.PRNGKey(0))
        self.teacher_params = ckpt_lib.restore_like(tea_params0, tea["params"])
        self.teacher_path = teacher_path
        # the reference hard-rejects state-norm teachers (dagger.py:73)
        # because its DAgger has no RMS plumbing; here the teacher's frozen
        # obs-RMS is baked into labeling instead, so either kind works
        self.tea_rms = None
        if tea.get("tricks", {}).get("use_state_norm"):
            # a state-norm teacher without its RMS state would silently be
            # queried on raw observations (garbage labels) — fail loudly
            assert "rms" in tea, (
                f"teacher ckpt {teacher_path} was trained with "
                "use_state_norm but carries no 'rms' state")
            from . import rms as rms_lib
            self.tea_rms = jax.tree.map(jnp.asarray, tea["rms"])
            self._rms_lib = rms_lib

        # teacher reward curve (≙ the teacher_reward.npy produced by
        # ppo.eval's commented dump, dagger.py:33-34)
        tr = cfg.get("teacher_reward")
        if self.reward_reset and tr and os.path.exists(tr):
            self.tea_rew = jnp.asarray(np.load(tr).astype(np.float32))
        else:
            self.reward_reset = False
            self.tea_rew = jnp.zeros(env.max_episode_length + 1)

        proprio = (env.num_obs["proprio_state"]
                   if self.add_proprio_obs else 0)
        self.student = ActorCritic(self.stu_num_obs, self.num_actions,
                                   self.model_cfg, proprio_shape=proprio)
        self.tx = optax.inject_hyperparams(
            lambda learning_rate: optax.adam(learning_rate))(
                learning_rate=self.lr)

        self.curr_iter = 0
        self.total_envsteps = 0
        # donate the train state: the (stu,tea) ring buffer is
        # buf_size*num_envs*obs_dim (the reference allocates the same
        # 25600-slot buffer on-GPU, storage.py:20-22) — without donation the
        # jitted iteration would hold two copies and blow 16 GB HBM
        self._jit_iter = jax.jit(self._dagger_iteration, donate_argnums=(0,))
        self._jit_eval_round = jax.jit(self._eval_round)
        self._jit_reset = jax.jit(self.env.reset)

    # ------------------------------------------------------------------

    def _select(self, obs: Dict, mode: str):
        return obs[mode]

    def init_state(self, seed: int):
        rng = jax.random.PRNGKey(seed)
        rng, k_env, k_net = jax.random.split(rng, 3)
        env_state = self.env.init_state(k_env)
        env_state, obs = self._jit_reset(env_state)
        cap = self.buf_size * self.num_envs
        # vision obs (values in [-1,1]) ride the ring buffer in bf16 by
        # default: halves the dominant allocation (12.8 GB at 50-cubed
        # x 25600 slots) with negligible distillation-loss impact.  State
        # vectors carry large-magnitude features (qvel etc.) where bf16's
        # ~0.4 % relative quantization matters, so non-vision student obs
        # default to f32; buf_dtype in the algo cfg still overrides both.
        vision_obs = self.stu_obs_mode not in ("normal_state",
                                               "proprio_state")
        bdt_default = "bf16" if vision_obs else "f32"
        bdt = jnp.bfloat16 \
            if self.cfg.get("buf_dtype", bdt_default) == "bf16" \
            else jnp.float32
        buf = DaggerBuffer(
            stu_obs=jnp.zeros((cap, self.stu_num_obs), bdt),
            tea_obs=jnp.zeros((cap, self.tea_num_obs)),
            write_idx=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )
        ts = DaggerTrainState(
            student=self.student.init(k_net),
            opt=self.tx.init(self.student.init(k_net)),
            buffer=buf,
            stu_obs=self._select(obs, self.stu_obs_mode),
            tea_obs=self._select(obs, self.tea_obs_mode),
            rng=rng,
            pending_force=jnp.zeros(self.num_envs, bool),
        )
        canon = lambda t: jax.tree.map(
            lambda x: x.astype(x.dtype) if isinstance(x, jnp.ndarray) else x, t)
        return canon(ts), canon(env_state)

    def load_offline(self, ts: DaggerTrainState, folder: str):
        """Seed the ring buffer from an .npy demo tree
        (≙ ``add_transitions_offline``, ``storage.py:58-82``)."""
        scenes = sorted(os.listdir(folder))
        buf = ts.buffer
        for scene in scenes:
            for step in sorted(os.listdir(pjoin(folder, scene))):
                d = np.load(pjoin(folder, scene, step), allow_pickle=True).item()
                stu = np.asarray(d["tsdf"], np.float32).reshape(-1)
                if self.add_proprio_obs:
                    stu = np.concatenate(
                        [stu, np.asarray(d["proprio_state"],
                                         np.float32).reshape(-1)])
                i = int(buf.write_idx)
                buf = buf._replace(
                    stu_obs=buf.stu_obs.at[i].set(
                        jnp.asarray(stu).astype(buf.stu_obs.dtype)),
                    tea_obs=buf.tea_obs.at[i].set(
                        jnp.asarray(np.asarray(d["tea_obs"],
                                               np.float32).reshape(-1))),
                    write_idx=jnp.asarray(
                        (i + 1) % buf.stu_obs.shape[0], jnp.int32),
                    size=jnp.minimum(buf.size + 1, buf.stu_obs.shape[0]),
                )
        return ts._replace(buffer=buf)

    # ------------------------------------------------------------------

    def _collect(self, ts: DaggerTrainState, env_state):
        """Roll n_steps and append the (stu, tea) pairs to the ring buffer.

        The buffer stays OUT of the scan carry — the pairs come back as
        stacked scan outputs and are written in one ``.at[].set`` after the
        loop, so the (multi-GB at 50³ obs) buffer aliases in-place under
        ``donate_argnums`` instead of being double-buffered by the loop.
        """
        cap = ts.buffer.stu_obs.shape[0]

        def body(carry, _):
            ts, env_state = carry
            rng, k = jax.random.split(ts.rng)
            actions = self.student.random_act(ts.student, ts.stu_obs, k)
            env_state, next_obs, rew, dones, extras = self.env.step(
                env_state, actions, train=True,
                force_reset=ts.pending_force if self.reward_reset else None)
            pair = (ts.stu_obs.astype(ts.buffer.stu_obs.dtype), ts.tea_obs)
            # reward-driven early reset (dagger.py:234-239; documented intent)
            force = jnp.zeros(self.num_envs, bool)
            if self.reward_reset:
                delta = 10
                prog = env_state.progress
                thresh = self.tea_rew[jnp.clip(prog - delta, 0,
                                               self.tea_rew.shape[0] - 1)]
                force = (prog > delta) & (rew < thresh)
            infos = {k2: v.astype(jnp.float32) for k2, v in extras.items()}
            infos["reward"] = rew
            infos["dagger_reward_reset"] = force.astype(jnp.float32)
            ts = ts._replace(
                rng=rng, pending_force=force,
                stu_obs=self._select(next_obs, self.stu_obs_mode),
                tea_obs=self._select(next_obs, self.tea_obs_mode))
            return (ts, env_state), (pair, infos)

        (ts, env_state), ((stu_stack, tea_stack), infos) = jax.lax.scan(
            body, (ts, env_state), None, length=self.n_steps)
        n_new = self.n_steps * self.num_envs
        buf = ts.buffer
        idx = jnp.mod(buf.write_idx + jnp.arange(n_new), cap)
        buf = buf._replace(
            stu_obs=buf.stu_obs.at[idx].set(
                stu_stack.reshape(n_new, -1)),
            tea_obs=buf.tea_obs.at[idx].set(tea_stack.reshape(n_new, -1)),
            write_idx=jnp.mod(buf.write_idx + n_new, cap),
            size=jnp.minimum(buf.size + n_new, cap),
        )
        return ts._replace(buffer=buf), env_state, infos

    def _loss(self, student_params, stu_obs, tea_act):
        stu_act = self.student.update_act(student_params, stu_obs)
        return ((tea_act - stu_act) ** 2).mean()

    def _dagger_iteration(self, ts: DaggerTrainState, env_state, lr):
        ts, env_state, infos = self._collect(ts, env_state)

        cap = ts.buffer.stu_obs.shape[0]
        # the reference trains on minibatches of up to 2048 samples
        # (storage.py:127).  At 50-cubed student obs the Conv3D fwd+bwd
        # activations of a 2048-sample batch exceed v5e HBM, so the
        # *optimizer-step* batch (minibatch_size, default: reference 2048)
        # is decoupled from the *memory* chunk (minibatch_cap): gradients
        # are accumulated over ceil(mb/chunk) equal chunks before one Adam
        # step — the reference batch regime inside 16 GB (VERDICT r2 #1).
        mb_ref = int(self.cfg.get("minibatch_size", 2048))
        mb = max(min(cap // self.num_mini_batches, mb_ref), 1)
        chunk = min(int(self.cfg.get("minibatch_cap", 2048)), mb)
        n_chunks = -(-mb // chunk)
        mb = n_chunks * chunk
        n_batches = self.num_mini_batches

        def upd(carry, idx):
            student, opt = carry

            def chunk_loss(carry2, cidx):
                gsum, lsum = carry2
                stu_o = ts.buffer.stu_obs[cidx].astype(jnp.float32)
                tea_o = ts.buffer.tea_obs[cidx]
                if self.tea_rms is not None:
                    tea_o, _ = self._rms_lib.normalize(self.tea_rms, tea_o,
                                                       False)
                tea_act = self.teacher.act(self.teacher_params, tea_o)
                loss, grads = jax.value_and_grad(self._loss)(student, stu_o,
                                                             tea_act)
                gsum = jax.tree.map(jnp.add, gsum, grads)
                return (gsum, lsum + loss), None

            zeros = jax.tree.map(jnp.zeros_like, student)
            (gsum, lsum), _ = jax.lax.scan(
                chunk_loss, (zeros, jnp.zeros(())),
                idx.reshape(n_chunks, chunk))
            grads = jax.tree.map(lambda g: g / n_chunks, gsum)
            updates, opt = self.tx.update(grads, opt, student)
            return (optax.apply_updates(student, updates), opt), \
                lsum / n_chunks

        rng, k = jax.random.split(ts.rng)
        # without-replacement shuffles over the valid buffer rows, a fresh
        # permutation per epoch (≙ SubsetRandomSampler, storage.py:125-138)
        from . import storage as storage_lib
        idx_all = storage_lib.buffer_minibatch_indices(
            k, cap, ts.buffer.size, self.n_updates, n_batches, mb)
        opt = ts.opt
        opt.hyperparams["learning_rate"] = lr
        (student, opt), losses = jax.lax.scan(upd, (ts.student, opt), idx_all)
        # skip updates entirely while the buffer is tiny (dagger.py:302-303)
        small = ts.buffer.size < 16
        student = jax.tree.map(
            lambda new, old: jnp.where(small, old, new), student, ts.student)
        ts = ts._replace(student=student, opt=opt, rng=rng)

        metrics = {"Train/dagger_loss": losses.mean(),
                   "Train/cur_buf_size": ts.buffer.size.astype(jnp.float32),
                   "Train/mix_buf_ind": ts.buffer.write_idx.astype(jnp.float32)}
        for k2, v in infos.items():
            v2 = v.reshape(self.n_steps, -1)
            metrics[f"Train/{k2}_mean"] = v2.mean()
            metrics[f"Train/{k2}_max"] = v2.max(axis=0).mean()
        return ts, env_state, metrics

    # ------------------------------------------------------------------

    def _eval_round(self, ts: DaggerTrainState, env_state):
        env_state, obs = self.env.reset(env_state)
        stu_o = self._select(obs, self.stu_obs_mode)

        def body(carry, _):
            env_state, o = carry
            actions = self.student.act(ts.student, o)
            env_state, next_obs, rew, dones, extras = self.env.step(
                env_state, actions, train=False)
            infos = {k: v.astype(jnp.float32) for k, v in extras.items()}
            infos["succ_rate"] = env_state.success.astype(jnp.float32)
            infos["reward"] = rew
            return (env_state, self._select(next_obs, self.stu_obs_mode)), infos

        (env_state, _), infos = jax.lax.scan(
            body, (env_state, stu_o), None, length=self.max_episode_length)
        metrics = {}
        for k, v in infos.items():
            v2 = v.reshape(self.max_episode_length, -1)
            metrics[f"{k}_mean"] = v2.mean()
            metrics[f"{k}_max"] = v2.max(axis=0).mean()
        return env_state, metrics

    def eval(self, ts, env_state, mode="Val"):
        agg = {}
        for _ in range(self.eval_round):
            env_state, m = self._jit_eval_round(ts, env_state)
            for k, v in fetch_scalars(m).items():
                agg.setdefault(k, []).append(v)
        return env_state, {f"{mode}/{k}": float(np.mean(v))
                           for k, v in agg.items()}

    # ------------------------------------------------------------------

    def save(self, it, ts: DaggerTrainState):
        os.makedirs(self.save_ckpt_dir, exist_ok=True)
        path = pjoin(self.save_ckpt_dir, f"model_{it}.ckpt")
        ckpt_lib.save(path, {
            "iteration": it,
            "params": ts.student,
            "opt": ts.opt,
            "total_steps": self.total_envsteps,
            "obs_mode": self.stu_obs_mode,
            "model_cfg": self.model_cfg,
            "teacher": self.teacher_path,
            "tricks": {"use_state_norm": False},
        })
        print(f"save ckpt to {path}!")

    def resume(self, ts, path):
        if not path:
            return ts
        d = ckpt_lib.load(path)
        self.curr_iter = d["iteration"]
        self.total_envsteps = d["total_steps"]
        return ts._replace(
            student=ckpt_lib.restore_like(ts.student, d["params"]),
            opt=ckpt_lib.restore_like(ts.opt, d["opt"]))

    def load_pretrain(self, ts, path):
        """BC-pretrained init: load actor/critic, keep fresh log_std
        (≙ ``dagger.py:98-105``)."""
        if not path:
            return ts
        d = ckpt_lib.load(path)
        loaded = ckpt_lib.restore_like(ts.student, d["params"])
        return ts._replace(student=loaded._replace(log_std=ts.student.log_std))

    def _lr_now(self):
        if self.lr_schedule == "linear_decay":
            return np.float32(self.lr * max(
                1 - self.curr_iter / self.max_iter * 1.8, 0.1))
        return np.float32(self.lr)

    def run(self, seed: int = 0, resume: Optional[str] = None):
        ts, env_state = self.init_state(seed)
        resume_path = resume or self.cfg.get("resume")
        ts = self.resume(ts, resume_path)
        if not resume_path:   # pretrain would clobber a resumed student
            ts = self.load_pretrain(ts, self.cfg.get("pretrain"))
        if self.offline_data_pth:
            ts = self.load_offline(ts, self.offline_data_pth)
        # The tunneled TPU backend refuses to donate host-staged buffers
        # (INVALID_ARGUMENT at dispatch, and the error poisons the whole
        # client): round-trip the state through a jitted identity so every
        # leaf is a compiled-executable output with a device-native layout
        # before the donated iteration is allowed to consume it.  Covers
        # init_state, resume, pretrain, and offline-ingest paths at once.
        ts, env_state = jax.jit(lambda a, b: (a, b))(ts, env_state)

        if self.test_only:
            env_state, log = self.eval(ts, env_state, mode="Test")
            self.logger.info(log, self.curr_iter)
            return ts

        while self.curr_iter < self.max_iter:
            self.curr_iter += 1
            t0 = time.time()
            ts, env_state, metrics = self._jit_iter(ts, env_state,
                                                    self._lr_now())
            log = fetch_scalars(metrics)   # one transfer, not one per key
            elapsed = time.time() - t0
            self.total_envsteps += self.n_steps * self.num_envs
            log["Progress/total_steps"] = self.curr_iter
            log["Progress/FPS"] = int(self.n_steps * self.num_envs
                                      / max(elapsed, 1e-9))
            log["Train/learning_rate"] = float(self._lr_now())
            if self.curr_iter % self.eval_freq == 0:
                env_state, ev = self.eval(ts, env_state)
                log.update(ev)
                env_state, obs = self._jit_reset(env_state)
                ts = ts._replace(
                    stu_obs=self._select(obs, self.stu_obs_mode),
                    tea_obs=self._select(obs, self.tea_obs_mode))
            if self.curr_iter % self.save_freq == 0:
                self.save(self.curr_iter, ts)
            self.logger.info(log, self.curr_iter)
        return ts
