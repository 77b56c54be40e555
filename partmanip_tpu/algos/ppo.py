"""PPO with KL-gated decoupled actor/critic phases.

TPU-native rebuild of ``algorithms/ppo.py``: one **fused jitted iteration** —
rollout(n_steps) → GAE → actor phase → critic phase — so sim, env and learner
share device memory with zero host round-trips (host touches only the scalar
metrics once per iteration).

Faithful semantics:

* separate Adam optimizers for actor(+log_std) and critic (``ppo.py:73-74``),
  lr schedules applied to the actor only (``ppo.py:390-400``);
* KL gate: a minibatch update is skipped entirely when the (reference-form)
  KL estimate exceeds ``desired_kl`` (``ppo.py:332-338``);
* tricks dict: mini/whole adv-norm, clipped value loss, grad clip
  (``ppo.py:60-68``, ``:328-329``, ``:350-351``, ``:368-374``);
* obs RMS normalization updated during rollouts and frozen once eval
  max-success exceeds 50 % (``ppo.py:200-201``);
* GAE with adv=0 across dones and succ_value-pinned returns (storage.py).
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
from . import rms as rms_lib
from . import storage
from ..utils import checkpoint as ckpt_lib
from ..utils.fetch import fetch_scalars


class PPOTrainState(NamedTuple):
    params: ACParams
    opt_actor: Any
    opt_critic: Any
    rms: rms_lib.RMSState
    update_rms: jnp.ndarray       # bool scalar (freeze flag)
    curr_obs: jnp.ndarray         # [E, O] normalized obs carried across iters
    rng: jnp.ndarray


class PPO:
    TRICKS_KEYS = ["mini_adv_norm", "whole_adv_norm", "use_state_norm",
                   "use_clipped_value_loss", "use_grad_clip"]

    def __init__(self, env, cfg: dict, logger):
        self.env = env
        self.cfg = cfg
        self.logger = logger
        self.num_envs = cfg["num_envs"]
        self.obs_mode = cfg["obs_mode"]
        self.num_obs = env.num_obs[self.obs_mode]
        if cfg.get("add_proprio_obs"):
            self.num_obs += env.num_obs["proprio_state"]
        self.num_actions = env.num_actions
        self.max_episode_length = env.max_episode_length
        self.succ_value = cfg["succ_value"]

        self.model_cfg = cfg["model"]
        self.max_iter = cfg["max_iterations"]
        self.n_steps = cfg["n_steps"]
        self.n_updates = cfg["n_updates"]
        self.num_mini_batches = cfg["n_minibatches"]

        self.eval_round = cfg["eval_round"]
        self.eval_freq = cfg["eval_frequence"]
        self.save_freq = cfg["save_frequence"]
        self.test_only = cfg.get("test_only") or False
        self.save_pose = cfg.get("save_pose") or False
        self.save_video = cfg.get("save_video") or False
        self.save_ckpt_dir = logger.save_ckpt_dir

        self.lr_schedule = cfg["lr_schedule"]
        assert self.lr_schedule in ("fixed", "linear_decay", "step_decay")
        self.lr = cfg["lr"]
        self.desired_kl = cfg["desired_kl"]
        assert self.desired_kl > 0
        self.epsilon_clip = cfg["epsilon_clip"]
        self.gamma = cfg["gamma"]
        self.lam = cfg["lam"]
        self.sampler = cfg["sampler"]

        self.tricks = {k: cfg["tricks"][k] for k in self.TRICKS_KEYS}
        self.max_grad_norm = cfg["tricks"].get("max_grad_norm", 0.5)

        self.ac = ActorCritic(self.num_obs, self.num_actions, self.model_cfg)
        ac_tx = [optax.clip_by_global_norm(self.max_grad_norm)] \
            if self.tricks["use_grad_clip"] else []
        self.tx_actor = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                *ac_tx, optax.adam(learning_rate)))(learning_rate=self.lr)
        self.tx_critic = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                *ac_tx, optax.adam(learning_rate)))(learning_rate=self.lr)

        self.curr_iter = 0
        self.total_envsteps = 0
        self.total_time = 0.0

        # env-axis data parallelism over a device mesh (SURVEY §2
        # parallelism inventory): sim state / rollouts sharded over 'env',
        # params and optimizer states replicated, gradient psum inserted by
        # GSPMD during the minibatch loss reductions.
        par = cfg.get("parallel") or {}
        self.num_devices = int(par.get("num_devices") or 1)
        self.mesh = None
        if self.num_devices > 1:
            from ..parallel import mesh as mesh_lib
            assert self.num_envs % self.num_devices == 0, (
                f"num_envs {self.num_envs} % num_devices "
                f"{self.num_devices} != 0")
            self.mesh = mesh_lib.make_mesh(
                self.num_devices,
                axis_name=par.get("mesh_axis") or mesh_lib.ENV_AXIS)

        # _with_mesh makes this trainer's mesh (or None) the active one
        # while the wrapped jit traces, so engine.physics_step shard_maps
        # the fused kernel over exactly this mesh (parallel/mesh.py).
        self._jit_train_iter = self._with_mesh(jax.jit(self._train_iteration))
        self._jit_eval_round = self._with_mesh(jax.jit(self._eval_round))
        self._jit_reset = self._with_mesh(jax.jit(self.env.reset))

    def _with_mesh(self, fn):
        def wrapped(*a, **k):
            from ..parallel import mesh as mesh_lib
            mesh_lib.activate(self.mesh)
            try:
                return fn(*a, **k)
            finally:
                mesh_lib.activate(None)
        return wrapped

    # ------------------------------------------------------------------
    # state init / io
    # ------------------------------------------------------------------

    def _actor_subset(self, params: ACParams):
        return {"actor": params.actor, "log_std": params.log_std}

    def init_state(self, seed: int):
        rng = jax.random.PRNGKey(seed)
        rng, k_env, k_net = jax.random.split(rng, 3)
        env_state = self.env.init_state(k_env)
        env_state, obs = self._jit_reset(env_state)
        params = self.ac.init(k_net)
        rms_state = rms_lib.init_rms(self.num_obs)
        curr_obs = self._select_obs(obs)
        update = jnp.asarray(self.tricks["use_state_norm"])
        if self.tricks["use_state_norm"]:
            curr_obs, rms_state = rms_lib.normalize(rms_state, curr_obs, update)
        ts = PPOTrainState(
            params=params,
            opt_actor=self.tx_actor.init(self._actor_subset(params)),
            opt_critic=self.tx_critic.init(params.critic),
            rms=rms_state,
            update_rms=update,
            curr_obs=curr_obs,
            rng=rng,
        )
        # canonicalize leaf dtypes (drop weak typing) so the first fed-back
        # iteration doesn't retrace with a different abstract signature
        canon = lambda t: jax.tree.map(
            lambda x: x.astype(x.dtype) if isinstance(x, jnp.ndarray) else x, t)
        ts, env_state = canon(ts), canon(env_state)
        if self.mesh is not None:
            # env-axis sharding on [E, ...] leaves; everything else
            # replicated.  jit inherits these placements, so the fused
            # iteration runs sharded without explicit in_shardings.
            from ..parallel import mesh as mesh_lib
            ts, env_state = mesh_lib.place(self.mesh, ts, env_state)
        return ts, env_state

    def _select_obs(self, obs: Dict[str, jnp.ndarray]):
        o = obs[self.obs_mode]
        if self.cfg.get("add_proprio_obs") and self.obs_mode != "proprio_state":
            o = jnp.concatenate([o, obs["proprio_state"]], axis=-1)
        return o

    def save(self, it, ts: PPOTrainState):
        os.makedirs(self.save_ckpt_dir, exist_ok=True)
        path = pjoin(self.save_ckpt_dir, f"model_{it}.ckpt")
        ckpt_lib.save(path, {
            "iteration": it,
            "params": ts.params,
            "opt_actor": ts.opt_actor,
            "opt_critic": ts.opt_critic,
            "rms": ts.rms,
            "update_rms": ts.update_rms,
            "total_steps": self.total_envsteps,
            "tricks": self.tricks,
            "obs_mode": self.obs_mode,
            "model_cfg": self.model_cfg,
        })
        print(f"save ckpt to {path}!")

    def resume(self, ts: PPOTrainState, path: Optional[str]):
        if not path:
            return ts
        print(f"load ckpt from {path}!")
        d = ckpt_lib.load(path)
        for k in self.TRICKS_KEYS:
            if self.tricks[k] != d["tricks"][k]:
                print(f"WARNING: trick {k} inconsistent with ckpt! "
                      f"saved: {d['tricks'][k]}, now: {self.tricks[k]}")
                if k == "use_state_norm":
                    raise SystemExit("state-norm mismatch is not allowed")
        assert self.obs_mode == d["obs_mode"]
        self.curr_iter = d["iteration"]
        self.total_envsteps = d["total_steps"]
        return ts._replace(
            params=ckpt_lib.restore_like(ts.params, d["params"]),
            opt_actor=ckpt_lib.restore_like(ts.opt_actor, d["opt_actor"]),
            opt_critic=ckpt_lib.restore_like(ts.opt_critic, d["opt_critic"]),
            rms=ckpt_lib.restore_like(ts.rms, d["rms"]),
            update_rms=jnp.asarray(d["update_rms"]),
        )

    # ------------------------------------------------------------------
    # fused train iteration
    # ------------------------------------------------------------------

    def _rollout(self, ts: PPOTrainState, env_state):
        """n_steps of policy+env, collecting the Rollout (time-major)."""

        def body(carry, _):
            env_state, obs, rng, rms_state = carry
            rng, k = jax.random.split(rng)
            actions, logp, values, mu, sigma = self.ac.random_act_cri(
                ts.params, obs, k)
            env_state, next_obs, rew, dones, extras = self.env.step(
                env_state, actions, train=True)
            o = self._select_obs(next_obs)
            if self.tricks["use_state_norm"]:
                o, rms_state = rms_lib.normalize(rms_state, o, ts.update_rms)
            step_data = storage.Rollout(
                observations=obs, actions=actions, rewards=rew,
                dones=dones, succs=env_state.reset_succ,
                values=values[..., 0], log_probs=logp, mu=mu, sigma=sigma)
            infos = {k2: v.astype(jnp.float32) for k2, v in extras.items()}
            infos["value_pred"] = values[..., 0]
            return (env_state, o, rng, rms_state), (step_data, infos)

        (env_state, obs, rng, rms_state), (ro, infos) = jax.lax.scan(
            body, (env_state, ts.curr_obs, ts.rng, ts.rms), None,
            length=self.n_steps)
        ts = ts._replace(curr_obs=obs, rng=rng, rms=rms_state)
        return ts, env_state, ro, infos

    def _actor_loss(self, actor_subset, obs, actions, old_logp, advantages):
        params = ACParams(actor=actor_subset["actor"], critic=None,
                          log_std=actor_subset["log_std"])
        mean = self.ac.actor.apply(params.actor, obs)
        std = self.ac.std(params)
        raw = self.ac.deactivate(actions)
        logp = self.ac._log_prob(mean, std, raw)
        ratio = jnp.exp(logp - old_logp)
        surr = -advantages * ratio
        surr_clipped = -advantages * jnp.clip(
            ratio, 1.0 - self.epsilon_clip, 1.0 + self.epsilon_clip)
        return jnp.maximum(surr, surr_clipped).mean()

    def _critic_loss(self, critic_params, obs, returns, old_values):
        value = self.ac.critic.apply(critic_params, obs)[..., 0]
        if self.tricks["use_clipped_value_loss"]:
            delta = jnp.abs(self.epsilon_clip * old_values).mean()
            ret_c = old_values + jnp.clip(returns - old_values, -delta, delta)
            ret_c = jax.lax.stop_gradient(ret_c)
            return ((value - ret_c) ** 2).mean()
        return ((returns - value) ** 2).mean()

    def _kl(self, params: ACParams, obs, old_mu, old_sigma):
        """Reference-form KL estimate (``ppo.py:332-333``): stored sigma rows
        are log-std; the estimate uses exp(sigma) as std."""
        mu = self.ac.actor.apply(params.actor, obs)
        sigma = jnp.broadcast_to(params.log_std, mu.shape)
        kl = jnp.sum(
            sigma - old_sigma
            + (jnp.exp(old_sigma) ** 2 + (old_mu - mu) ** 2)
            / (2.0 * jnp.exp(sigma) ** 2) - 0.5, axis=-1)
        return kl.mean()

    def _train_iteration(self, ts: PPOTrainState, env_state, lr):
        ts, env_state, ro, infos = self._rollout(ts, env_state)
        last_values = self.ac.cri(ts.params, ts.curr_obs)[..., 0]
        returns, advantages = storage.compute_returns(
            ro, last_values, self.gamma, self.lam,
            None if self.succ_value is None else float(self.succ_value),
            self.tricks["whole_adv_norm"])

        total = self.n_steps * self.num_envs
        flat = lambda x: x.reshape((total,) + x.shape[2:])
        obs_f = flat(ro.observations)
        act_f = flat(ro.actions)
        logp_f = flat(ro.log_probs)
        mu_f = flat(ro.mu)
        sigma_f = flat(ro.sigma)
        adv_f = flat(advantages)
        ret_f = flat(returns)
        val_f = flat(ro.values)

        ts = ts._replace(rng=ts.rng)
        rng, k_mb = jax.random.split(ts.rng)
        ts = ts._replace(rng=rng)
        # fresh permutation per epoch when sampler=='random' (≙ the
        # reference's BatchSampler over SubsetRandomSampler yielding a new
        # shuffle each epoch); 'sequential' partitions once and reuses it.
        epoch_idx = storage.minibatch_indices(
            k_mb, total, self.num_mini_batches, self.sampler,
            n_epochs=self.n_updates)

        # ---- actor phase ----
        def actor_step(carry, idx):
            actor_subset, opt_state = carry
            o, a, lp, ad, om, osg = (obs_f[idx], act_f[idx], logp_f[idx],
                                     adv_f[idx], mu_f[idx], sigma_f[idx])
            if self.tricks["mini_adv_norm"]:
                ad = (ad - ad.mean()) / (ad.std() + 1e-8)
            params_now = ACParams(actor=actor_subset["actor"], critic=None,
                                  log_std=actor_subset["log_std"])
            kl = self._kl(params_now, o, om, osg)
            loss, grads = jax.value_and_grad(self._actor_loss)(
                actor_subset, o, a, lp, ad)

            def apply(_):
                updates, new_opt = self.tx_actor.update(
                    grads, opt_state, actor_subset)
                return optax.apply_updates(actor_subset, updates), new_opt

            gate = kl <= self.desired_kl
            new_subset, new_opt = jax.lax.cond(
                gate, apply, lambda _: (actor_subset, opt_state), None)
            stats = {"kl": kl, "surrogate_loss": jnp.where(gate, loss, 0.0),
                     "applied": gate.astype(jnp.float32)}
            return (new_subset, new_opt), stats

        actor_subset = self._actor_subset(ts.params)
        # lr schedule applies to the actor optimizer only (ppo.py:390-400)
        opt_actor = ts.opt_actor
        opt_actor.hyperparams["learning_rate"] = lr
        (actor_subset, opt_actor), a_stats = jax.lax.scan(
            actor_step, (actor_subset, opt_actor), epoch_idx)

        params = ts.params._replace(actor=actor_subset["actor"],
                                    log_std=actor_subset["log_std"])

        # ---- critic phase ----
        def critic_step(carry, idx):
            critic_params, opt_state = carry
            loss, grads = jax.value_and_grad(self._critic_loss)(
                critic_params, obs_f[idx], ret_f[idx], val_f[idx])
            updates, new_opt = self.tx_critic.update(
                grads, opt_state, critic_params)
            return (optax.apply_updates(critic_params, updates), new_opt), loss

        (critic_params, opt_critic), v_losses = jax.lax.scan(
            critic_step, (params.critic, ts.opt_critic), epoch_idx)
        params = params._replace(critic=critic_params)

        ts = ts._replace(params=params, opt_actor=opt_actor,
                         opt_critic=opt_critic)

        applied = jnp.maximum(a_stats["applied"].sum(), 1.0)
        metrics = {
            "Train/value_gt_return_mean": returns.mean(),
            "Train/value_gt_return_max": returns.max(),
            "Train/value_function_loss": v_losses.mean(),
            "Train/surrogate_loss": a_stats["surrogate_loss"].sum() / applied,
            # KL averaged over *applied* minibatches only (≙ the reference
            # accumulating kl_mean solely for non-skipped updates)
            "Train/kl": (a_stats["kl"] * a_stats["applied"]).sum() / applied,
            "Train/kl_max": a_stats["kl"].max(),
            "Train/kl_update_count": a_stats["applied"].sum(),
            # noise-std curves log exp(log_std) like the reference (the
            # effective sampling std is exp(2·log_std); see ac.std)
            "Train/mean_action_noise_std": jnp.exp(params.log_std).mean(),
            "Train/mean_t_noise_std": jnp.exp(params.log_std)[:3].mean(),
            "Train/mean_r_noise_std": jnp.exp(params.log_std)[3:-1].mean(),
            "Train/mean_gripper_noise_std": jnp.exp(params.log_std)[-1],
        }
        # per-key mean and mean-of-per-env-max (≙ use_info_update_logdict,
        # ppo.py:295-305): infos are [T, E]-stacked
        for k, v in infos.items():
            v2 = v.reshape(self.n_steps, -1)
            metrics[f"Train/{k}_mean"] = v2.mean()
            metrics[f"Train/{k}_max"] = v2.max(axis=0).mean()
        return ts, env_state, metrics

    # ------------------------------------------------------------------
    # eval
    # ------------------------------------------------------------------

    def _eval_round(self, ts: PPOTrainState, env_state):
        env_state, obs = self.env.reset(env_state)
        o = self._select_obs(obs)
        if self.tricks["use_state_norm"]:
            o, _ = rms_lib.normalize(ts.rms, o, False)

        def body(carry, _):
            env_state, o = carry
            actions, values = self.ac.act_cri(ts.params, o)
            env_state, next_obs, rew, dones, extras = self.env.step(
                env_state, actions, train=False)
            o2 = self._select_obs(next_obs)
            if self.tricks["use_state_norm"]:
                o2, _ = rms_lib.normalize(ts.rms, o2, False)
            infos = {k: v.astype(jnp.float32) for k, v in extras.items()}
            infos["succ_rate"] = env_state.success.astype(jnp.float32)
            infos["reward"] = rew
            return (env_state, o2), infos

        (env_state, _), infos = jax.lax.scan(
            body, (env_state, o), None, length=self.max_episode_length)
        metrics = {}
        for k, v in infos.items():
            v2 = v.reshape(self.max_episode_length, -1)
            metrics[f"{k}_mean"] = v2.mean()
            metrics[f"{k}_max"] = v2.max(axis=0).mean()
        # per-step mean reward over envs — the teacher reward curve consumed
        # by DAgger's reward-driven early reset (≙ the commented
        # teacher_reward.npy dump at reference ppo.py:183)
        rew_curve = infos["reward"].reshape(self.max_episode_length, -1).mean(-1)
        return env_state, metrics, rew_curve

    def _eval_capture(self, ts: PPOTrainState, env_state):
        """Eval with pose dumps / video frames (≙ ppo.py:160-193).

        Pose-only capture runs as a device-side scan (poses/state/action
        stacked on device, ONE fetch for the episode — at 40 ms dispatch RTT
        a host-driven loop costs ~10 s per 200-step eval before renders);
        the video path stays host-driven since each frame is written to
        disk anyway."""
        import numpy as np
        from ..utils import video as video_lib
        if self.save_pose and not self.save_video:
            return self._eval_capture_poses(ts, env_state)
        env_state, obs = self._jit_reset(env_state)
        o = self._select_obs(obs)
        if self.tricks["use_state_norm"]:
            o, _ = rms_lib.normalize(ts.rms, o, False)
        step = jax.jit(lambda s, a: self.env.step(s, a, train=False))
        pose_dir = pjoin(self.logger.save_pose_dir, f"Iter{self.curr_iter}")
        video_dir = pjoin(self.logger.save_video_dir, f"Iter{self.curr_iter}")
        save_dicts = []
        vid_cam = None
        if self.save_video:
            # dedicated 1024×512 video camera at the rig's view-0 pose on
            # env 3 (≙ hand_base.py:232-244)
            from ..utils import camera as camera_lib
            cam_cfg = self.env.cfg["cam"]
            vid_h, vid_w = self.cfg.get("video_res") or (512, 1024)
            poses = camera_lib.gen_camera_poses(
                cam_cfg["look_at"], cam_cfg["radius"], num_views=3)[:1]
            vid_cam = (poses, camera_lib.camera_intrinsics(vid_w, vid_h),
                       vid_h, vid_w)
        for i in range(self.max_episode_length):
            actions = self.ac.act(ts.params, o)
            if self.save_pose:
                d = jax.tree.map(np.asarray, self.env.scene_pose(env_state))
                d["state"] = np.asarray(o)
                d["action"] = np.asarray(actions)
                save_dicts.append(d)
            if self.save_video and vid_cam is not None:
                from ..envs import vision as vision_lib
                env_id = min(3, self.num_envs - 1)  # ≙ hand_base.py:233
                # render only the captured env — the 512×1024 video frame
                # for all num_envs would be a num_envs× overdraw
                prims = jax.tree.map(
                    lambda x: x[env_id:env_id + 1],
                    vision_lib.scene_prims(self.env, env_state.sim))
                from ..ops import raymarch
                poses, intr, vid_h, vid_w = vid_cam
                # RGB frames like the reference's save camera
                # (hand_base.py:355-357); Lambertian-shaded over the same
                # raymarched depth
                rgb = raymarch.render_rgb(prims, poses, intr, vid_h, vid_w)
                video_lib.save_rgb_frame(
                    pjoin(video_dir, f"{i:04d}.png"),
                    np.asarray(rgb[0, 0]))
            env_state, next_obs, rew, dones, extras = step(env_state, actions)
            o = self._select_obs(next_obs)
            if self.tricks["use_state_norm"]:
                o, _ = rms_lib.normalize(ts.rms, o, False)
        if self.save_pose:
            success = np.asarray(env_state.success)
            os.makedirs(pose_dir, exist_ok=True)
            for i, d in enumerate(save_dicts):
                d["success"] = success
                np.save(pjoin(pose_dir, f"{i}.npy"), d)
        if self.save_video:
            video_lib.path_to_video(video_dir)
        return env_state

    def _eval_capture_poses(self, ts: PPOTrainState, env_state):
        """Device-side pose capture: whole episode as one jitted scan,
        single host fetch (VERDICT r2 #10)."""
        import numpy as np

        def _episode(ts, env_state):
            env_state, obs = self.env.reset(env_state)
            o = self._select_obs(obs)
            if self.tricks["use_state_norm"]:
                o, _ = rms_lib.normalize(ts.rms, o, False)

            def body(carry, _):
                env_state, o = carry
                actions = self.ac.act(ts.params, o)
                out = dict(self.env.scene_pose(env_state))
                out["state"] = o
                out["action"] = actions
                env_state, next_obs, rew, dones, extras = self.env.step(
                    env_state, actions, train=False)
                o = self._select_obs(next_obs)
                if self.tricks["use_state_norm"]:
                    o, _ = rms_lib.normalize(ts.rms, o, False)
                return (env_state, o), out

            (env_state, _), outs = jax.lax.scan(
                body, (env_state, o), None, length=self.max_episode_length)
            return env_state, outs, env_state.success

        if not hasattr(self, "_jit_capture"):
            self._jit_capture = self._with_mesh(jax.jit(_episode))
        env_state, outs, success = self._jit_capture(ts, env_state)
        outs, success = jax.device_get((outs, success))
        pose_dir = pjoin(self.logger.save_pose_dir, f"Iter{self.curr_iter}")
        os.makedirs(pose_dir, exist_ok=True)
        for i in range(self.max_episode_length):
            d = {k: np.asarray(v[i]) for k, v in outs.items()}
            d["success"] = np.asarray(success)
            np.save(pjoin(pose_dir, f"{i}.npy"), d)
        return env_state

    def eval(self, ts: PPOTrainState, env_state, mode="Val"):
        agg = {}
        curves = []
        if self.save_pose or self.save_video:
            env_state = self._eval_capture(ts, env_state)
        for _ in range(self.eval_round):
            env_state, m, rew_curve = self._jit_eval_round(ts, env_state)
            curves.append(np.asarray(rew_curve))
            for k, v in fetch_scalars(m).items():
                agg.setdefault(k, []).append(v)
        if self.cfg.get("save_teacher_reward"):
            os.makedirs(self.save_ckpt_dir, exist_ok=True)
            np.save(pjoin(self.save_ckpt_dir, "teacher_reward.npy"),
                    np.mean(curves, axis=0))
        log = {f"{mode}/{k}": float(np.mean(v)) for k, v in agg.items()}
        # freeze RMS once eval max-success > 50 % (ppo.py:200-201)
        if log.get(f"{mode}/succ_rate_max", 0.0) > 0.5:
            ts = ts._replace(update_rms=jnp.asarray(False))
        return ts, env_state, log

    # ------------------------------------------------------------------
    # outer loop
    # ------------------------------------------------------------------

    def _lr_now(self):
        if self.lr_schedule == "linear_decay":
            return np.float32(
                max(self.lr * (1 - self.curr_iter / self.max_iter), 1e-5))
        if self.lr_schedule == "step_decay":
            return np.float32(
                1e-5 if self.curr_iter > self.max_iter // 2 else self.lr)
        return np.float32(self.lr)

    def run(self, seed: int = 0, resume: Optional[str] = None):
        ts, env_state = self.init_state(seed)
        ts = self.resume(ts, resume or self.cfg.get("resume"))

        if self.test_only:
            ts, env_state, log = self.eval(ts, env_state, mode="Test")
            self.logger.info(log, self.curr_iter)
            return ts

        # Metric readback is pipelined: iteration i's scalars are fetched
        # while iteration i+1 runs on-device, so the train loop never blocks
        # on the device→host transfer (~40 ms RTT over a tunneled runtime
        # ≈ 1/3 of an iteration at 4096 envs).  Logs carry the correct
        # iteration number; they just land one loop turn later.
        pending = None          # (iteration, device metrics)
        last_tick = time.time()

        def flush(pending):
            nonlocal last_tick
            it, metrics = pending
            log = fetch_scalars(metrics)
            now = time.time()
            elapsed = now - last_tick
            last_tick = now
            self.total_time += elapsed
            log["Progress/total_steps"] = it
            log["Progress/iteration_time"] = elapsed
            log["Progress/FPS"] = int(self.n_steps * self.num_envs
                                      / max(elapsed, 1e-9))
            log["Train/learning_rate"] = self._lr_now()
            return log

        while self.curr_iter < self.max_iter:
            self.curr_iter += 1
            ts, env_state, metrics = self._jit_train_iter(
                ts, env_state, self._lr_now())
            self.total_envsteps += self.n_steps * self.num_envs
            if pending is not None:
                self.logger.info(flush(pending), pending[0])
            pending = (self.curr_iter, metrics)

            if self.curr_iter % self.eval_freq == 0:
                self.logger.info(flush(pending), pending[0])
                pending = None
                ts, env_state, eval_log = self.eval(ts, env_state)
                self.logger.info(eval_log, self.curr_iter)
                env_state, obs = self._jit_reset(env_state)
                o = self._select_obs(obs)
                if self.tricks["use_state_norm"]:
                    o, new_rms = rms_lib.normalize(ts.rms, o, ts.update_rms)
                    ts = ts._replace(rms=new_rms)
                ts = ts._replace(curr_obs=o)
                last_tick = time.time()
            if self.curr_iter % self.save_freq == 0:
                if pending is not None:
                    self.logger.info(flush(pending), pending[0])
                    pending = None
                self.save(self.curr_iter, ts)
                last_tick = time.time()
        if pending is not None:
            self.logger.info(flush(pending), pending[0])
        return ts
