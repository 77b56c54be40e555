"""Actor-critic with state-independent learned log-std and tanh action
activation (≙ ``algorithms/algo_utils/actor_critic.py``).

Faithfulness notes:

* the reference passes diag(σ²) as ``scale_tril`` to MultivariateNormal
  (``actor_critic.py:39-40``), so its *effective* sampling std is
  exp(log_std)².  We mirror that parameterization (std = exp(2·log_std),
  log_std initialized to log(action_std)) so exploration noise and its
  learning dynamics match;
* actions are stored *activated* (tanh·clipAction) and de-activated with
  atanh(clip(·, ±(1−1e−5))) when re-evaluating log-probs
  (``actor_critic.py:84-100``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .networks import make_network


class ACParams(NamedTuple):
    actor: Any
    critic: Any
    log_std: jnp.ndarray


class ActorCritic:
    """Holds the two flax modules and pure sampling/eval functions."""

    def __init__(self, num_obs: int, num_actions: int, model_cfg: dict,
                 proprio_shape: int = 0):
        net_cfg = model_cfg["network"]
        self.net_cfg = net_cfg
        self.actor = make_network(net_cfg["name"], num_actions, net_cfg,
                                  proprio_shape)
        self.critic = make_network(net_cfg["name"], 1, net_cfg, proprio_shape)
        self.num_actions = num_actions
        self.num_obs = num_obs
        self.action_std = float(model_cfg["action_std"])
        self.max_action = float(model_cfg["clipAction"])
        assert self.max_action > 0
        self.action_activate = model_cfg["action_activate"]

    def init(self, rng) -> ACParams:
        ka, kc = jax.random.split(rng)
        dummy = jnp.zeros((1, self.num_obs))
        actor = self.actor.init(ka, dummy)
        critic = self.critic.init(kc, dummy)
        # ImageNet-pretrained ResNet34 init for the RGB/depth student
        # (≙ torchvision pretrained=True, network.py:207); the cfg points
        # at an .npz produced by tools/resnet_convert.py
        pre = self.net_cfg.get("pretrained")
        if pre and self.net_cfg["name"] in ("ResNet", "depthResNet"):
            from .networks import load_resnet34_pretrained
            actor = load_resnet34_pretrained(actor, pre)
            critic = load_resnet34_pretrained(critic, pre)
        log_std = jnp.full((self.num_actions,),
                           np.log(max(self.action_std, 1e-8)))
        return ACParams(actor=actor, critic=critic, log_std=log_std)

    # --- effective exploration std (see module docstring) ---
    def std(self, params: ACParams) -> jnp.ndarray:
        return jnp.exp(2.0 * params.log_std)

    def activate(self, a):
        if self.action_activate == "tanh":
            return jnp.tanh(a) * self.max_action
        assert self.action_activate is None
        return a

    def deactivate(self, a):
        if self.action_activate == "tanh":
            return jnp.arctanh(jnp.clip(a / self.max_action,
                                        -1 + 1e-5, 1 - 1e-5))
        return a

    def _log_prob(self, mean, std, raw_actions):
        var = std * std
        lp = (-0.5 * ((raw_actions - mean) ** 2) / var
              - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi))
        return lp.sum(axis=-1)

    def act(self, params: ACParams, obs):
        """Deterministic activated action (eval path)."""
        return self.activate(self.actor.apply(params.actor, obs))

    def act_cri(self, params: ACParams, obs):
        mean = self.actor.apply(params.actor, obs)
        value = self.critic.apply(params.critic, obs)
        return self.activate(mean), value

    def cri(self, params: ACParams, obs):
        return self.critic.apply(params.critic, obs)

    def random_act_cri(self, params: ACParams, obs, rng):
        """Sample actions; returns (activated action, log_prob, value, mu,
        log_std_row) like ``actor_critic.py:36-47``."""
        mean = self.actor.apply(params.actor, obs)
        std = self.std(params)
        raw = mean + std * jax.random.normal(rng, mean.shape)
        logp = self._log_prob(mean, std, raw)
        value = self.critic.apply(params.critic, obs)
        sigma_row = jnp.broadcast_to(params.log_std, mean.shape)
        return self.activate(raw), logp, value, mean, sigma_row

    def random_act(self, params: ACParams, obs, rng):
        mean = self.actor.apply(params.actor, obs)
        raw = mean + self.std(params) * jax.random.normal(rng, mean.shape)
        return self.activate(raw)

    def update_act(self, params: ACParams, obs):
        """Differentiable activated mean (BC/DAgger loss path)."""
        return self.activate(self.actor.apply(params.actor, obs))

    def evaluate(self, params: ACParams, obs, stored_actions):
        """Log-prob/entropy/value of stored (activated) actions
        (≙ ``update_act_cri``, ``actor_critic.py:71-82``)."""
        mean = self.actor.apply(params.actor, obs)
        std = self.std(params)
        raw = self.deactivate(stored_actions)
        logp = self._log_prob(mean, std, raw)
        entropy = (0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std)).sum(-1)
        value = self.critic.apply(params.critic, obs)
        sigma_row = jnp.broadcast_to(params.log_std, mean.shape)
        return logp, entropy, value, mean, sigma_row
