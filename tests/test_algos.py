"""Unit tests for the learner stack: RMS, GAE semantics, actor-critic
parameterization (SURVEY.md §2 components 8, 9, 11)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partmanip_tpu.algos import rms as rms_lib
from partmanip_tpu.algos import storage
from partmanip_tpu.models.actor_critic import ActorCritic


class TestRMS:
    def test_matches_batch_statistics(self):
        """RMS over k equal-size batches ≈ ground-truth mean/std
        (the reference's own __main__ check, RMS.py:60-81)."""
        rng = np.random.RandomState(0)
        state = rms_lib.init_rms(7)
        chunks = [rng.randn(1000, 7).astype(np.float32) * 2 + 1 for _ in range(10)]
        for c in chunks:
            state = rms_lib.update_rms(state, jnp.asarray(c))
        allx = np.concatenate(chunks, 0)
        np.testing.assert_allclose(np.asarray(state.mean[0]), allx.mean(0),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(state.std[0]), allx.std(0),
                                   atol=1e-2)

    def test_freeze_flag(self):
        state = rms_lib.init_rms(3)
        x = jnp.ones((8, 3))
        _, s1 = rms_lib.normalize(state, x, update=jnp.asarray(False))
        assert int(s1.n) == 0
        np.testing.assert_allclose(np.asarray(s1.mean), np.asarray(state.mean))
        _, s2 = rms_lib.normalize(state, x, update=jnp.asarray(True))
        assert int(s2.n) == 1


class TestGAE:
    def mk(self, T, E, **kw):
        z = jnp.zeros((T, E))
        d = dict(observations=jnp.zeros((T, E, 3)), actions=jnp.zeros((T, E, 2)),
                 rewards=z, dones=z.astype(bool), succs=z.astype(bool),
                 values=z, log_probs=z, mu=jnp.zeros((T, E, 2)),
                 sigma=jnp.zeros((T, E, 2)))
        d.update(kw)
        return storage.Rollout(**d)

    def test_no_done_matches_closed_form(self):
        """Constant reward 1, zero values: adv_t = Σ (γλ)^k over the tail."""
        T, E, gamma, lam = 4, 2, 0.9, 0.8
        ro = self.mk(T, E, rewards=jnp.ones((T, E)))
        ret, adv = storage.compute_returns(ro, jnp.zeros(E), gamma, lam, None)
        expect = []
        for t in range(T):
            s = sum((gamma * lam) ** k for k in range(T - t))
            expect.append(s)
        np.testing.assert_allclose(np.asarray(adv[:, 0]), expect, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ret), np.asarray(adv), rtol=1e-5)

    def test_done_masks_advantage(self):
        """adv = 0 on done steps; the chain restarts after a done
        (storage.py:104-106)."""
        T, E = 5, 1
        dones = jnp.zeros((T, E), bool).at[2, 0].set(True)
        ro = self.mk(T, E, rewards=jnp.ones((T, E)), dones=dones)
        ret, adv = storage.compute_returns(ro, jnp.zeros(1), 0.9, 0.8, None)
        a = np.asarray(adv[:, 0])
        assert a[2] == 0.0
        # steps before the done only accumulate up to it
        g = 0.9 * 0.8
        np.testing.assert_allclose(a[1], 1.0, rtol=1e-5)
        np.testing.assert_allclose(a[0], 1.0 + g * a[1], rtol=1e-5)

    def test_success_pins_returns(self):
        """returns = succ_value on success steps (storage.py:107-108), and
        advantages = returns − values everywhere."""
        T, E = 3, 1
        succs = jnp.zeros((T, E), bool).at[1, 0].set(True)
        values = jnp.full((T, E), 2.0)
        ro = self.mk(T, E, rewards=jnp.ones((T, E)), succs=succs, values=values)
        ret, adv = storage.compute_returns(ro, jnp.zeros(1), 0.9, 0.8, 500.0)
        assert float(ret[1, 0]) == 500.0
        np.testing.assert_allclose(np.asarray(adv), np.asarray(ret - values))

    def test_whole_adv_norm(self):
        ro = self.mk(4, 8, rewards=jnp.arange(32.0).reshape(4, 8))
        _, adv = storage.compute_returns(ro, jnp.zeros(8), 0.99, 0.95, None,
                                         whole_adv_norm=True)
        assert abs(float(adv.mean())) < 1e-5
        assert abs(float(adv.std()) - 1.0) < 1e-3

    def test_minibatch_indices(self):
        idx = storage.minibatch_indices(jax.random.PRNGKey(0), 100, 3,
                                        "sequential")
        assert idx.shape == (3, 33)
        np.testing.assert_array_equal(np.asarray(idx).ravel(), np.arange(99))
        ridx = storage.minibatch_indices(jax.random.PRNGKey(0), 100, 3,
                                         "random")
        assert ridx.shape == (3, 33)
        assert len(np.unique(np.asarray(ridx))) == 99

    def test_minibatch_cap_2048(self):
        idx = storage.minibatch_indices(jax.random.PRNGKey(0), 16384, 4,
                                        "sequential")
        assert idx.shape == (8, 2048)  # capped at 2048 (storage.py:127)


class TestActorCritic:
    def setup_method(self):
        cfg = {"action_std": 0.5, "action_activate": "tanh", "clipAction": 1.0,
               "network": {"name": "MLP", "hid_dim": [32, 32],
                           "activation": "tanh"}}
        self.ac = ActorCritic(10, 4, cfg)
        self.params = self.ac.init(jax.random.PRNGKey(0))

    def test_effective_std_matches_reference_quirk(self):
        """scale_tril=diag(σ²) in the reference ⇒ effective std σ²
        (actor_critic.py:39-40): action_std 0.5 → sampling std 0.25."""
        np.testing.assert_allclose(np.asarray(self.ac.std(self.params)),
                                   0.25, rtol=1e-5)

    def test_activation_roundtrip(self):
        a = jnp.array([[0.3, -0.7, 0.0, 0.95]])
        raw = self.ac.deactivate(a)
        np.testing.assert_allclose(np.asarray(self.ac.activate(raw)),
                                   np.asarray(a), atol=1e-5)

    def test_sample_logprob_consistency(self):
        obs = jax.random.normal(jax.random.PRNGKey(1), (6, 10))
        act, logp, value, mu, sigma = self.ac.random_act_cri(
            self.params, obs, jax.random.PRNGKey(2))
        assert act.shape == (6, 4) and value.shape == (6, 1)
        assert np.all(np.abs(np.asarray(act)) <= 1.0)
        # evaluate() recovers ~the same log-prob for the stored actions
        logp2, ent, v2, mu2, sigma2 = self.ac.evaluate(self.params, obs, act)
        np.testing.assert_allclose(np.asarray(logp), np.asarray(logp2),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu2), atol=1e-6)

    def test_sigma_rows_are_log_std(self):
        obs = jnp.zeros((2, 10))
        _, _, _, _, sigma = self.ac.random_act_cri(self.params, obs,
                                                   jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(sigma[0]), np.log(0.5), rtol=1e-5)


class TestNetworks:
    def test_conv3d_shapes(self):
        from partmanip_tpu.models.networks import Conv3DNet
        net = Conv3DNet(output_dim=7,
                        net_cfg={"activation": "tanh"}, proprio_shape=25)
        x = jnp.zeros((2, 50 ** 3 + 25))
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x)
        assert out.shape == (2, 7)

    def test_pointnet_shapes(self):
        from partmanip_tpu.models.networks import PointNet
        net = PointNet(output_dim=7,
                       net_cfg={"activation": "relu", "max_mean": True,
                                "sub_mean": True}, proprio_shape=0)
        x = jnp.zeros((2, 1024 * 3))
        params = net.init(jax.random.PRNGKey(0), x)
        assert net.apply(params, x).shape == (2, 7)

    def test_mlp_bf16_compute_path(self):
        """Default MLP compute dtype is bf16 (MXU path): params and outputs
        stay f32, and `dtype: f32` restores full-precision numerics within
        bf16 rounding of the default."""
        from partmanip_tpu.models.networks import MLP
        cfg = {"activation": "tanh", "hid_dim": [64, 64]}
        net = MLP(4, cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 10))
        params = net.init(jax.random.PRNGKey(0), x)
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
        y = net.apply(params, x)
        assert y.dtype == jnp.float32
        y32 = MLP(4, dict(cfg, dtype="f32")).apply(params, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y32), atol=5e-3)
        # gradients flow against the f32 params
        g = jax.grad(lambda p: net.apply(p, x).sum())(params)
        assert all(q.dtype == jnp.float32 for q in jax.tree.leaves(g))
