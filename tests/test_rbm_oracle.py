"""Golden tests: JAX RBM ops vs. the NumPy reference oracle.

JAX randomness is monkeypatched to the oracle's deterministic surrogates
(uniform→0.5, normal→0, categorical→argmax), so every chain and every
parameter update must match the oracle elementwise. This pins the exact
reference semantics of SURVEY.md §2.1 (probability-vs-sample positions,
update order, schedule shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_idbn_tpu.ops import rbm_ops

from oracle_np import OracleRBM

V, H, B = 24, 16, 8
GROUPS = ((18, 24),)


@pytest.fixture
def det_random(monkeypatch):
    """Pin jax.random draws to the oracle's deterministic surrogates."""

    def fake_uniform(key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0):
        return jnp.full(shape, 0.5, dtype)

    def fake_normal(key, shape=(), dtype=jnp.float32):
        return jnp.zeros(shape, dtype)

    def fake_categorical(key, logits, axis=-1, shape=None):
        return jnp.argmax(logits, axis=axis)

    monkeypatch.setattr(jax.random, "uniform", fake_uniform)
    monkeypatch.setattr(jax.random, "normal", fake_normal)
    monkeypatch.setattr(jax.random, "categorical", fake_categorical)


def make_pair(seed=0, groups=()):
    rng = np.random.RandomState(seed)
    w = rng.randn(V, H).astype(np.float32) / np.sqrt(V)
    hb = (0.1 * rng.randn(H)).astype(np.float32)
    vb = (0.1 * rng.randn(V)).astype(np.float32)
    state = rbm_ops.RBMState(
        w=jnp.asarray(w), hb=jnp.asarray(hb), vb=jnp.asarray(vb),
        w_m=jnp.zeros((V, H)), hb_m=jnp.zeros(H), vb_m=jnp.zeros(V))
    oracle = OracleRBM(w, hb, vb, groups=groups, weight_decay=1e-4)
    return state, oracle, rng


def rand_batch(rng, onehot_tail=False):
    x = (rng.rand(B, V) > 0.5).astype(np.float32)
    if onehot_tail:
        s, e = GROUPS[0]
        x[:, s:e] = 0.0
        x[np.arange(B), s + rng.randint(0, e - s, B)] = 1.0
    return x


KEY = jax.random.key(0)


def assert_close(a, b, tol=1e-4):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=tol,
                               atol=tol)


class TestConditionals:
    def test_hidden_probs(self):
        state, oracle, rng = make_pair()
        v = rand_batch(rng)
        assert_close(rbm_ops.hidden_probs(state, jnp.asarray(v), 1.7),
                     oracle.hidden_probs(v, 1.7))

    def test_visible_probs_groups(self):
        state, oracle, rng = make_pair(groups=GROUPS)
        h = rng.rand(B, H).astype(np.float32)
        got = rbm_ops.visible_probs(state, jnp.asarray(h), 0.8, GROUPS)
        want = oracle.visible_probs(h, 0.8)
        assert_close(got, want)
        np.testing.assert_allclose(
            np.asarray(got)[:, GROUPS[0][0]:GROUPS[0][1]].sum(1), 1.0,
            rtol=1e-5)

    def test_free_energy(self):
        state, oracle, rng = make_pair()
        v = rand_batch(rng)
        assert_close(rbm_ops.free_energy(state, jnp.asarray(v)),
                     oracle.free_energy(v))


class TestCDUpdate:
    @pytest.mark.parametrize("cd", [1, 5])
    @pytest.mark.parametrize("groups", [(), GROUPS])
    def test_single_update(self, det_random, cd, groups):
        state, oracle, rng = make_pair(groups=groups)
        data = rand_batch(rng, onehot_tail=bool(groups))
        new_state, loss = rbm_ops.cd_update(
            state, KEY, jnp.asarray(data), lr=0.1, mom=0.5,
            weight_decay=1e-4, cd=cd, groups=groups)
        oloss = oracle.cd_update(data, lr=0.1, mom=0.5, cd=cd)
        assert_close(loss, oloss)
        assert_close(new_state.w, oracle.w)
        assert_close(new_state.hb, oracle.hb)
        assert_close(new_state.vb, oracle.vb)
        assert_close(new_state.w_m, oracle.w_m)

    def test_multi_step_momentum_chain(self, det_random):
        """Three sequential updates: momentum buffers must track exactly."""
        state, oracle, rng = make_pair()
        for i in range(3):
            data = rand_batch(rng)
            state, _ = rbm_ops.cd_update(
                state, KEY, jnp.asarray(data), lr=0.1, mom=0.5 if i <= 1 else 0.9,
                weight_decay=1e-4, cd=2, groups=())
            oracle.cd_update(data, lr=0.1, mom=0.5 if i <= 1 else 0.9, cd=2)
        assert_close(state.w, oracle.w)
        assert_close(state.vb_m, oracle.vb_m)

    def test_sparsity_term(self, det_random):
        state, oracle, rng = make_pair()
        oracle.sparsity, oracle.sparsity_factor = True, 0.05
        data = rand_batch(rng)
        new_state, _ = rbm_ops.cd_update(
            state, KEY, jnp.asarray(data), lr=0.1, mom=0.5,
            weight_decay=1e-4, cd=1, sparsity=True, sparsity_factor=0.05,
            groups=())
        oracle.cd_update(data, lr=0.1, mom=0.5, cd=1)
        assert_close(new_state.hb, oracle.hb)
        assert_close(new_state.hb_m, oracle.hb_m)


class TestConditionalSamplers:
    def _mask(self, known_front=True):
        km = np.zeros((B, V), np.float32)
        if known_front:
            km[:, :18] = 1.0
        else:
            km[:, 18:] = 1.0
        return km

    @pytest.mark.parametrize("sample_h", [False, True])
    def test_conditional_gibbs(self, det_random, sample_h):
        state, oracle, rng = make_pair(groups=GROUPS)
        vk = rand_batch(rng, onehot_tail=True)
        km = self._mask()
        got = rbm_ops.conditional_gibbs(state, KEY, jnp.asarray(vk),
                                        jnp.asarray(km), n_steps=7,
                                        sample_h=sample_h, groups=GROUPS)
        want = oracle.conditional_gibbs(vk, km, 7, sample_h=sample_h)
        assert_close(got, want)

    def test_sampled_conditional_chain(self, det_random):
        """Pins the generative chain (framework extension behind
        sample_txt2img/sample_cross): h AND v det-sampled each step,
        softmax group re-sampled via argmax, clamp positions, uniform
        init, final SAMPLED v with no mean-field pass."""
        state, oracle, rng = make_pair(groups=GROUPS)
        vk = rand_batch(rng, onehot_tail=True)
        km = self._mask()
        got = rbm_ops.sampled_conditional_chain(
            state, KEY, jnp.asarray(vk), jnp.asarray(km[0]), n_steps=7,
            groups=GROUPS)
        want = oracle.sampled_conditional_chain(vk, km, 7)
        assert_close(got, want)
        with pytest.raises(ValueError, match="n_steps"):
            rbm_ops.sampled_conditional_chain(
                state, KEY, jnp.asarray(vk), jnp.asarray(km[0]),
                n_steps=0, groups=GROUPS)

    def test_dbn_decode_sampled_oracle(self, det_random):
        """Pins the ancestral-sampled decode order: intermediate layers
        det-sampled, bottom layer probabilities."""
        from multimodal_idbn_tpu.ops import dbn_train

        from oracle_np import OracleRBM, dbn_decode_sampled_oracle

        rng = np.random.RandomState(3)
        sizes = [(V, H), (H, 6)]
        states, oracles = [], []
        for vi, hi in sizes:
            w = rng.randn(vi, hi).astype(np.float32) / np.sqrt(vi)
            hb = (0.1 * rng.randn(hi)).astype(np.float32)
            vb = (0.1 * rng.randn(vi)).astype(np.float32)
            states.append(rbm_ops.RBMState(
                w=jnp.asarray(w), hb=jnp.asarray(hb), vb=jnp.asarray(vb),
                w_m=jnp.zeros((vi, hi)), hb_m=jnp.zeros(hi),
                vb_m=jnp.zeros(vi)))
            oracles.append(OracleRBM(w, hb, vb))
        top = (rng.rand(B, 6) > 0.5).astype(np.float32)
        got = dbn_train.dbn_decode_sampled(tuple(states),
                                           jnp.asarray(top), KEY)
        want = dbn_decode_sampled_oracle(oracles, top)
        assert_close(got, want)

    def test_conditional_gibbs_annealed(self, det_random):
        state, oracle, rng = make_pair(groups=GROUPS)
        vk = rand_batch(rng, onehot_tail=True)
        km = self._mask()
        got = rbm_ops.conditional_gibbs_annealed(
            state, KEY, jnp.asarray(vk), jnp.asarray(km), n_steps=12,
            T0=2.5, T1=1.0, sample_h_until=6, sample_v_every=2,
            groups=GROUPS)
        want = oracle.conditional_gibbs_annealed(
            vk, km, n_steps=12, T0=2.5, T1=1.0, sample_h_until=6,
            sample_v_every=2)
        assert_close(got, want)

    @pytest.mark.parametrize("with_mu", [False, True])
    def test_noisy_meanfield(self, det_random, with_mu):
        state, oracle, rng = make_pair(groups=GROUPS)
        vk = rand_batch(rng, onehot_tail=True)
        km = self._mask(known_front=False)  # labels clamped
        mu = rng.rand(B, 18).astype(np.float32) if with_mu else None
        got = rbm_ops.noisy_meanfield_annealed(
            state, KEY, jnp.asarray(vk), jnp.asarray(km), n_steps=9,
            T0=3.0, T1=1.0, sigma0=0.9, hot_frac=0.7, sharpen_last=3,
            T_cold_plus=0.9,
            mu_k=None if mu is None else jnp.asarray(mu), eta0=0.15,
            groups=GROUPS)
        want = oracle.noisy_meanfield_annealed(
            vk, km, n_steps=9, T0=3.0, T1=1.0, sigma0=0.9, sharpen_last=3,
            T_cold_plus=0.9, mu_k=mu, eta0=0.15)
        assert_close(got, want)

    def test_clamped_coordinates_invariant(self):
        """Known coordinates must come back exactly (property, real RNG)."""
        state, _, rng = make_pair(groups=GROUPS)
        vk = rand_batch(rng, onehot_tail=True)
        km = self._mask(known_front=False)
        out = rbm_ops.noisy_meanfield_annealed(
            state, jax.random.key(3), jnp.asarray(vk), jnp.asarray(km),
            n_steps=5, groups=GROUPS)
        np.testing.assert_allclose(np.asarray(out)[:, 18:], vk[:, 18:])


class TestClampedCD:
    @pytest.mark.parametrize("use_noisy_init", [True, False])
    @pytest.mark.parametrize("reclamp", [True, False])
    def test_update(self, det_random, use_noisy_init, reclamp):
        state, oracle, rng = make_pair(groups=GROUPS)
        vk = rand_batch(rng, onehot_tail=True)
        km = np.zeros((B, V), np.float32)
        km[:, 18:] = 1.0
        new_state, loss = rbm_ops.clamped_cd_update(
            state, KEY, jnp.asarray(vk), jnp.asarray(km), lr=0.04, mom=0.5,
            weight_decay=1e-4, cd=1, cond_init_steps=10, sample_h=False,
            sample_v=False, reclamp_negative=reclamp, aux_lr_mult=0.3,
            use_noisy_init=use_noisy_init, groups=GROUPS)
        oloss = oracle.clamped_cd_update(
            vk, km, lr=0.04, mom=0.5, cd=1, cond_init_steps=10,
            sample_h=False, sample_v=False, reclamp_negative=reclamp,
            aux_lr_mult=0.3, use_noisy_init=use_noisy_init)
        assert_close(loss, oloss)
        assert_close(new_state.w, oracle.w)
        assert_close(new_state.hb, oracle.hb)
        assert_close(new_state.vb, oracle.vb)


class TestSamplersStochastic:
    def test_bernoulli_mean(self):
        from multimodal_idbn_tpu.ops.sampling import sample_bernoulli
        p = jnp.full((2000, 50), 0.3)
        s = sample_bernoulli(jax.random.key(0), p)
        assert abs(float(s.mean()) - 0.3) < 0.01
        assert set(np.unique(np.asarray(s))) <= {0.0, 1.0}

    def test_categorical_onehot(self):
        from multimodal_idbn_tpu.ops.sampling import sample_categorical_onehot
        probs = jnp.asarray(np.tile([0.6, 0.3, 0.1], (4000, 1)), jnp.float32)
        s = sample_categorical_onehot(jax.random.key(1), probs)
        np.testing.assert_allclose(np.asarray(s).sum(1), 1.0)
        freq = np.asarray(s).mean(0)
        np.testing.assert_allclose(freq, [0.6, 0.3, 0.1], atol=0.03)

    def test_sample_visible_group_onehot(self):
        from multimodal_idbn_tpu.ops.sampling import sample_visible
        rng = np.random.RandomState(0)
        p = jnp.asarray(rng.rand(64, V).astype(np.float32))
        s = sample_visible(jax.random.key(2), p, GROUPS)
        block = np.asarray(s)[:, GROUPS[0][0]:GROUPS[0][1]]
        np.testing.assert_allclose(block.sum(1), 1.0)
        assert set(np.unique(np.asarray(s))) <= {0.0, 1.0}


def test_determinism_same_key():
    state, _, rng = make_pair()
    data = jnp.asarray(rand_batch(rng))
    s1, l1 = rbm_ops.cd_update(state, KEY, data, lr=0.1, mom=0.5,
                               weight_decay=0.0, cd=3, groups=())
    s2, l2 = rbm_ops.cd_update(state, KEY, data, lr=0.1, mom=0.5,
                               weight_decay=0.0, cd=3, groups=())
    assert float(l1) == float(l2)
    np.testing.assert_array_equal(np.asarray(s1.w), np.asarray(s2.w))
