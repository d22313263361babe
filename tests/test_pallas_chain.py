"""Chain-kernel parity tests (TPU-only: Mosaic PRNG + full-VMEM chains).

On the CPU test mesh the kernel is exercised in interpret mode for the
deterministic family only (no pltpu.prng_* there)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pl = pytest.importorskip("jax.experimental.pallas")

from multimodal_idbn_tpu.ops import pallas_chain as pc  # noqa: E402
from multimodal_idbn_tpu.ops import rbm_ops  # noqa: E402

Dz, K, H, B = 24, 4, 16, 8
V = Dz + K
GROUPS = ((Dz, V),)


def _setup(seed=0):
    state = rbm_ops.init_rbm_state(jax.random.key(seed), V, H)
    rng = np.random.RandomState(seed)
    z = jnp.asarray(rng.rand(B, Dz).astype(np.float32))
    v_known = jnp.concatenate([z, jnp.zeros((B, K))], 1).astype(jnp.float32)
    km = jnp.concatenate([jnp.ones((B, Dz)), jnp.zeros((B, K))],
                         1).astype(jnp.float32)
    return state, v_known, km


def _interpret(fn, *args, **kw):
    from jax.experimental import pallas as pl_mod

    if jax.default_backend() in ("tpu", "axon"):
        return fn(*args, **kw)
    orig = pl_mod.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    pl_mod.pallas_call = patched
    try:
        return fn(*args, **kw)
    finally:
        pl_mod.pallas_call = orig


def test_deterministic_chain_parity():
    state, v_known, km = _setup()
    key = jax.random.key(7)
    fast = _interpret(pc.conditional_gibbs_fast, state, key, v_known, km,
                      n_steps=12, groups=GROUPS)
    ref = pc.conditional_gibbs_reference(state, key, v_known, km,
                                         n_steps=12, groups=GROUPS)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_deterministic_chain_no_groups():
    state, v_known, km = _setup(1)
    key = jax.random.key(3)
    fast = _interpret(pc.conditional_gibbs_fast, state, key, v_known, km,
                      n_steps=5, groups=())
    ref = pc.conditional_gibbs_reference(state, key, v_known, km,
                                         n_steps=5, groups=())
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pltpu.prng_* has no CPU interpret support")
def test_noisy_chain_properties():
    state, v_known, km = _setup(2)
    key = jax.random.key(5)
    vk2 = jnp.concatenate(
        [jnp.zeros((B, Dz)),
         jnp.eye(K)[np.random.RandomState(0).randint(0, K, B)]],
        1).astype(jnp.float32)
    mu = jnp.asarray(np.random.RandomState(1).rand(B, Dz),
                     dtype=jnp.float32)
    out = pc.noisy_meanfield_fast(state, key, vk2, 1.0 - km, n_steps=9,
                                  mu_k=mu, groups=GROUPS, seed=3)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()
    np.testing.assert_allclose(o[:, Dz:], np.asarray(vk2[:, Dz:]))
    o2 = np.asarray(pc.noisy_meanfield_fast(state, key, vk2, 1.0 - km,
                                            n_steps=9, mu_k=mu,
                                            groups=GROUPS, seed=3))
    np.testing.assert_array_equal(o, o2)  # deterministic per seed


def test_supported_guard():
    assert not pc.chain_kernel_supported(2048, 500, 500)  # B too large
    assert not pc.chain_kernel_supported(128, 10000, 1500)  # W too large


def test_deterministic_chain_parity_two_groups():
    """Per-group softmax normalization (regression: joint normalization
    across groups)."""
    groups2 = ((16, 20), (20, 28))
    state = rbm_ops.init_rbm_state(jax.random.key(9), V, H)
    rng = np.random.RandomState(3)
    v_known = jnp.asarray((rng.rand(B, V) > 0.5).astype(np.float32))
    km = jnp.zeros((B, V), jnp.float32).at[:, :16].set(1.0)
    key = jax.random.key(11)
    fast = _interpret(pc.conditional_gibbs_fast, state, key, v_known, km,
                      n_steps=6, groups=groups2)
    ref = pc.conditional_gibbs_reference(state, key, v_known, km,
                                         n_steps=6, groups=groups2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # each group sums to 1 independently
    f = np.asarray(fast)
    np.testing.assert_allclose(f[:, 16:20].sum(1), 1.0, atol=1e-5)
    np.testing.assert_allclose(f[:, 20:28].sum(1), 1.0, atol=1e-5)


def test_noisy_meanfield_fast_zero_steps_parity():
    state, v_known, km = _setup(4)
    key = jax.random.key(2)
    fast = _interpret(pc.noisy_meanfield_fast, state, key, v_known, km,
                      n_steps=0, groups=GROUPS)
    ref = rbm_ops.noisy_meanfield_annealed(state, key, v_known, km,
                                           n_steps=0, groups=GROUPS)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-6)


def test_chain_supported_budget():
    # B*V working set must be bounded jointly, not just V*H
    assert not pc.chain_kernel_supported(512, 3000, 500)
    assert not pc.chain_kernel_supported(2048, 532, 500)


# -- production wiring of the off-by-default knob (VERDICT r1 item 7) -----

@pytest.mark.skipif(
    jax.default_backend() in ("tpu", "axon"),
    reason="on a TPU backend the knob correctly engages the kernel")
def test_config_knob_fallback_on_cpu():
    """With the knob ON but no TPU backend, the RBM shell must fall back
    to the jnp path and produce identical results to knob-OFF."""
    from multimodal_idbn_tpu import config
    from multimodal_idbn_tpu.models import RBM

    v = np.random.RandomState(0).rand(4, 24).astype(np.float32)
    km = np.zeros((4, 24), np.float32)
    km[:, :16] = 1.0

    r_off = RBM(24, 12, 0.1, 1e-4, 0.5, softmax_groups=[(16, 24)], seed=5)
    out_off = np.asarray(r_off.conditional_gibbs(v, km, n_steps=6))
    assert not config.pallas_chain_enabled()  # default off
    config.enable_pallas_chain(True)
    try:
        r_on = RBM(24, 12, 0.1, 1e-4, 0.5, softmax_groups=[(16, 24)],
                   seed=5)
        # chain_kernel_supported is False on the CPU mesh -> jnp path
        out_on = np.asarray(r_on.conditional_gibbs(v, km, n_steps=6))
        mf_on = np.asarray(r_on.noisy_meanfield_annealed(v, km, n_steps=6))
        assert np.isfinite(mf_on).all()
    finally:
        config.enable_pallas_chain(False)
    np.testing.assert_array_equal(out_off, out_on)


def test_config_knob_engages_kernel(monkeypatch):
    """Force the support check True (+ interpret mode off-TPU): the shell
    must route through conditional_gibbs_fast and still match the jnp
    path (deterministic mean-field chain, same init stream)."""
    from multimodal_idbn_tpu import config
    from multimodal_idbn_tpu.models import RBM

    monkeypatch.setattr(pc, "chain_kernel_supported",
                        lambda *a, **k: True)
    v = np.random.RandomState(1).rand(4, 24).astype(np.float32)
    km = np.zeros((4, 24), np.float32)
    km[:, :16] = 1.0

    r_jnp = RBM(24, 12, 0.1, 1e-4, 0.5, softmax_groups=[(16, 24)], seed=9)
    ref = np.asarray(r_jnp.conditional_gibbs(v, km, n_steps=6))

    config.enable_pallas_chain(True)
    try:
        r_fast = RBM(24, 12, 0.1, 1e-4, 0.5, softmax_groups=[(16, 24)],
                     seed=9)
        called = {}
        orig = pc.conditional_gibbs_fast

        def spy(*a, **k):
            called["yes"] = True
            return _interpret(orig, *a, **k)

        monkeypatch.setattr(pc, "conditional_gibbs_fast", spy)
        out = np.asarray(r_fast.conditional_gibbs(v, km, n_steps=6))
    finally:
        config.enable_pallas_chain(False)
    assert called.get("yes"), "pallas path was not taken"
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="compiled-kernel parity through the shell needs a TPU backend")
def test_config_knob_parity_on_tpu():
    """On the real TPU the knob routes through the compiled kernel; the
    deterministic mean-field chain must match the jnp path numerically."""
    from multimodal_idbn_tpu import config
    from multimodal_idbn_tpu.models import RBM

    v = np.random.RandomState(2).rand(8, V).astype(np.float32)
    km = np.zeros((8, V), np.float32)
    km[:, :Dz] = 1.0
    r_jnp = RBM(V, H, 0.1, 1e-4, 0.5, softmax_groups=[(Dz, V)], seed=11)
    ref = np.asarray(r_jnp.conditional_gibbs(v, km, n_steps=8))
    config.enable_pallas_chain(True)
    try:
        r_fast = RBM(V, H, 0.1, 1e-4, 0.5, softmax_groups=[(Dz, V)],
                     seed=11)
        out = np.asarray(r_fast.conditional_gibbs(v, km, n_steps=8))
        mf = np.asarray(r_fast.noisy_meanfield_annealed(v, km, n_steps=8))
    finally:
        config.enable_pallas_chain(False)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    assert np.isfinite(mf).all() and mf.min() >= 0 and mf.max() <= 1
