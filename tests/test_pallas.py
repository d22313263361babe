"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU).

The jnp path is the correctness reference (SURVEY.md §7 step 2); kernels
must match it exactly for the deterministic half-step and distributionally
for the fused sampler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pl = pytest.importorskip("jax.experimental.pallas")

from multimodal_idbn_tpu.ops import pallas_kernels as pk  # noqa: E402


def _run_interpret(kernel_call, *args, **kw):
    """Force interpret mode on CPU; run compiled on a real TPU backend."""
    from jax.experimental import pallas as pl_mod

    if jax.default_backend() in ("tpu", "axon"):
        return kernel_call(*args, **kw)

    orig = pl_mod.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    pl_mod.pallas_call = patched
    try:
        return kernel_call(*args, **kw)
    finally:
        pl_mod.pallas_call = orig


@pytest.mark.parametrize("shape", [(32, 100, 64), (130, 200, 300)])
def test_half_step_probs_parity(shape):
    B, V, H = shape
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.rand(B, V).astype(np.float32))
    w = jnp.asarray((rng.randn(V, H) / np.sqrt(V)).astype(np.float32))
    b = jnp.asarray((0.1 * rng.randn(H)).astype(np.float32))
    got = _run_interpret(pk.half_step_probs, v, w, b, 1.3)
    want = pk.reference_half_step(v, w, b, 1.3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pltpu.prng_* primitives have no CPU interpret support")
def test_half_step_sample_distribution():
    B, V, H = 256, 64, 256
    rng = np.random.RandomState(1)
    v = jnp.asarray(rng.rand(B, V).astype(np.float32))
    w = jnp.asarray((rng.randn(V, H) / np.sqrt(V)).astype(np.float32))
    b = jnp.asarray(np.zeros(H, np.float32))
    probs, sample = _run_interpret(pk.half_step_sample, v, w, b, 7)
    p = np.asarray(probs)
    s = np.asarray(sample)
    np.testing.assert_allclose(
        p, np.asarray(pk.reference_half_step(v, w, b, 1.0)), atol=2e-5)
    assert set(np.unique(s)) <= {0.0, 1.0}
    # empirical mean tracks probabilities
    assert abs(float(s.mean()) - float(p.mean())) < 0.01
    # deterministic for fixed seed
    _, s2 = _run_interpret(pk.half_step_sample, v, w, b, 7)
    np.testing.assert_array_equal(s, np.asarray(s2))
    # different seed -> different draws
    _, s3 = _run_interpret(pk.half_step_sample, v, w, b, 8)
    assert not np.array_equal(s, np.asarray(s3))


def test_hidden_probs_pallas_fallback_on_cpu():
    """On the CPU test backend the dispatcher falls back to the jnp path."""
    from multimodal_idbn_tpu.ops import rbm_ops

    state = rbm_ops.init_rbm_state(jax.random.key(0), 40, 24)
    v = jnp.asarray(np.random.RandomState(2).rand(8, 40).astype(np.float32))
    got = pk.hidden_probs_pallas(state, v, 1.0)
    want = rbm_ops.hidden_probs(state, v, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pallas_supported_guard():
    assert not pk.pallas_supported(128, 50_000, 500)  # V too large for VMEM
