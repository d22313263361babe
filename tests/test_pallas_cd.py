"""Opt-in Pallas sampled-CD path tests.

CPU CI covers only the fallback contract (the knob is a bit-exact no-op
off TPU) — the Mosaic PRNG has no CPU interpret mode, so the kernel
itself (probs parity at matched MXU precision, seed determinism, the
fused trainer learning) runs with IDBN_TESTS_ON_TPU=1 on the real chip
(recorded per round in benchmarks/RESULTS.md). Interpret-mode coverage
of the OTHER kernels lives in tests/test_pallas.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pl = pytest.importorskip("jax.experimental.pallas")

from multimodal_idbn_tpu.ops import pallas_kernels as pk  # noqa: E402

ON_TPU = jax.default_backend() in ("tpu", "axon")


def test_fast_sampler_gated_off_cpu():
    """With the knob ON but no TPU, iDBN must silently use the exact jnp
    path (bit-identical to knob off). On TPU the same test asserts the
    OPPOSITE: the knob engages and the different (on-core PRNG) random
    stream produces different weights."""
    from multimodal_idbn_tpu import config
    from multimodal_idbn_tpu.models import iDBN

    params = {"LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
              "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
              "LEARNING_RATE_DYNAMIC": False, "CD": 2, "SEED": 0}

    rng = np.random.RandomState(0)
    bars = (rng.rand(96, 64) > 0.8).astype(np.float32)

    class Loader:
        batch_size = 32

        def materialize(self):
            return bars, np.zeros(96, np.int64)

    def run():
        m = iDBN([64, 16], params=params, dataloader=Loader(),
                 val_loader=None, seed=0)
        m.train(epochs=2, log_every_pca=10**9, log_every_probe=10**9)
        return np.asarray(m.layers[0].state.w)

    w_off = run()
    config.enable_pallas_cd(True)
    try:
        w_on = run()
        if ON_TPU:
            assert not np.array_equal(w_off, w_on), (
                "knob on TPU must engage the Pallas sampler (different "
                "random stream => different weights)")
        else:
            np.testing.assert_array_equal(w_off, w_on)
    finally:
        config.enable_pallas_cd(False)


@pytest.mark.skipif(not ON_TPU,
                    reason="Mosaic PRNG has no CPU interpret mode; run "
                           "with IDBN_TESTS_ON_TPU=1 on the chip")
def test_half_step_sample_big_probs_parity():
    """The probs output of the k-tiled kernel must match a jnp half-step
    at the SAME precision (the kernel dots bf16 operands with f32
    accumulation — XLA's default f32-matmul precision on this MXU; the
    conftest-pinned "highest" f32 reference differs at the bf16 rounding
    level). The PRNG only affects the sample output."""
    rng = np.random.RandomState(0)
    B, V, H = 64, 1000, 300  # forces multiple k tiles (block_k=512)
    v = jnp.asarray(rng.rand(B, V).astype(np.float32))
    w = jnp.asarray((rng.randn(V, H) / np.sqrt(V)).astype(np.float32))
    b = jnp.asarray((0.1 * rng.randn(H)).astype(np.float32))
    probs, sample = pk.half_step_sample_big(v, w, b, 123)
    logits = jax.lax.dot_general(
        v.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32) + b
    want = jax.nn.sigmoid(logits)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # and coarse agreement with the full-f32 half-step (gross-error net)
    want_f32 = pk.reference_half_step(v, w, b, 1.0)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want_f32),
                               atol=0.05)
    s = np.asarray(sample)
    assert set(np.unique(s).tolist()) <= {0.0, 1.0}
    # sample mean tracks probs (law of large numbers over 19200 units)
    assert abs(s.mean() - float(probs.mean())) < 0.02
    # determinism for a fixed seed
    probs2, sample2 = pk.half_step_sample_big(v, w, b, 123)
    np.testing.assert_array_equal(s, np.asarray(sample2))
    # a different seed flips some samples
    _, sample3 = pk.half_step_sample_big(v, w, b, 124)
    assert not np.array_equal(s, np.asarray(sample3))


@pytest.mark.skipif(not ON_TPU,
                    reason="Mosaic PRNG has no CPU interpret mode")
def test_fast_sampled_cd_learns():
    """The fused trainer must learn bars like the jnp CD path."""
    from multimodal_idbn_tpu.ops import pallas_cd, rbm_ops

    rng = np.random.RandomState(0)
    V, H = 64, 32
    bars = np.zeros((256, V), np.float32)
    for i in range(256):
        bars[i].reshape(8, 8)[rng.randint(0, 8), :] = 1.0
    data = jnp.asarray(bars)

    st = rbm_ops.init_rbm_state(jax.random.key(1), V, H)
    upd = jax.jit(lambda s, k, d: pallas_cd.fast_sampled_cd_update(
        s, k, d, lr=0.1, mom=0.5, weight_decay=1e-4, cd=2))
    for e in range(60):
        for b0 in range(0, 256, 64):
            st, loss = upd(st, jax.random.fold_in(jax.random.key(2),
                                                  e * 4 + b0),
                           data[b0:b0 + 64])
    rec = rbm_ops.visible_probs(st, rbm_ops.hidden_probs(st, data[:64]))
    mse = float(jnp.mean((rec - data[:64]) ** 2))
    assert mse < 0.05, mse
