"""Opt-in bfloat16 storage mode (init_rbm_state(dtype=bfloat16)).

The flagship CD epoch is HBM-bound on W-sized traffic
(benchmarks/RESULTS.md round 2), so halving storage bytes is the main
single-chip speed lever. These tests pin that the reduced-precision path
runs end-to-end, keeps its dtype, and still learns comparably to f32 —
quality at flagship scale is measured on the TPU (bench.py bf16 variant).
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_idbn_tpu.ops import dbn_train, rbm_ops


def _bars_data(n=128, side=8, seed=0):
    rng = np.random.RandomState(seed)
    x = np.zeros((n, side, side), np.float32)
    for i in range(n):
        x[i, rng.randint(0, side)] = 1.0
    x += 0.05 * rng.rand(n, side, side)
    return jnp.asarray(np.clip(x, 0, 1).reshape(n, side * side))


def test_cd_update_bf16_dtypes_and_loss():
    state = rbm_ops.init_rbm_state(jax.random.key(0), 64, 32,
                                   dtype=jnp.bfloat16)
    assert state.w.dtype == jnp.bfloat16
    data = _bars_data()
    new_state, loss = rbm_ops.cd_update(
        state, jax.random.key(1), data, lr=0.1, mom=0.5,
        weight_decay=1e-4, cd=1)
    # storage dtype is preserved through the update
    for arr in new_state:
        assert arr.dtype == jnp.bfloat16
    # loss reported in f32 and finite
    assert loss.dtype == jnp.float32
    assert np.isfinite(float(loss))


def test_bf16_learns_like_f32():
    """30 fused epochs on bars: bf16 reconstruction loss must track the
    f32 run (same seeds) within a loose tolerance."""
    data = _bars_data()

    def run(dtype):
        states = (rbm_ops.init_rbm_state(jax.random.key(0), 64, 32,
                                         dtype=dtype),)
        last = None
        for e in range(30):
            states, losses = dbn_train.idbn_epoch(
                states, jax.random.fold_in(jax.random.key(9), e), data,
                0.1, 0.5, 1e-4, 0.1, cd=1, sparsity_flags=(False,),
                batch_size=64)
            last = float(losses.mean())
        return last, states

    f32_loss, f32_states = run(jnp.float32)
    bf16_loss, bf16_states = run(jnp.bfloat16)
    assert bf16_states[0].w.dtype == jnp.bfloat16
    # both learned (initial loss on this data is ~0.15)
    assert f32_loss < 0.05
    assert bf16_loss < 0.05
    assert abs(bf16_loss - f32_loss) < 0.02


def test_bf16_epoch_block_runs():
    data = _bars_data(n=100)  # remainder path included (100 = 64 + 36)
    states = (rbm_ops.init_rbm_state(jax.random.key(2), 64, 16,
                                     dtype=jnp.bfloat16),)
    lr = jnp.full((4,), 0.1, jnp.float32)
    mom = jnp.full((4,), 0.5, jnp.float32)
    states, sums, counts = dbn_train.idbn_epoch_block(
        states, jax.random.key(3), data, jnp.arange(4), lr, mom, 1e-4,
        0.1, cd=1, sparsity_flags=(False,), batch_size=64, n_epochs=4)
    assert states[0].w.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(sums)).all()
    assert float(counts.sum()) > 0


def test_f32_path_unchanged_by_cast():
    """The added astype is a no-op for f32 states: bit-identical results
    vs the oracle-pinned path (guards the default semantics)."""
    data = _bars_data(n=64)
    states = (rbm_ops.init_rbm_state(jax.random.key(4), 64, 16),)
    s1, l1 = dbn_train.idbn_epoch(
        states, jax.random.key(5), data, 0.1, 0.5, 1e-4, 0.1, cd=1,
        sparsity_flags=(False,), batch_size=32)
    s2, l2 = dbn_train.idbn_epoch(
        states, jax.random.key(5), jnp.asarray(data, jnp.float32), 0.1,
        0.5, 1e-4, 0.1, cd=1, sparsity_flags=(False,), batch_size=32)
    np.testing.assert_array_equal(np.asarray(s1[0].w), np.asarray(s2[0].w))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_model_level_dtype_param():
    """params["DTYPE"]="bfloat16" flows through iDBN + iMDBN training."""
    from multimodal_idbn_tpu.data import create_dataloaders_uniform
    from multimodal_idbn_tpu.models import iMDBN

    params = {"LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
              "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.9,
              "LEARNING_RATE_DYNAMIC": True, "CD": 1,
              "CROSS_GIBBS_STEPS": 3, "JOINT_AUX_COND_STEPS": 3,
              "DTYPE": "bfloat16"}
    train, val, _ = create_dataloaders_uniform(batch_size=16, n_samples=48,
                                               num_classes=4, side=10,
                                               seed=0)
    m = iMDBN([100, 24, 12], 10, params=params, dataloader=train,
              val_loader=val, num_labels=4, seed=0)
    assert m.image_idbn.layers[0].state.w.dtype == jnp.bfloat16
    assert m.joint_rbm.state.w.dtype == jnp.bfloat16
    m.image_idbn.train(epochs=1)
    m.init_joint_bias_from_data(n_batches=1)
    m.train_joint(epochs=1)
    assert m.joint_rbm.state.w.dtype == jnp.bfloat16
    assert np.isfinite(float(m.image_idbn.loss_history[-1]))
