"""Mixed-precision (COMPUTE_DTYPE) tests.

Contract (framework extension, no reference counterpart): f32 master
weights + bf16 Gibbs-chain GEMMs with f32 statistic accumulation.
Motivated by the round-2 bf16-STORAGE study (benchmarks/RESULTS.md):
pure bf16 storage collapses flagship quality because the small CD
increments round to zero against the weights; mixed precision must keep
learning quality while streaming bf16 through the HBM-bound GEMMs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_idbn_tpu.ops import dbn_train, rbm_ops

KEY = jax.random.key(0)
V, H, B = 64, 32, 32


def _bars(n=256, seed=0):
    rng = np.random.RandomState(seed)
    x = np.zeros((n, V), np.float32)
    for i in range(n):
        x[i].reshape(8, 8)[rng.randint(0, 8), :] = 1.0
    return x + rng.rand(n, V).astype(np.float32) * 0.05


def test_compute_cast_leaves_master_untouched():
    st = rbm_ops.init_rbm_state(KEY, V, H)
    cst = rbm_ops.compute_cast(st, jnp.bfloat16)
    assert cst.w.dtype == jnp.bfloat16
    assert cst.hb.dtype == jnp.bfloat16
    assert cst.vb.dtype == jnp.bfloat16
    # momentum buffers are update-only: not cast
    assert cst.w_m.dtype == jnp.float32
    # None / same dtype are no-ops (identity object)
    assert rbm_ops.compute_cast(st, None) is st
    assert rbm_ops.compute_cast(st, jnp.float32) is st


def test_mixed_update_keeps_f32_master():
    st = rbm_ops.init_rbm_state(KEY, V, H)
    data = jnp.asarray(_bars(B))
    new, loss = rbm_ops.cd_update(st, KEY, data, lr=0.1, mom=0.5,
                                  weight_decay=1e-4, cd=2,
                                  compute_dtype=jnp.bfloat16)
    for leaf in new:
        assert leaf.dtype == jnp.float32
    assert np.isfinite(float(loss))
    # the update must be non-trivial AND distinct from the exact path
    exact, _ = rbm_ops.cd_update(st, KEY, data, lr=0.1, mom=0.5,
                                 weight_decay=1e-4, cd=2)
    assert not np.allclose(np.asarray(new.w), np.asarray(st.w))
    # close to the f32 update (same RNG stream, only GEMM rounding)
    np.testing.assert_allclose(np.asarray(new.w), np.asarray(exact.w),
                               atol=0.05)


def test_mixed_default_is_bit_exact_reference_path():
    """compute_dtype=None must be the identical code path (bit parity)."""
    st = rbm_ops.init_rbm_state(KEY, V, H)
    data = jnp.asarray(_bars(B))
    a, la = rbm_ops.cd_update(st, KEY, data, lr=0.1, mom=0.5,
                              weight_decay=1e-4, cd=3)
    b, lb = rbm_ops.cd_update(st, KEY, data, lr=0.1, mom=0.5,
                              weight_decay=1e-4, cd=3, compute_dtype=None)
    assert float(la) == float(lb)
    np.testing.assert_array_equal(np.asarray(a.w), np.asarray(b.w))


def test_mixed_precision_learns_like_f32():
    """30 epochs on bars: mixed recon must drop like f32 (the property
    pure bf16 storage fails at flagship scale)."""
    data = _bars()

    def train(compute_dtype):
        st = rbm_ops.init_rbm_state(jax.random.key(1), V, H)
        sts = (st,)
        for e in range(30):
            sts, _ = dbn_train.idbn_epoch(
                sts, jax.random.fold_in(jax.random.key(2), e),
                jnp.asarray(data), 0.1, 0.5, 1e-4, 0.05, cd=1,
                sparsity_flags=(False,), batch_size=64,
                compute_dtype=compute_dtype)
        st = sts[0]
        rec = rbm_ops.visible_probs(st, rbm_ops.hidden_probs(
            st, jnp.asarray(data[:64])))
        return float(jnp.mean((rec - data[:64]) ** 2))

    m_f32 = train(None)
    m_mix = train(jnp.bfloat16)
    assert m_mix < 0.05, f"mixed failed to learn: {m_mix}"
    assert m_mix < m_f32 * 1.5, (m_f32, m_mix)


def test_idbn_param_plumbing():
    from multimodal_idbn_tpu.models import iDBN

    params = {"LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
              "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
              "LEARNING_RATE_DYNAMIC": False, "CD": 1, "SEED": 0,
              "COMPUTE_DTYPE": "bfloat16"}

    class Loader:
        batch_size = 32

        def materialize(self):
            return _bars(96), np.zeros(96, np.int64)

    model = iDBN([V, H, 16], params=params, dataloader=Loader(),
                 val_loader=None, seed=0)
    assert model.compute_dtype == jnp.bfloat16
    model.train(epochs=2, log_every_pca=10**9, log_every_probe=10**9)
    for rbm in model.layers:
        assert rbm.state.w.dtype == jnp.float32  # master stays f32
    assert np.isfinite(model.loss_history).all()


def test_compute_dtype_joint_scope_is_loud(capsys):
    """COMPUTE_DTYPE reaches only the modality iDBN stacks; the joint
    layers intentionally stay at the storage dtype (mixed precision is
    a documented-negative opt-in). Multimodal constructors must SAY so
    instead of silently applying the knob to half the model."""
    from multimodal_idbn_tpu.data import create_dataloaders_uniform
    from multimodal_idbn_tpu.models import iMDBN

    params = {"LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
              "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.9,
              "LEARNING_RATE_DYNAMIC": True, "CD": 1,
              "CROSS_GIBBS_STEPS": 3, "JOINT_AUX_COND_STEPS": 3,
              "COMPUTE_DTYPE": "bfloat16"}
    train, val, _ = create_dataloaders_uniform(
        batch_size=16, n_samples=48, num_classes=4, side=10, seed=0)
    iMDBN([100, 16, 8], 10, params=params, dataloader=train,
          val_loader=val, num_labels=4, seed=0)
    assert "warn/compute_dtype_joint" in capsys.readouterr().out
    # and silence without the knob
    params.pop("COMPUTE_DTYPE")
    iMDBN([100, 16, 8], 10, params=params, dataloader=train,
          val_loader=val, num_labels=4, seed=0)
    assert "warn/compute_dtype_joint" not in capsys.readouterr().out


def test_blocked_vs_per_epoch_parity_mixed():
    """Epoch-blocked == per-epoch under mixed precision (CLAUDE.md
    invariant extends to every compute mode)."""
    data = jnp.asarray(_bars(80))  # 80 = 2*32 + 16 remainder
    states = (rbm_ops.init_rbm_state(jax.random.key(3), V, H),)
    ek = jax.random.key(7)
    E = 3
    lr_arr = jnp.full((E,), 0.1, jnp.float32)
    mom_arr = jnp.full((E,), 0.5, jnp.float32)

    blocked, _, _ = dbn_train.idbn_epoch_block(
        states, ek, data, jnp.arange(E, dtype=jnp.int32), lr_arr, mom_arr,
        1e-4, 0.05, cd=2, sparsity_flags=(False,), batch_size=32,
        n_epochs=E, compute_dtype=jnp.bfloat16)

    cur = states
    for e in range(E):
        key = jax.random.fold_in(ek, e)
        perm = jax.random.permutation(jax.random.fold_in(key, 0),
                                      data.shape[0])
        data_p = data[perm]
        cur, _ = dbn_train.idbn_epoch(
            cur, key, data_p, 0.1, 0.5, 1e-4, 0.05, cd=2,
            sparsity_flags=(False,), batch_size=32, shuffle=False,
            compute_dtype=jnp.bfloat16)
        cur, _ = dbn_train.idbn_batch_step(
            cur, jax.random.fold_in(key, 987), data_p[64:], 0.1, 0.5,
            1e-4, 0.05, cd=2, sparsity_flags=(False,),
            compute_dtype=jnp.bfloat16)

    np.testing.assert_array_equal(np.asarray(blocked[0].w),
                                  np.asarray(cur[0].w))
