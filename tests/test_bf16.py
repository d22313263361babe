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


def test_bimodal_joint_dtype_and_sr_from_params():
    """The dtype/SR knobs must reach the BIMODAL joint stack too — the
    round-5 YAML plumbing originally threaded sr but not dtype into
    _build_joint, leaving the joint layers f32 (where SR is a no-op)
    while the modality DBNs trained in bf16."""
    from multimodal_idbn_tpu.data import create_dataloaders_uniform
    from multimodal_idbn_tpu.models import iMDBN_BiModal

    params = {"LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
              "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.9,
              "LEARNING_RATE_DYNAMIC": True, "CD": 1, "JOINT_CD": 1,
              "JOINT_LEARNING_RATE": 0.04, "CROSS_GIBBS_STEPS": 3,
              "JOINT_AUX_COND_STEPS": 3,
              "DTYPE": "bfloat16", "SR": True}
    train, val, _ = create_dataloaders_uniform(
        batch_size=16, n_samples=48, num_classes=4, side=10, seed=0,
        second_modality="mnist100")
    m = iMDBN_BiModal([100, 16], [28 * 56, 16], [12], params=params,
                      dataloader=train, val_loader=val, seed=0)
    for rbm in (m.mod1_dbn.layers[0], m.mod2_dbn.layers[0],
                m.joint_layers[0]):
        assert rbm.state.w.dtype == jnp.bfloat16
        assert rbm.sr is True


def test_stochastic_round_unbiased_and_adjacent():
    """SR must return one of the two bf16 neighbors of x, with the
    sample mean converging to x (unbiasedness is the whole point)."""
    import ml_dtypes

    x = jnp.full((4096,), 0.1003, jnp.float32)  # not bf16-representable
    lo = np.asarray(np.float32(np.asarray(0.1003, np.float32)
                               .astype(ml_dtypes.bfloat16)))  # nearest
    out = rbm_ops.stochastic_round(jax.random.key(0), x, jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    vals = np.unique(np.asarray(out, np.float32))
    assert len(vals) <= 2  # the two adjacent bf16 values only
    mean = float(np.mean(np.asarray(out, np.float32)))
    assert abs(mean - 0.1003) < 2e-4, (mean, vals, lo)
    # exact bf16 values pass through unchanged
    exact = jnp.asarray(vals, jnp.float32)
    out2 = rbm_ops.stochastic_round(jax.random.key(1), exact, jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out2, np.float32), vals)
    # f32 target is the identity
    out3 = rbm_ops.stochastic_round(jax.random.key(2), x, jnp.float32)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(x))


def test_stochastic_round_negative_and_signs():
    """Unbiased for negative values too (sign-magnitude bit trick)."""
    x = jnp.full((8192,), -0.0377, jnp.float32)
    out = np.asarray(rbm_ops.stochastic_round(
        jax.random.key(3), x, jnp.bfloat16), np.float32)
    assert (out < 0).all()
    assert abs(out.mean() - (-0.0377)) < 1e-4


def test_bf16_sr_accumulates_tiny_updates():
    """The bf16 quality collapse: increments below ~0.4% of the weight
    magnitude vanish under nearest rounding (sr=False) but accumulate in
    expectation under SR (the default for bf16 storage)."""
    state = rbm_ops.init_rbm_state(jax.random.key(0), 64, 32,
                                   dtype=jnp.bfloat16)
    data = _bars_data()

    def run(sr, lr, steps=50):
        s = state
        for t in range(steps):
            s, _ = rbm_ops.cd_update(s, jax.random.key(100 + t), data,
                                     lr=lr, mom=0.0, weight_decay=0.0,
                                     cd=1, sr=sr)
        return s

    lr = 1e-4  # increments ~1e-5-1e-6 vs weights ~0.1: sub-ULP for bf16
    drift_legacy = float(jnp.mean(jnp.abs(
        (run(False, lr).vb - state.vb).astype(jnp.float32))))
    drift_sr = float(jnp.mean(jnp.abs(
        (run(None, lr).vb - state.vb).astype(jnp.float32))))
    # visible bias starts at 0 where bf16 ULP is tiny — use the weights,
    # whose magnitude ~0.1 makes the increments sub-ULP
    w_legacy = float(jnp.mean(jnp.abs(
        (run(False, lr).w - state.w).astype(jnp.float32))))
    w_sr = float(jnp.mean(jnp.abs(
        (run(None, lr).w - state.w).astype(jnp.float32))))
    assert w_sr > 5 * max(w_legacy, 1e-9), (w_legacy, w_sr, drift_legacy,
                                            drift_sr)


def test_bf16_sr_dtype_and_fused_epoch():
    """Auto-SR keeps the storage dtype through cd_update, pcd_update and
    the fused epoch/block paths (no f32 leakage into the scan carry)."""
    state = rbm_ops.init_rbm_state(jax.random.key(0), 64, 32,
                                   dtype=jnp.bfloat16)
    data = _bars_data()
    new_state, loss = rbm_ops.cd_update(state, jax.random.key(1), data,
                                        lr=0.1, mom=0.5, weight_decay=1e-4,
                                        cd=1)
    for arr in new_state:
        assert arr.dtype == jnp.bfloat16
    assert loss.dtype == jnp.float32
    chains = rbm_ops.init_pcd_chains(jax.random.key(2), data.shape[0], 64,
                                     dtype=jnp.bfloat16)
    ps, pc, pl = rbm_ops.pcd_update(state, chains, jax.random.key(3), data,
                                    lr=0.1, mom=0.5, weight_decay=1e-4,
                                    cd=1)
    for arr in ps:
        assert arr.dtype == jnp.bfloat16
    states, sums, counts = dbn_train.idbn_epoch_block(
        (state,), jax.random.key(4), data,
        jnp.arange(2, dtype=jnp.int32), jnp.full((2,), 0.1, jnp.float32),
        jnp.full((2,), 0.5, jnp.float32), 1e-4, 0.1, cd=1,
        sparsity_flags=(False,), batch_size=32, n_epochs=2)
    for arr in states[0]:
        assert arr.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(sums)).all()


def test_bf16_sr_clamped_update_dtype_and_accumulation():
    """clamped_cd_update (the joint/aux trainer) routes through the same
    SR epilogue: bf16 state preserved, tiny scaled updates accumulate."""
    Dz, K = 24, 4
    state = rbm_ops.init_rbm_state(jax.random.key(0), Dz + K, 16,
                                   dtype=jnp.bfloat16)
    # clamp inputs stay f32 like every caller passes them (the annealed
    # chain's f32 schedule arrays promote the carry); only the STATE is
    # reduced-precision
    v = jnp.zeros((32, Dz + K), jnp.float32).at[:, Dz].set(1.0)
    mask = jnp.zeros((Dz + K,), jnp.float32).at[Dz:].set(1.0)

    new_state, loss = rbm_ops.clamped_cd_update(
        state, jax.random.key(1), v, mask, lr=0.1, mom=0.5,
        weight_decay=1e-4, cd=1, cond_init_steps=5)
    for arr in new_state:
        assert arr.dtype == jnp.bfloat16
    assert np.isfinite(float(loss))

    def drift(sr, lr=1e-4, steps=40):
        s = state
        for t in range(steps):
            s, _ = rbm_ops.clamped_cd_update(
                s, jax.random.key(50 + t), v, mask, lr=lr, mom=0.0,
                weight_decay=0.0, cd=1, cond_init_steps=5, sr=sr)
        return float(jnp.mean(jnp.abs((s.w - state.w).astype(jnp.float32))))

    assert drift(None) > 5 * max(drift(False), 1e-9)


def test_sr_knob_yaml_to_ops():
    """The YAML ``training.stochastic_rounding`` knob reaches the ops
    layer (VERDICT r4 item 8): build_params maps it to params["SR"],
    param_sr parses it, the model threads it, and at bf16 storage
    sr=False (legacy biased epilogue) trains DIFFERENT weights than the
    auto default (SR on) while sr=None stays the auto rule."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "scripts"))
    try:
        from train_multimodal import build_params
    finally:
        sys.path.pop(0)
    from multimodal_idbn_tpu.models.rbm import param_sr

    cfg = {"training": {"stochastic_rounding": False,
                        "dtype": "bfloat16"}}
    params = build_params(cfg)
    assert params["SR"] is False and params["DTYPE"] == "bfloat16"
    assert param_sr(params) is False
    assert param_sr(build_params({"training": {}})) is None
    assert param_sr({"SR": "true"}) is True
    assert param_sr({"SR": "auto"}) is None

    # model-level: iDBN resolves and threads the knob
    from multimodal_idbn_tpu.models.idbn import iDBN

    data = _bars_data()

    def run(sr_val):
        p = {"LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
             "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
             "LEARNING_RATE_DYNAMIC": False, "CD": 1,
             "DTYPE": "bfloat16", "SR": sr_val}
        m = iDBN([64, 32], p, dataloader=None, val_loader=None, seed=0)
        assert m.sr is (None if sr_val is None else sr_val)
        states, _ = dbn_train.idbn_epoch(
            m._states(), jax.random.key(3), data, 0.1, 0.5, 1e-4, 0.1,
            cd=1, sparsity_flags=(False,), batch_size=64, sr=m.sr)
        return np.asarray(states[0].w, np.float32)

    w_auto = run(None)     # auto: SR on for bf16 storage
    w_on = run(True)       # explicit on == auto at bf16
    w_off = run(False)     # legacy biased epilogue
    np.testing.assert_array_equal(w_auto, w_on)
    assert not np.array_equal(w_auto, w_off)
