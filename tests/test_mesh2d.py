"""2-D (data × model) mesh tests on the virtual 8-device CPU mesh.

Same invariance contract as tests/test_parallel.py: counter-based
partitionable threefry ⇒ a (dp × mp) sharded run draws the same random
numbers as the single-device run; results agree to reduction order.
The reference has no parallelism at all (SURVEY.md §2 rows 20-21); these
pin the TPU-native tensor-parallel extension.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_idbn_tpu.ops import rbm_ops
from multimodal_idbn_tpu.parallel import (
    make_mesh_2d,
    shard_state,
    tp_cd_update,
    tp_idbn_epoch,
)
from multimodal_idbn_tpu.parallel.mesh2d import gather_state

V, H, B = 64, 32, 32
KEY = jax.random.key(0)


@pytest.fixture(scope="module", autouse=True)
def _free_compiled_programs():
    """Bound the CPU client's live-executable footprint: this module
    compiles several mesh-sharded epoch programs, and too many live
    executables make a LATER unrelated compile segfault in the
    full-suite process (see tests/test_parallel_shell.py / CLAUDE.md)."""
    yield
    jax.clear_caches()


def make_state(seed=0, v=V, h=H):
    return rbm_ops.init_rbm_state(jax.random.key(seed), v, h)


def test_make_mesh_2d_shapes():
    mesh = make_mesh_2d()          # 8 devices -> (4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh24 = make_mesh_2d(dp=2, mp=4)
    assert mesh24.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh_2d(mp=3)         # 8 % 3 != 0
    with pytest.raises(ValueError):
        make_mesh_2d(dp=4, mp=4)   # 16 > 8


def test_shard_state_layout():
    mesh = make_mesh_2d(dp=2, mp=4)
    st = shard_state(mesh, make_state())
    # W sharded over hidden axis: each device holds a [V, H/4] shard
    w_shard = st.w.addressable_shards[0]
    assert w_shard.data.shape == (V, H // 4)
    assert st.hb.addressable_shards[0].data.shape == (H // 4,)
    # vb replicated: full length everywhere
    assert st.vb.addressable_shards[0].data.shape == (V,)


def test_tp_cd_update_matches_single_device():
    rng = np.random.RandomState(0)
    data = (rng.rand(B, V) > 0.5).astype(np.float32)
    state = make_state()

    ref_state, ref_loss = rbm_ops.cd_update(
        state, KEY, jnp.asarray(data), lr=0.1, mom=0.5, weight_decay=1e-4,
        cd=3, groups=())

    for dp, mp in [(2, 4), (4, 2), (8, 1), (1, 8)]:
        mesh = make_mesh_2d(dp=dp, mp=mp)
        tp_state, tp_loss = tp_cd_update(
            mesh, state, KEY, data, lr=0.1, mom=0.5, weight_decay=1e-4,
            cd=3)
        np.testing.assert_allclose(np.asarray(ref_state.w),
                                   np.asarray(tp_state.w), atol=1e-6,
                                   err_msg=f"dp={dp} mp={mp}")
        np.testing.assert_allclose(np.asarray(ref_state.hb),
                                   np.asarray(tp_state.hb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref_state.vb),
                                   np.asarray(tp_state.vb), atol=1e-6)
        np.testing.assert_allclose(float(ref_loss), float(tp_loss),
                                   rtol=1e-5)


def test_tp_cd_update_softmax_groups():
    """Label softmax group on the visible axis survives the model split."""
    rng = np.random.RandomState(1)
    K = 8
    data = np.concatenate(
        [(rng.rand(B, V) > 0.5).astype(np.float32),
         np.eye(K, dtype=np.float32)[rng.randint(0, K, B)]], axis=1)
    state = make_state(v=V + K)
    groups = ((V, V + K),)

    ref_state, _ = rbm_ops.cd_update(
        state, KEY, jnp.asarray(data), lr=0.05, mom=0.5,
        weight_decay=1e-4, cd=2, groups=groups)
    mesh = make_mesh_2d(dp=2, mp=4)
    tp_state, _ = tp_cd_update(mesh, state, KEY, data, lr=0.05, mom=0.5,
                               weight_decay=1e-4, cd=2, groups=groups)
    np.testing.assert_allclose(np.asarray(ref_state.w),
                               np.asarray(tp_state.w), atol=1e-6)


def test_tp_idbn_epoch_matches_dp_epoch():
    """Fused 2-D epoch == fused 1-D DP epoch == derivable single-device
    semantics (same per-(batch, layer) fold_in keys)."""
    from multimodal_idbn_tpu.parallel import dp_idbn_epoch, make_mesh

    rng = np.random.RandomState(2)
    N = 64
    data = (rng.rand(N, V) > 0.5).astype(np.float32)
    states = (make_state(1), make_state(2, v=H, h=16))

    mesh1 = make_mesh()
    ref_states, ref_losses = dp_idbn_epoch(
        mesh1, states, KEY, data, 0.1, 0.5, 1e-4, 0.05, cd=2,
        sparsity_flags=(False, True), batch_size=16)

    mesh = make_mesh_2d(dp=2, mp=4)
    tp_states, tp_losses = tp_idbn_epoch(
        mesh, states, KEY, data, 0.1, 0.5, 1e-4, 0.05, cd=2,
        sparsity_flags=(False, True), batch_size=16)

    np.testing.assert_allclose(np.asarray(ref_losses),
                               np.asarray(tp_losses), atol=1e-5)
    for rs, ts in zip(ref_states, tp_states):
        g = gather_state(ts)
        np.testing.assert_allclose(np.asarray(rs.w), np.asarray(g.w),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(rs.hb), np.asarray(g.hb),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(rs.vb), np.asarray(g.vb),
                                   atol=1e-5)


def test_tp_idbn_epoch_uneven_n_preserves_parity():
    """N % dp != 0 must NOT change results vs the even-N semantics: the
    uneven batch axis is replicated (advisor round-2 finding — trimming
    silently changed nb and the permutation length)."""
    from multimodal_idbn_tpu.ops import dbn_train

    rng = np.random.RandomState(4)
    N = 37  # 37 % 2 != 0; batch 16 -> 2 batches + remainder 5
    data = (rng.rand(N, V) > 0.5).astype(np.float32)
    states = (make_state(1),)

    ref_states, ref_losses = dbn_train.idbn_epoch(
        states, KEY, jnp.asarray(data), 0.1, 0.5, 1e-4, 0.05, cd=2,
        sparsity_flags=(False,), batch_size=16, shuffle=True)

    mesh = make_mesh_2d(dp=2, mp=4)
    tp_states, tp_losses = tp_idbn_epoch(
        mesh, states, KEY, data, 0.1, 0.5, 1e-4, 0.05, cd=2,
        sparsity_flags=(False,), batch_size=16, shuffle=True)

    np.testing.assert_allclose(np.asarray(ref_losses),
                               np.asarray(tp_losses), atol=1e-5)
    g = gather_state(tp_states[0])
    np.testing.assert_allclose(np.asarray(ref_states[0].w),
                               np.asarray(g.w), atol=1e-5)


def test_tp_epoch_keeps_weights_sharded():
    """The scan carry must stay megatron-split (no mid-scan re-gather)."""
    rng = np.random.RandomState(3)
    data = (rng.rand(32, V) > 0.5).astype(np.float32)
    mesh = make_mesh_2d(dp=2, mp=4)
    states, _ = tp_idbn_epoch(
        mesh, (make_state(),), KEY, data, 0.1, 0.5, 1e-4, 0.05, cd=1,
        sparsity_flags=(False,), batch_size=16)
    w = states[0].w
    assert w.addressable_shards[0].data.shape == (V, H // 4)
