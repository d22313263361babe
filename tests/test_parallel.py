"""Multi-chip tests on the virtual 8-device CPU mesh.

The critical invariant: a sharded run draws the SAME random numbers as
the single-device run (counter-based partitionable threefry), so results
agree to floating-point reduction order (~1 ulp) across any device count
— SURVEY.md §5.8 / BASELINE.json north star.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_idbn_tpu.ops import dbn_train, rbm_ops
from multimodal_idbn_tpu.parallel import (
    dp_cd_update,
    dp_idbn_epoch,
    make_mesh,
    pad_to_multiple,
    shard_batch,
)

V, H, B = 64, 32, 32
KEY = jax.random.key(0)


def make_state(seed=0):
    return rbm_ops.init_rbm_state(jax.random.key(seed), V, H)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh4 = make_mesh(4)
    assert mesh4.devices.size == 4
    with pytest.raises(ValueError):
        make_mesh(1000)


def test_dp_cd_update_matches_single_device():
    rng = np.random.RandomState(0)
    data = (rng.rand(B, V) > 0.5).astype(np.float32)
    state = make_state()

    ref_state, ref_loss = rbm_ops.cd_update(
        state, KEY, jnp.asarray(data), lr=0.1, mom=0.5, weight_decay=1e-4,
        cd=3, groups=())

    mesh = make_mesh()
    dp_state, dp_loss = dp_cd_update(mesh, state, KEY, data, lr=0.1,
                                     mom=0.5, weight_decay=1e-4, cd=3)
    # identical RNG draws; only reduction order differs (psum of local
    # partial sums), so agreement is to ~1 ulp
    np.testing.assert_allclose(np.asarray(ref_state.w),
                               np.asarray(dp_state.w), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref_state.vb),
                               np.asarray(dp_state.vb), atol=1e-6)
    np.testing.assert_allclose(float(ref_loss), float(dp_loss), rtol=1e-5)


def test_dp_cd_update_different_mesh_sizes_agree():
    rng = np.random.RandomState(1)
    data = (rng.rand(B, V) > 0.5).astype(np.float32)
    state = make_state(1)
    out = []
    for n in (2, 4, 8):
        mesh = make_mesh(n)
        s, _ = dp_cd_update(mesh, state, KEY, data, lr=0.1, mom=0.5,
                            weight_decay=0.0, cd=2)
        out.append(np.asarray(s.w))
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)
    np.testing.assert_allclose(out[1], out[2], atol=1e-6)


def test_dp_idbn_epoch_matches_single_device():
    rng = np.random.RandomState(2)
    data = (rng.rand(64, V) > 0.5).astype(np.float32)
    states = (rbm_ops.init_rbm_state(jax.random.key(3), V, H),
              rbm_ops.init_rbm_state(jax.random.key(4), H, 16))
    kwargs = dict(cd=1, sparsity_flags=(False, True), batch_size=16)

    ref_states, ref_losses = dbn_train.idbn_epoch(
        states, KEY, jnp.asarray(data), 0.1, 0.5, 1e-4, 0.1, **kwargs)

    mesh = make_mesh()
    dp_states, dp_losses = dp_idbn_epoch(
        mesh, states, KEY, data, 0.1, 0.5, 1e-4, 0.1, **kwargs)

    np.testing.assert_allclose(np.asarray(ref_losses),
                               np.asarray(dp_losses), rtol=1e-6)
    for rs, ds in zip(ref_states, dp_states):
        np.testing.assert_allclose(np.asarray(rs.w), np.asarray(ds.w),
                                   atol=1e-6)


def test_shard_batch_and_pad():
    mesh = make_mesh()
    x = np.ones((13, 5), np.float32)
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 5) and n == 13
    arr = shard_batch(mesh, padded)
    assert arr.shape == (16, 5)
    # actually distributed across devices
    assert len(arr.sharding.device_set) == 8


def test_dp_joint_epoch_runs_sharded():
    """Full joint epoch (warmup + main) under the mesh via jit sharding."""
    from multimodal_idbn_tpu.ops import imdbn_ops
    from multimodal_idbn_tpu.parallel.data_parallel import (
        batch_sharding, replicate)

    mesh = make_mesh()
    Dz, K, Hj, N = 16, 4, 12, 32
    rng = np.random.RandomState(0)
    Z = jnp.asarray(rng.rand(N, Dz).astype(np.float32))
    Y = jnp.asarray(np.eye(K, dtype=np.float32)[rng.randint(0, K, N)])
    IMG = jnp.asarray((rng.rand(N, 36) > 0.5).astype(np.float32))
    joint = rbm_ops.init_rbm_state(jax.random.key(5), Dz + K, Hj)
    idbn_states = (rbm_ops.init_rbm_state(jax.random.key(6), 36, Dz),)
    zcm = jnp.asarray(rng.rand(K, Dz).astype(np.float32))

    sh = batch_sharding(mesh)
    Z, Y, IMG = (jax.device_put(a, sh) for a in (Z, Y, IMG))
    joint = replicate(mesh, joint)
    idbn_states = replicate(mesh, idbn_states)

    ref = imdbn_ops.joint_epoch(
        joint, idbn_states, KEY, Z, Y, IMG, 0.04, 0.5, 1e-4, zcm,
        warmup=False, joint_cd=1, aux_cond_steps=3, Dz=Dz, steps=3,
        groups=((Dz, Dz + K),), batch_size=8)
    joint2, cd, totals = ref
    assert np.isfinite(float(cd))
    assert float(totals.n) == N


def test_dp_joint_epoch_wrapper_matches_single_device():
    """dp_joint_epoch (sharded) agrees with the plain joint_epoch."""
    from multimodal_idbn_tpu.ops import imdbn_ops
    from multimodal_idbn_tpu.parallel import dp_joint_epoch

    Dz, K, Hj, N = 16, 4, 12, 32
    rng = np.random.RandomState(3)
    Z = rng.rand(N, Dz).astype(np.float32)
    Y = np.eye(K, dtype=np.float32)[rng.randint(0, K, N)]
    IMG = (rng.rand(N, 36) > 0.5).astype(np.float32)
    joint = rbm_ops.init_rbm_state(jax.random.key(5), Dz + K, Hj)
    idbn_states = (rbm_ops.init_rbm_state(jax.random.key(6), 36, Dz),)
    zcm = rng.rand(K, Dz).astype(np.float32)
    static = dict(warmup=False, joint_cd=1, aux_cond_steps=3, Dz=Dz,
                  steps=3, groups=((Dz, Dz + K),), batch_size=8)

    ref_joint, ref_cd, ref_tot = imdbn_ops.joint_epoch(
        joint, idbn_states, KEY, jnp.asarray(Z), jnp.asarray(Y),
        jnp.asarray(IMG), 0.04, 0.5, 1e-4, jnp.asarray(zcm), **static)

    mesh = make_mesh()
    dp_joint, dp_cd, dp_tot = dp_joint_epoch(
        mesh, joint, idbn_states, KEY, Z, Y, IMG, 0.04, 0.5, 1e-4, zcm,
        **static)

    np.testing.assert_allclose(np.asarray(ref_joint.w),
                               np.asarray(dp_joint.w), atol=2e-6)
    np.testing.assert_allclose(float(ref_cd), float(dp_cd), rtol=1e-4)
    assert float(dp_tot.n) == N
    # argmax ties can flip on ~1-ulp reduction-order differences
    np.testing.assert_allclose(float(ref_tot.top1),
                               float(dp_tot.top1), atol=1.0)


def test_shard_batch_divisibility_handling():
    """Non-divisible batch axes: clear error by default, trim on request
    (regression for the dp_* ValueError on N % n_devices != 0)."""
    mesh = make_mesh()
    x = np.ones((34, 4), np.float32)
    with pytest.raises(ValueError, match="divide evenly"):
        shard_batch(mesh, x)
    arr = shard_batch(mesh, x, trim=True)
    assert arr.shape == (32, 4)


def test_dp_joint_epoch_non_divisible_n():
    """dp_joint_epoch must accept N not divisible by the device count."""
    from multimodal_idbn_tpu.parallel import dp_joint_epoch

    Dz, K, Hj, N = 16, 4, 12, 34  # 34 % 8 != 0
    rng = np.random.RandomState(4)
    Z = rng.rand(N, Dz).astype(np.float32)
    Y = np.eye(K, dtype=np.float32)[rng.randint(0, K, N)]
    IMG = (rng.rand(N, 36) > 0.5).astype(np.float32)
    joint = rbm_ops.init_rbm_state(jax.random.key(5), Dz + K, Hj)
    idbn_states = (rbm_ops.init_rbm_state(jax.random.key(6), 36, Dz),)
    zcm = rng.rand(K, Dz).astype(np.float32)
    mesh = make_mesh()
    j2, cd, tot = dp_joint_epoch(
        mesh, joint, idbn_states, KEY, Z, Y, IMG, 0.04, 0.5, 1e-4, zcm,
        warmup=False, joint_cd=1, aux_cond_steps=3, Dz=Dz, steps=2,
        groups=((Dz, Dz + K),), batch_size=8)
    assert np.isfinite(float(cd))
    assert float(tot.n) == 32  # trimmed to the divisible length


def test_initialize_distributed_single_process(monkeypatch):
    """Single-process: initialize_distributed degrades gracefully and the
    local-batch helper covers the full batch."""
    from multimodal_idbn_tpu.parallel import (initialize_distributed,
                                              is_multi_process,
                                              local_batch_slice)
    # auto-detect off-pod -> graceful False (never pass explicit
    # coordinator args single-process: the join protocol blocks and
    # jax's distributed service aborts the process on deadline)
    assert initialize_distributed() is False
    assert jax.device_count() >= 1
    assert not is_multi_process()
    assert local_batch_slice(8) == slice(0, 8)
    # simulate a 4-process slice: rows split evenly, non-divisible raises
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert local_batch_slice(8) == slice(4, 6)
    with pytest.raises(ValueError):
        local_batch_slice(7)
