"""Shell-level data parallelism: ``params["DP_DEVICES"]`` / ``set_mesh``
route iDBN/iMDBN training through the DP epochs (tests run on the virtual
8-device CPU mesh; ops-level 1-vs-N invariance is tests/test_parallel.py).

Framework extension — the reference is single-device (SURVEY.md §2 row
20), so there is no reference counterpart to cite beyond the absence.
"""

import jax
import numpy as np
import pytest

from multimodal_idbn_tpu.models import iDBN, iMDBN


@pytest.fixture(scope="module", autouse=True)
def _free_compiled_programs():
    """This module compiles several large mesh-sharded nested-scan
    programs (blocked DP for all three model families). Freeing them at
    module teardown keeps the CPU client's live-executable footprint
    bounded — without it, a later unrelated compile in the full-suite
    process segfaults inside XLA (reproducible: full suite crashed in
    test_utils_diagnostics::test_cross_panel until this was added; the
    same tests all pass in isolation)."""
    yield
    jax.clear_caches()

PARAMS = {"LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
          "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
          "LEARNING_RATE_DYNAMIC": True, "CD": 2, "SEED": 0,
          "JOINT_LEARNING_RATE": 0.05, "JOINT_CD": 1,
          "CROSS_GIBBS_STEPS": 5, "USE_AUX": True,
          "JOINT_AUX_COND_STEPS": 3}


class Loader:
    """Minimal materializable multimodal loader (images, one-hot)."""

    def __init__(self, n=96, d=64, k=4, batch_size=32, seed=0):
        rng = np.random.RandomState(seed)
        self.imgs = (rng.rand(n, d) > 0.8).astype(np.float32)
        self.labels = np.eye(k, dtype=np.float32)[rng.randint(0, k, n)]
        self.batch_size = batch_size

    def materialize(self):
        return self.imgs, self.labels

    def __iter__(self):
        for i in range(0, len(self.imgs), self.batch_size):
            yield (self.imgs[i:i + self.batch_size],
                   self.labels[i:i + self.batch_size])


def _idbn(params=PARAMS, **kw):
    return iDBN([64, 24, 12], params=dict(params), dataloader=Loader(),
                val_loader=None, seed=0, **kw)


def test_idbn_dp_matches_single_device():
    ref = _idbn()
    ref.train(epochs=3, log_every_pca=10**9, log_every_probe=10**9)

    dp = _idbn(params={**PARAMS, "DP_DEVICES": 8})
    dp.train(epochs=3, log_every_pca=10**9, log_every_probe=10**9)
    assert dp.mesh is not None and dp.mesh.devices.size == 8

    # identical RNG draws (counter-based threefry); only the reduction
    # order differs, so agreement is to ~1 ulp accumulated over updates
    for r, d in zip(ref.layers, dp.layers):
        np.testing.assert_allclose(np.asarray(r.state.w),
                                   np.asarray(d.state.w), atol=1e-5)
    np.testing.assert_allclose(ref.loss_history, dp.loss_history,
                               rtol=1e-4)


class _Run:
    """Minimal wandb-like sink (diagnostics accept any .log(dict))."""

    def log(self, *a, **k):
        pass


def test_idbn_dp_per_epoch_path_matches_blocked_dp():
    """With a run object the per-epoch dp_idbn_epoch routes; without one
    the blocked dp_idbn_epoch_block routes — both must agree (same key
    derivation contract as the single-device paths)."""
    blocked = _idbn(params={**PARAMS, "DP_DEVICES": 8})
    blocked.train(epochs=3, log_every_pca=10**9, log_every_probe=10**9)

    per_epoch = iDBN([64, 24, 12], params={**PARAMS, "DP_DEVICES": 8},
                     dataloader=Loader(), val_loader=None, seed=0,
                     wandb_run=_Run())
    per_epoch.train(epochs=3, log_every_pca=10**9, log_every_probe=10**9)

    for b, p in zip(blocked.layers, per_epoch.layers):
        np.testing.assert_allclose(np.asarray(b.state.w),
                                   np.asarray(p.state.w), atol=1e-5)


def test_idbn_set_mesh_accepts_counts_and_mesh():
    from multimodal_idbn_tpu.parallel import make_mesh
    m = _idbn()
    m.set_mesh(4)
    assert m.mesh.devices.size == 4
    m.set_mesh("all")
    assert m.mesh.devices.size == len(jax.devices())
    m.set_mesh(make_mesh(2))
    assert m.mesh.devices.size == 2
    m.set_mesh(None)
    assert m.mesh is None


def test_set_mesh_none_overrides_dp_devices():
    """An explicit set_mesh(None) must disable DP even when
    params["DP_DEVICES"] is set (it previously re-enabled from params)."""
    m = _idbn(params={**PARAMS, "DP_DEVICES": 8})
    m.set_mesh(None)
    assert m._resolve_mesh() is None
    m.train(epochs=1, log_every_pca=10**9, log_every_probe=10**9)
    assert m.mesh is None


def test_shard_or_replicate_preserves_n_and_values():
    """DP placement must never trim: a dataset length that does not
    divide the mesh comes back value-identical (replicated — XLA
    normalizes uneven shardings to replicated, so sharded placement is
    impossible there); a divisible length comes back sharded."""
    from multimodal_idbn_tpu.parallel import make_mesh
    from multimodal_idbn_tpu.parallel.data_parallel import (
        _shard_or_replicate)

    mesh = make_mesh()
    x = np.arange(13 * 5, dtype=np.float32).reshape(13, 5)
    y = _shard_or_replicate(mesh, x)
    assert y.shape == (13, 5)
    np.testing.assert_array_equal(np.asarray(y), x)

    x16 = np.arange(16 * 5, dtype=np.float32).reshape(16, 5)
    y16 = _shard_or_replicate(mesh, x16)
    assert not y16.sharding.is_fully_replicated
    assert len(y16.sharding.device_set) == 8


def test_dp_rejects_pcd_and_mixed_precision():
    m = _idbn(params={**PARAMS, "DP_DEVICES": 8, "PCD": True})
    with pytest.raises(ValueError, match="PCD"):
        m.train(epochs=1, log_every_pca=10**9, log_every_probe=10**9)
    m2 = _idbn(params={**PARAMS, "DP_DEVICES": 8,
                       "COMPUTE_DTYPE": "bfloat16"})
    with pytest.raises(ValueError, match="COMPUTE_DTYPE"):
        m2.train(epochs=1, log_every_pca=10**9, log_every_probe=10**9)


def test_dp_rejects_unfused_path():
    m = _idbn(params={**PARAMS, "DP_DEVICES": 8})
    with pytest.raises(ValueError, match="fused"):
        m.train(epochs=1, fused=False, log_every_pca=10**9,
                log_every_probe=10**9)


def _imdbn(params):
    loader = Loader()
    return iMDBN(layer_sizes_img=[64, 24, 12], joint_layer_size=16,
                 params=dict(params), dataloader=loader,
                 val_loader=loader, num_labels=4, seed=0)


def _bimodal(params):
    from multimodal_idbn_tpu.data import create_dataloaders_uniform
    from multimodal_idbn_tpu.models import iMDBN_BiModal

    train, val, _ = create_dataloaders_uniform(
        batch_size=16, n_samples=80, num_classes=4, side=8, seed=0,
        second_modality="mnist100")
    m = iMDBN_BiModal([64, 16], [28 * 56, 16], [12, 8],
                      params=dict(params), dataloader=train,
                      val_loader=val, seed=0)
    return m


def test_bimodal_dp_joint_matches_single_device():
    p = {**PARAMS, "CROSS_GIBBS_STEPS": 4}
    ref = _bimodal(p)
    ref.train_joint(epochs=2)

    dp = _bimodal({**p, "DP_DEVICES": 8})
    dp.train_joint(epochs=2)
    assert dp.mesh is not None
    assert dp.mod1_dbn.mesh is not None  # propagated to the modality DBNs

    for r, d in zip(ref.joint_layers, dp.joint_layers):
        np.testing.assert_allclose(np.asarray(r.state.w),
                                   np.asarray(d.state.w), atol=1e-5)


def test_imdbn_dp_joint_matches_single_device():
    ref = _imdbn(PARAMS)
    ref.image_idbn.train(epochs=2, log_every_pca=10**9,
                         log_every_probe=10**9)
    ref.train_joint(epochs=2)

    dp = _imdbn({**PARAMS, "DP_DEVICES": 8})
    dp.image_idbn.train(epochs=2, log_every_pca=10**9,
                        log_every_probe=10**9)
    dp.train_joint(epochs=2)
    assert dp.mesh is not None and dp.image_idbn.mesh is not None

    np.testing.assert_allclose(np.asarray(ref.joint_rbm.state.w),
                               np.asarray(dp.joint_rbm.state.w),
                               atol=1e-5)
    for k, v in ref.last_metrics.items():
        np.testing.assert_allclose(v, dp.last_metrics[k], rtol=1e-3,
                                   atol=1e-5, err_msg=k)


def test_dp_trained_model_checkpoints(tmp_path):
    """States coming out of DP training are committed replicated jax
    arrays — the checkpoint layer must serialize them and a fresh
    single-device model must load them bit-exactly."""
    from multimodal_idbn_tpu import checkpoint

    dp = _idbn(params={**PARAMS, "DP_DEVICES": 8})
    dp.train(epochs=2, log_every_pca=10**9, log_every_probe=10**9)
    assert len(dp.layers[0].state.w.sharding.device_set) == 8
    path = tmp_path / "dp_model.npz"
    checkpoint.save_checkpoint(dp, str(path))

    fresh = _idbn()
    checkpoint.load_checkpoint(fresh, str(path))
    for a, b in zip(dp.layers, fresh.layers):
        np.testing.assert_array_equal(np.asarray(a.state.w),
                                      np.asarray(b.state.w))
        np.testing.assert_array_equal(np.asarray(a.state.w_m),
                                      np.asarray(b.state.w_m))


def test_imdbn_dp_per_epoch_joint_matches_blocked_dp():
    """With a run object the per-epoch dp_joint_epoch branch routes;
    without one the blocked dp_joint_epoch_block routes — both must
    agree (same key-derivation contract)."""
    blocked = _imdbn({**PARAMS, "DP_DEVICES": 8})
    blocked.image_idbn.train(epochs=1, log_every_pca=10**9,
                             log_every_probe=10**9)
    blocked.train_joint(epochs=2)

    per = iMDBN(layer_sizes_img=[64, 24, 12], joint_layer_size=16,
                params={**PARAMS, "DP_DEVICES": 8}, dataloader=Loader(),
                val_loader=Loader(), num_labels=4, seed=0,
                wandb_run=_Run())
    per.image_idbn.train(epochs=1, log_every_pca=10**9,
                         log_every_probe=10**9)
    per.train_joint(epochs=2, log_every=10**9, log_every_pca=10**9,
                    log_every_probe=10**9)

    np.testing.assert_allclose(np.asarray(blocked.joint_rbm.state.w),
                               np.asarray(per.joint_rbm.state.w),
                               atol=1e-5)
