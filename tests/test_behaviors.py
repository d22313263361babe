"""Behavioral tests for schedule/config paths not covered elsewhere:
warmup boundary, dynamic lr, metrics thinning, config-gated diagnostics."""

import numpy as np
import pytest

from multimodal_idbn_tpu.data import create_dataloaders_uniform
from multimodal_idbn_tpu.models import iMDBN
from multimodal_idbn_tpu.ops import schedules


class FakeWandbRun:
    def __init__(self):
        self.logged = []

    def log(self, d):
        self.logged.append(d)

    def keys(self):
        return {k for d in self.logged for k in d}


PARAMS = {
    "LEARNING_RATE": 0.1,
    "WEIGHT_PENALTY": 1e-4,
    "INIT_MOMENTUM": 0.5,
    "FINAL_MOMENTUM": 0.9,
    "LEARNING_RATE_DYNAMIC": True,
    "CD": 1,
    "JOINT_CD": 1,
    "JOINT_LEARNING_RATE": 0.04,
    "CROSS_GIBBS_STEPS": 3,
    "JOINT_AUX_COND_STEPS": 3,
}


# ------------------------- schedules -------------------------

def test_lin_schedule_matches_reference_formula():
    # reference rbm.py:229-234
    for t, t_max, start, end in [(0, 10, 3.0, 1.0), (9, 10, 3.0, 1.0),
                                 (5, 10, 2.5, 0.5), (0, 1, 3.0, 1.0)]:
        got = float(schedules.lin_schedule(t, t_max, start, end))
        if t_max <= 1:
            want = end
        else:
            alpha = min(max(t / (t_max - 1), 0.0), 1.0)
            want = start + (end - start) * alpha
        assert abs(got - want) < 1e-6


def test_annealed_temperature_sharpen_tail():
    # last max(1, sharpen_last) steps pinned to T_cold_plus (rbm.py:338-340)
    T = np.asarray(schedules.annealed_temperature(10, 3.0, 1.0, 3, 0.9))
    assert np.allclose(T[-3:], 0.9)
    assert T[0] == 3.0
    T0 = np.asarray(schedules.annealed_temperature(10, 3.0, 1.0, 0, 0.9))
    assert np.allclose(T0[-1:], 0.9)  # max(1, 0) = 1
    assert T0[-2] > 0.9


def test_gibbs_annealed_temperature_min_clamp():
    # last 3 steps min(0.9, T) (rbm.py:276-279)
    T = np.asarray(schedules.gibbs_annealed_temperature(10, 2.5, 1.0))
    assert (T[-3:] <= 0.9 + 1e-6).all()
    assert T[0] == 2.5


def test_noise_sigma_decay():
    s = np.asarray(schedules.noise_sigma(5, 0.9))
    assert abs(s[0] - 0.9) < 1e-6
    assert abs(s[-1]) < 1e-6
    assert (np.diff(s) < 0).all()


def test_hot_steps_rounding():
    # rbm.py:236-238: round(hot_frac * n)
    assert schedules.hot_steps(10, 0.7) == 7
    assert schedules.hot_steps(10, 0.0) == 0
    assert schedules.hot_steps(10, 1.5) == 10
    assert schedules.hot_steps(3, 0.5) == 2  # round(1.5) -> 2 (banker's: 2)


def test_effective_lr_momentum():
    assert schedules.effective_lr(0.1, 0, True) == 0.1
    assert abs(schedules.effective_lr(0.1, 10, True) - 0.1 / 1.1) < 1e-9
    assert schedules.effective_lr(0.1, 10, False) == 0.1
    assert schedules.effective_momentum(0.5, 0.9, 5) == 0.5  # epoch<=5
    assert schedules.effective_momentum(0.5, 0.9, 6) == 0.9


# ------------------------- training behaviors -------------------------

@pytest.fixture(scope="module")
def loaders():
    return create_dataloaders_uniform(batch_size=16, n_samples=64,
                                      num_classes=4, side=12, seed=0)


def test_warmup_boundary_no_cd_loss(loaders):
    """Warmup epochs produce no joint/cd_loss; main epochs do
    (reference imdbn.py:566-582)."""
    train, val, _ = loaders
    m = iMDBN([144, 16], 12, params=PARAMS, dataloader=train,
              val_loader=val, num_labels=4, seed=0, wandb_run=FakeWandbRun())
    m.image_idbn.train(epochs=1, log_every_pca=10**9, log_every_probe=10**9)
    m.train_joint(epochs=9, log_every=10**9, log_every_pca=10**9,
                  log_every_probe=10**9)  # 8 warmup + 1 main
    cd_epochs = [d for d in m.wandb_run.logged if "joint/cd_loss" in d]
    assert len(cd_epochs) == 1  # only the single main epoch


def test_metrics_thinning(loaders):
    """CROSS_METRICS_EVERY thins the per-batch cross metrics without
    changing training."""
    train, val, _ = loaders
    params = dict(PARAMS, CROSS_METRICS_EVERY=2)
    m = iMDBN([144, 16], 12, params=params, dataloader=train,
              val_loader=val, num_labels=4, seed=0)
    m.image_idbn.train(epochs=1, log_every_pca=10**9, log_every_probe=10**9)
    m.train_joint(epochs=9, log_every=10**9, log_every_pca=10**9,
                  log_every_probe=10**9)
    # 4 batches/epoch, metrics every 2nd batch -> n = half the dataset
    n_total = len(train.dataset)
    assert m.last_metrics is not None
    # reconstruct the counted n from the mean: totals n should be ~half
    # (exposed via last_metrics normalization, so just check it's sane)
    assert 0.0 <= m.last_metrics["cross_modality/text_top1"] <= 1.0


def test_config_gated_diagnostics(loaders):
    """logging_cfg gates trigger energy/convergence/neighbors extras
    (monolith parity, gdbn_model_complete.py:1091-1147)."""
    train, val, _ = loaders
    logging_cfg = {
        "log_every_energy": 1,
        "log_every_convergence": 1,
        "log_every_neighbors": 1,
        "log_every_trajectory": 1,
        "energy": {"enable": True},
        "convergence": {"enable": True, "num_steps": 3,
                        "z_mismatch_check": True},
        "neighbors": {"enable": True, "k": 2},
        "trajectory": {"enable": True, "num_samples": 1, "plot_3d": True},
    }
    m = iMDBN([144, 16], 12, params=PARAMS, dataloader=train,
              val_loader=val, num_labels=4, seed=0,
              wandb_run=FakeWandbRun(), logging_cfg=logging_cfg)
    m.image_idbn.train(epochs=1, log_every_pca=10**9, log_every_probe=10**9)
    m.train_joint(epochs=1, log_every=10**9, log_every_pca=10**9,
                  log_every_probe=10**9)
    keys = m.wandb_run.keys()
    warn_keys = sorted(k for k in keys if k.startswith("warn/"))
    assert not warn_keys, f"gated diagnostics warned: {warn_keys}"
    assert "case/fixed/summary" in keys                       # energy
    assert "conv/panel/panel/summary" in keys                 # convergence
    assert "zcheck/z_check/cosine_mean" in keys               # z mismatch
    assert "vecdb/knn_zT" in keys                             # neighbors
    assert "auto_recon/text_top1" in keys                     # trajectory
    assert any(k.startswith("pca_traj_with_recon") for k in keys)


def test_dynamic_lr_changes_updates(loaders):
    """dynamic_lr=True shrinks updates at later epochs (rbm.py:194)."""
    from multimodal_idbn_tpu.models import RBM

    x = (np.random.RandomState(0).rand(16, 30) > 0.5).astype(np.float32)
    r1 = RBM(30, 10, 0.1, 0.0, 0.0, dynamic_lr=True, seed=0)
    r2 = RBM(30, 10, 0.1, 0.0, 0.0, dynamic_lr=True, seed=0)
    w0 = np.asarray(r1.W).copy()
    r1.train_epoch(x, epoch=0, max_epochs=100, CD=1)
    r2.train_epoch(x, epoch=99, max_epochs=100, CD=1)
    d1 = np.abs(np.asarray(r1.W) - w0).sum()
    d2 = np.abs(np.asarray(r2.W) - w0).sum()
    # epoch-99 update uses lr/(1+0.99): smaller step (same RNG stream seed)
    assert d2 < d1


def test_dataset_smaller_than_batch():
    """Regression: nb=0 fused epochs must not crash (found driving the
    quality benchmark with --n-samples below the batch size)."""
    train, val, _ = create_dataloaders_uniform(batch_size=128, n_samples=40,
                                               num_classes=3, side=10,
                                               seed=0)
    m = iMDBN([100, 12], 8, params=PARAMS, dataloader=train,
              val_loader=val, num_labels=3, seed=0)
    m.image_idbn.train(epochs=2)
    assert len(m.image_idbn.loss_history) == 2
    m.train_joint(epochs=1, log_every=10**9, log_every_pca=10**9,
                  log_every_probe=10**9)
    assert m.last_metrics is not None


def test_fused_epoch_trains_each_sample_exactly_once(monkeypatch):
    """Regression (code-review finding): the fused path must present every
    sample exactly once per epoch — shuffle happens outside the fused
    epoch so the remainder batch is the unselected tail."""
    from multimodal_idbn_tpu.ops import imdbn_ops

    train, val, _ = create_dataloaders_uniform(batch_size=16, n_samples=56,
                                               num_classes=3, side=10,
                                               seed=0)
    # train split of 56 -> 40 samples; 2 full batches of 16 + 8 remainder
    m = iMDBN([100, 12], 8, params=PARAMS, dataloader=train,
              val_loader=val, num_labels=3, seed=0)
    # a run object forces the per-epoch path (the blocked path is pinned
    # equal to it by test_blocked_joint_equals_per_epoch)
    m.wandb_run = FakeWandbRun()
    m.image_idbn.train(epochs=1, log_every_pca=10**9, log_every_probe=10**9)

    seen = {}
    orig_epoch = imdbn_ops.joint_epoch
    orig_step = imdbn_ops.joint_train_batch_step

    def spy_epoch(joint, idbn_states, key, Z, Y, X, *a, **kw):
        nb = Z.shape[0] // kw["batch_size"]
        seen["main"] = np.asarray(Z)[:nb * kw["batch_size"]]
        return orig_epoch(joint, idbn_states, key, Z, Y, X, *a, **kw)

    def spy_step(joint, idbn_states, key, zb, *a, **kw):
        seen["rem"] = np.asarray(zb)
        return orig_step(joint, idbn_states, key, zb, *a, **kw)

    monkeypatch.setattr(imdbn_ops, "joint_epoch", spy_epoch)
    monkeypatch.setattr(imdbn_ops, "joint_train_batch_step", spy_step)
    m.train_joint(epochs=1, log_every=10**9, log_every_pca=10**9,
                  log_every_probe=10**9)

    Z_all = np.asarray(m.image_idbn.represent(
        train.materialize()[0].reshape(-1, 100)))
    trained = np.concatenate([seen["main"], seen["rem"]], axis=0)
    assert trained.shape == Z_all.shape
    # multiset equality by sorted row signatures: exactly-once coverage
    sig = lambda A: np.sort(A @ np.arange(1, A.shape[1] + 1))
    np.testing.assert_allclose(sig(trained), sig(Z_all), rtol=1e-5)


def test_blocked_idbn_equals_per_epoch():
    """Epoch-blocked training (no run object -> one dispatch) must be
    bitwise-identical to the per-epoch fused path (same key derivation)."""
    from multimodal_idbn_tpu.models import iDBN

    train, val, _ = create_dataloaders_uniform(batch_size=16, n_samples=56,
                                               num_classes=3, side=10,
                                               seed=0)
    a = iDBN([100, 16, 8], PARAMS, train, val, seed=0)
    a.train(epochs=5)  # wandb_run=None -> blocked
    b = iDBN([100, 16, 8], PARAMS, train, val, seed=0, wandb_run=None)
    # force the per-epoch path by giving a run object that logs nowhere
    b.wandb_run = FakeWandbRun()
    b.train(epochs=5, log_every_pca=10**9, log_every_probe=10**9)
    for ra, rb in zip(a.layers, b.layers):
        np.testing.assert_array_equal(np.asarray(ra.W), np.asarray(rb.W))
        np.testing.assert_array_equal(np.asarray(ra.vis_bias),
                                      np.asarray(rb.vis_bias))
    np.testing.assert_allclose(a.loss_history, b.loss_history, rtol=1e-6)


def test_blocked_joint_equals_per_epoch():
    from multimodal_idbn_tpu.models import iMDBN as _iMDBN

    train, val, _ = create_dataloaders_uniform(batch_size=16, n_samples=56,
                                               num_classes=3, side=10,
                                               seed=0)

    def build():
        m = _iMDBN([100, 12], 8, params=PARAMS, dataloader=train,
                   val_loader=val, num_labels=3, seed=0)
        m.image_idbn.train(epochs=1)
        return m

    a = build()
    a.train_joint(epochs=10)  # blocked (8 warmup + 2 main, 2 dispatches)
    b = build()
    b.wandb_run = FakeWandbRun()  # forces the per-epoch path
    b.train_joint(epochs=10, log_every=10**9, log_every_pca=10**9,
                  log_every_probe=10**9)
    np.testing.assert_array_equal(np.asarray(a.joint_rbm.W),
                                  np.asarray(b.joint_rbm.W))
    np.testing.assert_array_equal(np.asarray(a.joint_rbm.vis_bias),
                                  np.asarray(b.joint_rbm.vis_bias))
    for k in a.last_metrics:
        np.testing.assert_allclose(a.last_metrics[k], b.last_metrics[k],
                                   rtol=1e-6)
    # the blocked path keeps per-epoch metric curves; the last entry must
    # equal the final-epoch metrics, and one entry exists per epoch
    hist = a.joint_metrics_history
    assert [h["epoch"] for h in hist] == list(range(10))
    for k, v in a.last_metrics.items():
        np.testing.assert_allclose(hist[-1][k], v, rtol=1e-6)


def test_blocked_bimodal_equals_per_epoch():
    from multimodal_idbn_tpu.models import iMDBN_BiModal

    train, val, _ = create_dataloaders_uniform(
        batch_size=16, n_samples=56, num_classes=3, side=10, seed=0,
        second_modality="mnist100")

    def build():
        m = iMDBN_BiModal([100, 12], [1568, 16], [8], params=PARAMS,
                          dataloader=train, val_loader=val, seed=0)
        return m

    a = build()
    a.train_joint(epochs=10)  # blocked (8 warmup + 2 main)
    b = build()
    b.wandb_run = FakeWandbRun()  # per-epoch path
    b.train_joint(epochs=10, log_every=10**9, log_every_pca=10**9,
                  log_every_probe=10**9, log_every_trajectory=10**9)
    # identical RNG; XLA fuses the larger blocked program slightly
    # differently, so agreement is to ~1 ulp
    np.testing.assert_allclose(np.asarray(a.joint_rbm.W),
                               np.asarray(b.joint_rbm.W), atol=1e-5)
    for k in a.last_metrics:
        np.testing.assert_allclose(a.last_metrics[k], b.last_metrics[k],
                                   rtol=1e-4)
