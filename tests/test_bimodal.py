"""iMDBN_BiModal tests: construction, joint training, cross-reconstruction,
probes/trajectories, save/load with back-compat."""

import numpy as np
import pytest

from multimodal_idbn_tpu.data import create_dataloaders_uniform
from multimodal_idbn_tpu.models import iMDBN_BiModal
from multimodal_idbn_tpu.models.imdbn_bimodal import (
    compute_bimodal_joint_embeddings_and_features,
    log_bimodal_joint_linear_probe,
    log_bimodal_latent_trajectory,
    log_bimodal_latent_trajectory_3d,
)

PARAMS = {
    "LEARNING_RATE": 0.1,
    "WEIGHT_PENALTY": 1e-4,
    "INIT_MOMENTUM": 0.5,
    "FINAL_MOMENTUM": 0.9,
    "LEARNING_RATE_DYNAMIC": True,
    "CD": 1,
    "JOINT_CD": 1,
    "JOINT_LEARNING_RATE": 0.04,
    "CROSS_GIBBS_STEPS": 4,
    "JOINT_AUX_COND_STEPS": 3,
}
SIDE = 12
D2 = 28 * 56


class FakeWandbRun:
    def __init__(self):
        self.logged = []

    def log(self, d):
        self.logged.append(d)

    def keys(self):
        return {k for d in self.logged for k in d}


@pytest.fixture(scope="module")
def loaders():
    return create_dataloaders_uniform(batch_size=16, n_samples=80,
                                      num_classes=4, side=SIDE, seed=0,
                                      second_modality="mnist100")


@pytest.fixture(scope="module")
def model(loaders):
    train, val, _ = loaders
    m = iMDBN_BiModal([SIDE * SIDE, 24], [D2, 32], [16, 8], params=PARAMS,
                      dataloader=train, val_loader=val, seed=0)
    # pretrain each modality on its own data via modality loaders
    from multimodal_idbn_tpu.data.loaders import DataLoader, NumerosityDataset
    base = train.dataset.dataset
    idx = np.asarray(train.dataset.indices)
    ds1 = NumerosityDataset(base.images[idx], np.asarray(base.labels)[idx],
                            base.onehot[idx], np.asarray(base.cumArea_list)[idx],
                            np.asarray(base.CH_list)[idx])
    m.mod1_dbn.dataloader = DataLoader(ds1, batch_size=16, shuffle=True)
    ds2 = NumerosityDataset(base.mod2_images[idx],
                            np.asarray(base.labels)[idx], base.onehot[idx],
                            np.asarray(base.cumArea_list)[idx],
                            np.asarray(base.CH_list)[idx])
    m.mod2_dbn.dataloader = DataLoader(ds2, batch_size=16, shuffle=True)
    m.mod1_dbn.train(epochs=2)
    m.mod2_dbn.train(epochs=2)
    return m


def test_construction(model):
    assert model.Dz_mod1 == 24
    assert model.Dz_mod2 == 32
    assert model.num_joint_layers == 2
    assert model.joint_layers[0].num_visible == 24 + 32
    assert model.joint_layers[0].num_hidden == 16
    assert model.joint_layers[1].num_visible == 16
    assert model.joint_layers[1].num_hidden == 8
    # joint_rbm aliases layer 0 (reference imdbn_bimodal.py:574)
    assert model.joint_rbm is model.joint_layers[0]
    assert model.joint_rbm.softmax_groups == []
    assert model.arch_str.startswith("MOD1144-24_MOD21568-32_JOINT16-8")
    assert model.features is not None


def test_int_joint_layer_sizes(loaders):
    train, val, _ = loaders
    m = iMDBN_BiModal([SIDE * SIDE, 16], [D2, 16], 12, params=PARAMS,
                      dataloader=train, val_loader=val, seed=0)
    assert m.num_joint_layers == 1
    assert m.joint_layers[0].num_hidden == 12


def test_init_joint_bias(model):
    model.init_joint_bias_from_data(n_batches=2)
    vb = np.asarray(model.joint_layers[0].vis_bias)
    assert np.isfinite(vb).all()
    assert vb.shape == (24 + 32,)


def test_represent(model, loaders):
    _, val, _ = loaders
    batch = next(iter(val))
    h = np.asarray(model.represent(batch))
    assert h.shape == (len(batch[0]), 8)  # through ALL joint layers


def test_cross_reconstruct(model, loaders):
    _, val, _ = loaders
    m1, m2 = next(iter(val))
    z1 = model.mod1_dbn.represent(m1)
    z2 = model.mod2_dbn.represent(m2)
    rec1, rec2 = model._cross_reconstruct(z1, z2, steps=3)
    assert np.asarray(rec1).shape == (len(m1), SIDE * SIDE)
    assert np.asarray(rec2).shape == (len(m1), D2)
    assert np.isfinite(np.asarray(rec1)).all()


def test_train_joint_fused(loaders):
    train, val, _ = loaders
    m = iMDBN_BiModal([SIDE * SIDE, 16], [D2, 16], [12], params=PARAMS,
                      dataloader=train, val_loader=val, seed=0)
    m.train_joint(epochs=10, log_every=100, log_every_pca=100,
                  log_every_probe=100, log_every_trajectory=100)
    assert m.last_metrics is not None
    assert m.last_metrics["cross_modality/mod1_mse"] < 1.0
    assert m.last_metrics["cross_modality/mod2_mse"] < 1.0


def test_train_joint_batched_path(loaders):
    train, val, _ = loaders
    m = iMDBN_BiModal([SIDE * SIDE, 12], [D2, 12], [8], params=PARAMS,
                      dataloader=train, val_loader=val, seed=0)
    m.train_joint(epochs=1, fused=False, log_every=100, log_every_pca=100,
                  log_every_probe=100)
    assert m.last_metrics is not None


def test_bimodal_probe_and_trajectories(model):
    model.wandb_run = FakeWandbRun()
    res = log_bimodal_joint_linear_probe(model, epoch=0, n_bins=3, steps=40)
    assert "joint/labels" in res
    assert "probe/joint/labels/acc" in model.wandb_run.keys()
    E, feats = compute_bimodal_joint_embeddings_and_features(model)
    assert E.shape[1] == 8
    log_bimodal_latent_trajectory(model, sample_idx=0, steps=3)
    log_bimodal_latent_trajectory_3d(model, sample_idx=0, steps=3)
    keys = model.wandb_run.keys()
    assert "trajectory/mod2_to_mod1" in keys
    assert "trajectory/mod2_to_mod1_3d" in keys
    model.wandb_run = None


def test_snapshots(model):
    model.wandb_run = FakeWandbRun()
    model._log_snapshots(epoch=0, num=4)
    keys = model.wandb_run.keys()
    assert "snap/mod1_from_mod2" in keys
    assert "snap/mod2_from_mod1" in keys
    assert "snap/mod1_mse" in keys
    model.wandb_run = None


def test_save_load_roundtrip(tmp_path, model):
    p = tmp_path / "bimodal.pkl"
    model.save_model(str(p))
    payload = iMDBN_BiModal.load_model(str(p))
    for key in ("mod1_dbn", "mod2_dbn", "joint_layers", "num_joint_layers",
                "Dz_mod1", "Dz_mod2", "params", "arch_str", "metadata"):
        assert key in payload
    assert payload["metadata"]["model_type"] == "iMDBN_BiModal"
    assert len(payload["joint_layers"]) == 2
    z = payload["mod1_dbn"].represent(np.zeros((2, SIDE * SIDE), np.float32))
    assert np.asarray(z).shape == (2, 24)


def test_load_old_single_joint_rbm_format(tmp_path, model):
    """Back-compat: old payloads with a single joint_rbm upgrade to
    joint_layers (reference imdbn_bimodal.py:1062-1070)."""
    import pickle
    old = {"mod1_dbn": model.mod1_dbn, "mod2_dbn": model.mod2_dbn,
           "joint_rbm": model.joint_rbm, "Dz_mod1": 24, "Dz_mod2": 32}
    p = tmp_path / "old.pkl"
    with open(p, "wb") as f:
        pickle.dump(old, f)
    payload = iMDBN_BiModal.load_model(str(p))
    assert payload["num_joint_layers"] == 1
    assert len(payload["joint_layers"]) == 1


def test_load_pretrained_dbns(tmp_path, model, loaders):
    train, val, _ = loaders
    model.mod1_dbn.save_model(str(tmp_path / "m1.pkl"))
    m2 = iMDBN_BiModal([SIDE * SIDE, 24], [D2, 32], [16], params=PARAMS,
                       dataloader=train, val_loader=val, seed=7)
    assert m2.load_pretrained_mod1_dbn(str(tmp_path / "m1.pkl"))
    np.testing.assert_allclose(np.asarray(m2.mod1_dbn.layers[0].W),
                               np.asarray(model.mod1_dbn.layers[0].W))
    assert not m2.load_pretrained_mod2_dbn(str(tmp_path / "nope.pkl"))


def test_finetune_hooks_exist(model):
    """The reference CLI calls finetune_mod{1,2}_last_layer which don't
    exist there (latent AttributeError, SURVEY.md §2.2); we provide them."""
    model.finetune_mod1_last_layer(epochs=0)
    model.finetune_mod2_last_layer(epochs=0)


def test_mod_to_mod_convenience(model, loaders):
    """Public cross-modal wrappers on raw images."""
    _, val, _ = loaders
    batch = next(iter(val))
    x1, x2 = np.asarray(batch[0]), np.asarray(batch[1])
    m2 = np.asarray(model.mod1_to_mod2(x1))
    assert m2.shape == (len(x1), D2)
    assert np.isfinite(m2).all()
    m1 = np.asarray(model.mod2_to_mod1(x2))
    assert m1.shape == (len(x2), SIDE * SIDE)
    assert np.isfinite(m1).all()


def test_sample_cross_generates(model, loaders):
    """Sampled cross-modal generation (framework extension): shapes,
    range, per-seed determinism, seed variation, and distinctness from
    the mean-field path in both directions."""
    train, _, _ = loaders
    m1, m2 = next(iter(train))
    m1 = np.asarray(m1)[:6]
    m2 = np.asarray(m2)[:6]

    gen2 = np.asarray(model.sample_mod1_to_mod2(m1, seed=0))
    assert gen2.shape == (6, D2)
    assert (gen2 >= 0).all() and (gen2 <= 1).all()
    np.testing.assert_array_equal(
        gen2, np.asarray(model.sample_mod1_to_mod2(m1, seed=0)))
    assert not np.array_equal(
        gen2, np.asarray(model.sample_mod1_to_mod2(m1, seed=1)))
    mean2 = np.asarray(model.mod1_to_mod2(m1))
    # distinct from the mean-field path (threshold is loose: this tiny
    # barely-trained model decodes near the bias means everywhere)
    assert np.abs(gen2 - mean2).max() > 0.01

    gen1 = np.asarray(model.sample_mod2_to_mod1(m2, seed=0))
    assert gen1.shape == (6, SIDE * SIDE)
    assert (gen1 >= 0).all() and (gen1 <= 1).all()
