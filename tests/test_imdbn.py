"""iMDBN tests: construction, bias init, joint training, cross-modal
inference, save/load round trip — mirroring reference test_extraction.py
plus training-correctness checks it lacks (SURVEY.md §4)."""

import pickle

import numpy as np
import pytest

from multimodal_idbn_tpu.data import create_dataloaders_uniform
from multimodal_idbn_tpu.models import iMDBN
from multimodal_idbn_tpu.ops import imdbn_ops

PARAMS = {
    "LEARNING_RATE": 0.1,
    "WEIGHT_PENALTY": 1e-4,
    "INIT_MOMENTUM": 0.5,
    "FINAL_MOMENTUM": 0.9,
    "LEARNING_RATE_DYNAMIC": True,
    "CD": 1,
    "JOINT_CD": 1,
    "JOINT_LEARNING_RATE": 0.04,
    "CROSS_GIBBS_STEPS": 6,
    "JOINT_AUX_COND_STEPS": 4,
}

K = 5
SIDE = 16


@pytest.fixture(scope="module")
def loaders():
    return create_dataloaders_uniform(batch_size=16, n_samples=96,
                                      num_classes=K, side=SIDE, seed=0)


@pytest.fixture(scope="module")
def model(loaders):
    train, val, _ = loaders
    m = iMDBN([256, 64, 32], 24, params=PARAMS, dataloader=train,
              val_loader=val, num_labels=K, seed=0)
    m.image_idbn.train(epochs=4)
    return m


def test_construction(model):
    assert model.Dz_img == 32
    assert model.joint_rbm.num_visible == 32 + K
    assert model.joint_rbm.num_hidden == 24
    assert model.joint_rbm.softmax_groups == [(32, 32 + K)]
    assert model.arch_str == "IMG256-64-32_JOINT24"
    assert model.features is not None


def test_legacy_constructor_signature(loaders):
    train, val, _ = loaders
    m = iMDBN([256, 32], [10, 20], joint_layer_size=16, params=PARAMS,
              dataloader=train, val_loader=val, num_labels=K, seed=0)
    assert m.joint_rbm.num_hidden == 16
    with pytest.raises(ValueError):
        iMDBN([256, 32], [10, 20], params=PARAMS, dataloader=train,
              val_loader=val, num_labels=K)


def test_init_joint_bias_from_data(model):
    model.init_joint_bias_from_data(n_batches=4)
    Dz = model.Dz_img
    vb = np.asarray(model.joint_rbm.vis_bias)
    # z-bias is a logit of a clamped mean: finite
    assert np.isfinite(vb[:Dz]).all()
    # label bias = log priors: negative, finite
    assert (vb[Dz:] < 0).all() and np.isfinite(vb[Dz:]).all()
    # class means exist for all classes with global-mean fallback
    zcm = np.asarray(model.z_class_mean)
    assert zcm.shape == (K, Dz)
    assert np.isfinite(zcm).all()
    assert (zcm >= 0).all() and (zcm <= 1).all()


def test_represent(model, loaders):
    _, val, _ = loaders
    batch = next(iter(val))
    h = np.asarray(model.represent(batch))
    assert h.shape == (len(batch[0]), 24)
    assert (h >= 0).all() and (h <= 1).all()


def test_cross_reconstruct_shapes(model, loaders):
    _, val, _ = loaders
    img, y = next(iter(val))
    z = model.image_idbn.represent(img)
    rec, p_y = model._cross_reconstruct(z, y, steps=4)
    assert np.asarray(rec).shape == (len(img), SIDE * SIDE)
    p = np.asarray(p_y)
    assert p.shape == (len(img), K)
    np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-4)


def test_best_of_k_flag_changes_path(model, loaders):
    """Degenerate (reference) vs real free-energy selection both run."""
    _, val, _ = loaders
    img, y = next(iter(val))
    z = model.image_idbn.represent(img)
    model.reference_best_of_k_bug = True
    rec1, _ = model._cross_reconstruct(z, y, steps=3)
    model.reference_best_of_k_bug = False
    rec2, _ = model._cross_reconstruct(z, y, steps=3)
    model.reference_best_of_k_bug = True
    assert np.asarray(rec1).shape == np.asarray(rec2).shape


def test_train_joint_fused(loaders):
    train, val, _ = loaders
    m = iMDBN([256, 32], 24, params=PARAMS, dataloader=train,
              val_loader=val, num_labels=K, seed=0)
    m.image_idbn.train(epochs=3)
    m.train_joint(epochs=14)  # 8 warmup + 6 main
    assert m.last_metrics is not None
    top1 = m.last_metrics["cross_modality/text_top1"]
    assert 0.0 <= top1 <= 1.0
    # after supervised warmup + CD on 5 classes, should beat chance
    assert top1 > 1.0 / K
    assert m.last_metrics["cross_modality/image_mse"] < 1.0


def test_train_joint_batched_path(loaders):
    train, val, _ = loaders
    m = iMDBN([256, 16], 16, params=PARAMS, dataloader=train,
              val_loader=val, num_labels=K, seed=0)
    m.image_idbn.train(epochs=1)
    m.train_joint(epochs=1, fused=False)  # warmup epoch, per-batch path
    assert m.last_metrics is not None


def test_save_load_roundtrip(tmp_path, model):
    p = tmp_path / "imdbn.pkl"
    model.save_model(str(p))
    payload = iMDBN.load_model(str(p))
    # dual format: DBN-compatible + extended (SURVEY.md §2.1(13))
    for key in ("layers", "params", "image_idbn", "joint_rbm", "num_labels",
                "Dz_img", "arch_str", "features", "metadata",
                "z_class_mean"):
        assert key in payload, key
    assert payload["metadata"]["model_type"] == "iMDBN"
    assert len(payload["layers"]) == 3  # 2 image RBMs + joint
    # adapter contract: unpickled RBMs expose W/hid_bias/vis_bias/forward
    rbm = payload["joint_rbm"]
    assert np.asarray(rbm.W).shape == (32 + K, 24)
    h = rbm.forward(np.zeros((2, 32 + K), np.float32))
    assert np.asarray(h).shape == (2, 24)
    # loaded image_idbn can represent
    z = payload["image_idbn"].represent(np.zeros((2, 256), np.float32))
    assert np.asarray(z).shape == (2, 32)


def test_load_pretrained_image_idbn(tmp_path, loaders, model):
    train, val, _ = loaders
    model.image_idbn.save_model(str(tmp_path / "idbn.pkl"))
    m2 = iMDBN([256, 64, 32], 24, params=PARAMS, dataloader=train,
               val_loader=val, num_labels=K, seed=1)
    assert m2.load_pretrained_image_idbn(str(tmp_path / "idbn.pkl"))
    np.testing.assert_allclose(np.asarray(m2.image_idbn.layers[0].W),
                               np.asarray(model.image_idbn.layers[0].W))
    # momentum re-zeroed on load (reference imdbn.py:329-331)
    assert float(np.abs(np.asarray(m2.image_idbn.layers[0].W_m)).sum()) == 0.0
    assert not m2.load_pretrained_image_idbn(str(tmp_path / "missing.pkl"))


def test_joint_bias_stats_empty_class_fallback():
    import jax.numpy as jnp
    Z = jnp.asarray(np.random.RandomState(0).rand(10, 4).astype(np.float32))
    Y = np.zeros((10, 3), np.float32)
    Y[:, 0] = 1.0  # classes 1,2 empty
    zb, yb, zcm = imdbn_ops.joint_bias_stats(Z, jnp.asarray(Y),
                                             num_classes=3)
    mean_z = np.clip(np.asarray(Z).mean(0), 1e-4, 1 - 1e-4)
    np.testing.assert_allclose(np.asarray(zcm)[1], mean_z, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(zcm)[2], mean_z, rtol=1e-5)
    # XLA's f32 log/log1p differ from NumPy's by ~1e-4 (transcendental
    # approximation), so compare at that tolerance.
    np.testing.assert_allclose(
        np.asarray(zb), np.log(mean_z) - np.log1p(-mean_z), atol=5e-4)


def test_img2txt_txt2img_convenience(model, loaders):
    """Public inference wrappers: raw images -> p(y|img); labels ->
    decoded images. p(y|img) must match _cross_reconstruct exactly
    (the label block is ignored by the IMG->TXT half)."""
    _, val, _ = loaders
    img, y = next(iter(val))
    p_y = np.asarray(model.img2txt(img))
    assert p_y.shape == (len(img), K)
    np.testing.assert_allclose(p_y.sum(1), 1.0, atol=1e-4)

    # integer labels and one-hot labels both accepted
    ids = np.arange(len(img)) % K
    rec_from_ids = np.asarray(model.txt2img(ids))
    assert rec_from_ids.shape == (len(img), SIDE * SIDE)
    assert np.isfinite(rec_from_ids).all()
    onehot = np.eye(K, dtype=np.float32)[ids]
    rec_from_onehot = np.asarray(model.txt2img(onehot))
    assert rec_from_onehot.shape == rec_from_ids.shape


def test_cross_reconstruct_direction_bit_parity(model, loaders):
    """direction='img2txt'/'txt2img' skip half the chains but stay
    bit-identical to the 'both' path (shared key split)."""
    import jax
    from multimodal_idbn_tpu.ops import imdbn_ops

    _, val, _ = loaders
    img, y = next(iter(val))
    z = model.image_idbn.represent(img)
    kk = jax.random.key(41)
    kwargs = dict(steps=4, Dz=model.Dz_img,
                  groups=tuple(tuple(g) for g in
                               model.joint_rbm.softmax_groups),
                  z_class_mean=model.z_class_mean)
    states = model.image_idbn._states()
    jr = model.joint_rbm.state
    img_b, py_b = imdbn_ops.cross_reconstruct(jr, states, kk, z,
                                              np.asarray(y), **kwargs)
    ni, py_i = imdbn_ops.cross_reconstruct(jr, states, kk, z,
                                           np.asarray(y),
                                           direction="img2txt", **kwargs)
    img_t, npy = imdbn_ops.cross_reconstruct(jr, states, kk, z,
                                             np.asarray(y),
                                             direction="txt2img", **kwargs)
    assert ni is None and npy is None
    np.testing.assert_array_equal(np.asarray(py_b), np.asarray(py_i))
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_t))
    with pytest.raises(ValueError):
        imdbn_ops.cross_reconstruct(jr, states, kk, z, np.asarray(y),
                                    direction="sideways", **kwargs)


def test_txt2img_rejects_out_of_range_ids(model):
    with pytest.raises(ValueError):
        model.txt2img(np.array([-1]))
    with pytest.raises((ValueError, IndexError)):
        model.txt2img(np.array([K]))


def test_sample_txt2img_generates(loaders):
    """Class-conditional generative sampling (framework extension):
    shapes/range, per-seed determinism, seed-to-seed variation, and the
    draws are actual samples (not the information-bounded mean decode).
    Label-information content (cycle consistency) is a flagship-scale
    property measured in benchmarks (at this toy scale even img2txt on
    REAL images is near chance)."""
    train, val, _ = loaders
    m = iMDBN([256, 64, 32], 24, params=PARAMS, dataloader=train,
              val_loader=val, num_labels=K, seed=0)
    m.image_idbn.train(epochs=6)
    m.train_joint(epochs=6)

    ids = np.arange(K).repeat(4)  # 4 draws per class
    imgs = np.asarray(m.sample_txt2img(ids, seed=0))
    assert imgs.shape == (4 * K, SIDE * SIDE)
    assert (imgs >= 0).all() and (imgs <= 1).all()
    # deterministic per seed
    imgs2 = np.asarray(m.sample_txt2img(ids, seed=0))
    np.testing.assert_array_equal(imgs, imgs2)
    # different seeds give different draws
    imgs3 = np.asarray(m.sample_txt2img(ids, seed=1))
    assert not np.array_equal(imgs, imgs3)
    # samples, not the mean decode: same-class draws differ from each
    # other and from txt2img's deterministic mean output
    assert not np.array_equal(imgs[0], imgs[1])
    mean_imgs = np.asarray(m.txt2img(ids))
    assert np.abs(imgs - mean_imgs).max() > 0.1
    # one-hot labels accepted; id validation fires
    onehot = np.eye(K, dtype=np.float32)[ids]
    assert np.asarray(m.sample_txt2img(onehot, seed=0)).shape == imgs.shape
    with pytest.raises(ValueError):
        m.sample_txt2img(np.asarray([K + 3]))


def test_from_payload_rebuilds_functional_model(tmp_path, model, loaders):
    """iMDBN.from_payload must produce a model whose inference paths all
    work and match the original (framework extension over the
    reference's raw-dict load_model)."""
    train, val, _ = loaders
    p = tmp_path / "imdbn_fp.pkl"
    model.save_model(str(p))
    m2 = iMDBN.from_payload(iMDBN.load_model(str(p)))

    imgs, _ = next(iter(val))
    imgs = np.asarray(imgs).reshape(len(imgs), -1)[:4]
    np.testing.assert_array_equal(np.asarray(model.img2txt(imgs)),
                                  np.asarray(m2.img2txt(imgs)))
    d1 = np.asarray(model.sample_txt2img([0, 1], seed=5))
    d2 = np.asarray(m2.sample_txt2img([0, 1], seed=5))
    np.testing.assert_array_equal(d1, d2)
    # params identity shared with image_idbn (one-knob invariant)
    assert m2.params is m2.image_idbn.params
    # loaders propagate to the embedded iDBN like __init__
    m3 = iMDBN.from_payload(iMDBN.load_model(str(p)), dataloader=train,
                            val_loader=val)
    assert m3.image_idbn.dataloader is train
    assert m3.image_idbn.val_loader is val
    # best-of-K flag round-trips through save/load
    model.reference_best_of_k_bug = False
    p2 = tmp_path / "imdbn_fp2.pkl"
    model.save_model(str(p2))
    model.reference_best_of_k_bug = True
    m4 = iMDBN.from_payload(iMDBN.load_model(str(p2)))
    assert m4.reference_best_of_k_bug is False


def test_generate_cli_smoke(tmp_path, model):
    """scripts/generate.py draws images from a saved model."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    mp = tmp_path / "gen_model.pkl"
    model.save_model(str(mp))
    out = tmp_path / "draws.npz"
    png = tmp_path / "draws.png"
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "generate.py"),
         "--model", str(mp), "--labels", "0", "2", "--n-per-label", "2",
         "--gibbs-steps", "4", "--seed", "0", "--out", str(out),
         "--png", str(png), "--cpu"],
        capture_output=True, text=True, timeout=600, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    with np.load(out) as f:
        assert f["images"].shape == (4, SIDE * SIDE)
        np.testing.assert_array_equal(f["labels"], [0, 0, 2, 2])
    assert png.exists()
