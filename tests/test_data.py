"""Dataset layer tests: loader contract of SURVEY.md §2.3."""

import numpy as np

from multimodal_idbn_tpu.data import (
    DataLoader,
    NumerosityDataset,
    Subset,
    create_dataloaders_uniform,
    create_dataloaders_zipfian,
    generate_mnist100_images,
    generate_numerosity_dataset,
    zipf_probs,
)


def test_generate_numerosity_dataset():
    d = generate_numerosity_dataset(n_samples=24, num_classes=8, side=40,
                                    seed=0)
    assert d["images"].shape == (24, 40, 40)
    assert set(np.unique(d["images"])) <= {0.0, 1.0}
    assert d["onehot"].shape == (24, 8)
    np.testing.assert_allclose(d["onehot"].sum(1), 1.0)
    # numeric labels are the numerosity values of the sampled classes
    assert d["labels"].min() >= 1
    # geometry features positive
    assert (d["cumArea"] > 0).all()
    assert (d["CH"] > 0).all()
    # deterministic
    d2 = generate_numerosity_dataset(n_samples=24, num_classes=8, side=40,
                                     seed=0)
    np.testing.assert_array_equal(d["images"], d2["images"])


def test_dot_count_matches_label():
    d = generate_numerosity_dataset(n_samples=16, num_classes=6, side=60,
                                    seed=1)
    # N_dots should equal the numerosity label (placement rarely fails at
    # these densities)
    assert (d["N_dots"] == d["labels"].astype(int)).mean() > 0.9


def test_loader_contract_uniform():
    train, val, test = create_dataloaders_uniform(
        batch_size=16, n_samples=80, num_classes=5, side=30, seed=0)
    # batch contract: (images, onehot)
    img, y = next(iter(train))
    assert img.shape == (16, 30, 30)
    assert y.shape == (16, 5)
    # Subset metadata protocol (reference idbn.py:131-146)
    assert hasattr(val.dataset, "indices")
    base = val.dataset.dataset
    assert len(base.labels) == 80
    assert len(base.cumArea_list) == 80
    assert len(base.CH_list) == 80
    assert base.density_list is not None
    # val loader is not shuffled: two passes identical
    a = np.concatenate([b[0].reshape(len(b[0]), -1) for b in val])
    b = np.concatenate([b[0].reshape(len(b[0]), -1) for b in val])
    np.testing.assert_array_equal(a, b)
    # no index overlap between splits
    tr = set(train.dataset.indices)
    va = set(val.dataset.indices)
    te = set(test.dataset.indices)
    assert not (tr & va) and not (tr & te) and not (va & te)
    assert len(tr | va | te) == 80


def test_train_loader_shuffles_per_epoch():
    train, _, _ = create_dataloaders_uniform(batch_size=16, n_samples=64,
                                             num_classes=4, side=20, seed=0)
    e1 = np.concatenate([b[0].reshape(len(b[0]), -1) for b in train])
    e2 = np.concatenate([b[0].reshape(len(b[0]), -1) for b in train])
    assert not np.array_equal(e1, e2)
    # same content though
    np.testing.assert_allclose(np.sort(e1.sum(1)), np.sort(e2.sum(1)))


def test_zipfian_skews_classes():
    p = zipf_probs(8)
    assert p[0] > p[-1] * 4
    train, _, _ = create_dataloaders_zipfian(batch_size=16, n_samples=400,
                                             num_classes=8, side=20, seed=0)
    base = train.dataset.dataset
    counts = np.bincount(np.argmax(base.onehot, 1), minlength=8)
    assert counts[0] > counts[-1]


def test_bimodal_batches():
    train, val, _ = create_dataloaders_uniform(
        batch_size=8, n_samples=40, num_classes=4, side=20, seed=0,
        second_modality="mnist100")
    m1, m2 = next(iter(train))
    assert m1.shape == (8, 20, 20)
    assert m2.shape == (8, 28, 56)
    assert set(np.unique(m2)) <= {0.0, 1.0}


def test_mnist100_renders_values():
    imgs = generate_mnist100_images(np.array([7, 23, 99]), seed=0)
    assert imgs.shape == (3, 28, 56)
    assert imgs.sum() > 0
    # different values give different images
    assert not np.array_equal(imgs[0], imgs[1])


def test_materialize_matches_iteration_order():
    _, val, _ = create_dataloaders_uniform(batch_size=8, n_samples=40,
                                           num_classes=4, side=20, seed=0)
    X, Y = val.materialize()
    Xi = np.concatenate([b[0] for b in val])
    np.testing.assert_array_equal(X, Xi)


def test_dataloader_remainder_and_drop_last():
    d = generate_numerosity_dataset(n_samples=21, num_classes=3, side=16,
                                    seed=0)
    ds = NumerosityDataset(d["images"], d["labels"], d["onehot"],
                           d["cumArea"], d["CH"])
    dl = DataLoader(ds, batch_size=8)
    sizes = [len(b[0]) for b in dl]
    assert sizes == [8, 8, 5]
    assert len(dl) == 3
    dl2 = DataLoader(ds, batch_size=8, drop_last=True)
    assert [len(b[0]) for b in dl2] == [8, 8]
    sub = Subset(ds, [1, 3, 5])
    assert len(sub) == 3
    np.testing.assert_array_equal(sub[0][0], ds[1][0])


def test_empty_subset_gather_and_materialize():
    """np.asarray([]) is float64 — Subset/gather must force int indices so
    empty splits materialize to empty arrays instead of IndexError."""
    d = generate_numerosity_dataset(n_samples=6, num_classes=3, side=16,
                                    seed=0)
    ds = NumerosityDataset(d["images"], d["labels"], d["onehot"],
                           d["cumArea"], d["CH"])
    sub = Subset(ds, [])
    out = sub.gather(np.arange(0))
    assert all(len(a) == 0 for a in out)
    X, Y = DataLoader(sub, batch_size=4).materialize()
    assert X.shape[0] == 0 and Y.shape[0] == 0


# -- real-npz path (reference scripts/train_multimodal.py:96-102 loads
# {data_path}/{data_name}.npz; key detection in data/__init__.py) ----------


def _write_stimuli_npz(path, n=48, side=20, seed=0, img_key="images",
                       lbl_key="labels", flat=False, extra=None):
    rng = np.random.RandomState(seed)
    labels = rng.randint(1, 6, n).astype(np.int64)
    images = (rng.rand(n, side, side) < 0.1).astype(np.float32)
    arrays = {img_key: images.reshape(n, -1) if flat else images,
              lbl_key: labels}
    if extra:
        arrays.update(extra)
    np.savez(path, **arrays)
    return images, labels


def test_npz_uniform_canonical_keys(tmp_path):
    images, labels = _write_stimuli_npz(
        tmp_path / "stimuli_dataset.npz",
        extra={"cumArea": np.arange(48, dtype=np.float32) + 1.0,
               "CH": np.full(48, 2.0, np.float32),
               "density": np.full(48, 0.1, np.float32),
               "N_dots": np.arange(48, dtype=np.float32)})
    train, val, test = create_dataloaders_uniform(
        data_path=str(tmp_path), data_name="stimuli_dataset.npz",
        batch_size=8, seed=0)
    base = val.dataset.dataset
    assert len(base.labels) == 48
    np.testing.assert_array_equal(np.sort(np.unique(base.labels)),
                                  np.sort(np.unique(labels)))
    # geometry taken from the file, not recomputed
    np.testing.assert_allclose(np.sort(base.cumArea_list),
                               np.arange(48) + 1.0)
    assert base.density_list is not None
    img, y = next(iter(train))
    assert img.shape == (8, 20, 20)
    # onehot width = number of distinct label values in the file
    assert y.shape == (8, len(np.unique(labels)))
    # all three splits partition the file
    assert len(train.dataset) + len(val.dataset) + len(test.dataset) == 48


def test_npz_variant_keys_flat_images_and_name_without_ext(tmp_path):
    """Key aliases (stimuli/numerosity) + flattened images reshaped to
    square + data_name given without the .npz extension."""
    images, labels = _write_stimuli_npz(
        tmp_path / "stims.npz", side=16, img_key="stimuli",
        lbl_key="numerosity", flat=True)
    train, val, _ = create_dataloaders_zipfian(
        data_path=str(tmp_path), data_name="stims", batch_size=8, seed=0)
    img, _ = next(iter(train))
    assert img.shape == (8, 16, 16)
    base = val.dataset.dataset
    # flattened images were reshaped back to (n, 16, 16)
    assert base.images.shape == (48, 16, 16)
    # cumArea falls back to per-image pixel sums when absent from the file
    np.testing.assert_allclose(
        np.sort(base.cumArea_list),
        np.sort(images.reshape(48, -1).sum(1)), rtol=1e-6)


def test_npz_missing_keys_raises(tmp_path):
    np.savez(tmp_path / "bad.npz",
             foo=np.zeros((4, 4)), bar=np.zeros(4))
    try:
        create_dataloaders_uniform(data_path=str(tmp_path),
                                   data_name="bad.npz", batch_size=2)
        raise AssertionError("expected KeyError for unknown npz keys")
    except KeyError as e:
        assert "bad.npz" in str(e)


def test_npz_mnist100_second_modality(tmp_path):
    """Bimodal: first modality from stimuli npz, second from an mnist100
    npz (28x56 glyph images aligned by sample)."""
    _write_stimuli_npz(tmp_path / "stimuli_dataset.npz", n=40, side=20)
    rng = np.random.RandomState(1)
    mod2 = (rng.rand(40, 28, 56) < 0.2).astype(np.float32)
    np.savez(tmp_path / "mnist100.npz", images=mod2,
             labels=np.arange(40))
    train, _, _ = create_dataloaders_uniform(
        data_path=str(tmp_path), data_name="stimuli_dataset.npz",
        mnist100_path=str(tmp_path / "mnist100.npz"),
        second_modality="mnist100", batch_size=8, seed=0)
    m1, m2 = next(iter(train))
    assert m1.shape == (8, 20, 20)
    assert m2.shape == (8, 28, 56)
    # mod2 rows come from the file (match some row of the saved array)
    assert any(np.array_equal(m2[0], mod2[i]) for i in range(40))
