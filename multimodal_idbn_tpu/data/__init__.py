"""Dataset layer: npz-backed numerosity loaders + synthetic generators.

Implements the interface reconstructed in SURVEY.md §2.3 from the
reference's call sites (scripts/train_multimodal.py:96-102,
scripts/train_bimodal.py:106-114, examples/basic_training.py:29-34):

    create_dataloaders_uniform(data_path, data_name, batch_size,
        num_workers, multimodal_flag, second_modality=None,
        mnist100_path=None, ...) -> (train_loader, val_loader, test_loader)

    create_dataloaders_zipfian(...)  # Zipf-distributed class frequencies

When the npz files are absent (they are not shipped anywhere), a
deterministic synthetic numerosity dataset is generated instead so every
path runs self-contained.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from multimodal_idbn_tpu.data.loaders import (  # noqa: F401
    DataLoader,
    NumerosityDataset,
    Subset,
    train_val_test_split,
)
from multimodal_idbn_tpu.data.numerosity import (  # noqa: F401
    generate_mnist100_images,
    generate_numerosity_dataset,
    zipf_probs,
)

_IMAGE_KEYS = ("images", "data", "x", "X", "stimuli")
_LABEL_KEYS = ("labels", "y", "Y", "numerosity", "N")


def _load_npz(path: str) -> dict:
    """Liberal npz reader: images + numeric labels + optional geometry."""
    with np.load(path, allow_pickle=True) as f:
        keys = set(f.files)
        img_key = next((k for k in _IMAGE_KEYS if k in keys), None)
        lbl_key = next((k for k in _LABEL_KEYS if k in keys), None)
        if img_key is None or lbl_key is None:
            raise KeyError(
                f"npz {path} missing image/label arrays (found {sorted(keys)})")
        images = np.asarray(f[img_key], np.float32)
        labels = np.asarray(f[lbl_key]).astype(np.float32).reshape(-1)
        out = {"images": images, "labels": labels}
        for name, cands in (("cumArea", ("cumArea", "cum_area", "cumulative_area")),
                            ("CH", ("CH", "convex_hull", "hull")),
                            ("density", ("density",)),
                            ("N_dots", ("N_dots", "n_dots"))):
            k = next((c for c in cands if c in keys), None)
            if k is not None:
                out[name] = np.asarray(f[k], np.float32).reshape(-1)
    return out


def _from_npz_or_synthetic(data_path: Optional[str], data_name: Optional[str],
                           class_probs, num_classes: int, n_samples: int,
                           side: int, seed: int) -> dict:
    path = None
    if data_path:
        cand = os.path.join(data_path, data_name) if data_name else data_path
        if os.path.isfile(cand):
            path = cand
        elif data_name and os.path.isfile(cand + ".npz"):
            path = cand + ".npz"
    if path is not None:
        raw = _load_npz(path)
        labels = raw["labels"]
        values = np.unique(labels)
        num_classes = len(values)
        cls = np.searchsorted(values, labels)
        onehot = np.eye(num_classes, dtype=np.float32)[cls]
        images = raw["images"]
        if images.ndim == 2:  # flattened -> square
            s = int(round(images.shape[1] ** 0.5))
            images = images.reshape(-1, s, s)
        cum = raw.get("cumArea", images.reshape(len(images), -1).sum(1))
        ch = raw.get("CH", np.maximum(cum, 1.0))
        return {"images": images, "labels": labels, "onehot": onehot,
                "cumArea": cum, "CH": ch,
                "density": raw.get("density"), "N_dots": raw.get("N_dots"),
                "class_idx": cls}
    return generate_numerosity_dataset(
        n_samples=n_samples, num_classes=num_classes, side=side, seed=seed,
        class_probs=class_probs)


def _build_loaders(data: dict, batch_size: int, multimodal_flag: bool,
                   second_modality: Optional[str], mnist100_path: Optional[str],
                   val_size: float, test_size: float, seed: int):
    mod2 = None
    # multimodal_flag is accepted for reference API parity; unimodal
    # consumers iterate `for img, _ in loader` (reference idbn.py:199), so
    # both cases share the (images, onehot) batch contract.
    del multimodal_flag
    mode = "multimodal"
    if second_modality:
        if second_modality != "mnist100":
            raise ValueError(f"unknown second_modality {second_modality!r}")
        if mnist100_path and os.path.isfile(mnist100_path):
            raw2 = _load_npz(mnist100_path)
            mod2 = raw2["images"]
        else:
            mod2 = generate_mnist100_images(data["labels"], seed=seed)
        mode = "bimodal"

    ds = NumerosityDataset(
        images=data["images"], labels=data["labels"], onehot=data["onehot"],
        cumArea=data["cumArea"], CH=data["CH"],
        density=data.get("density"), n_dots=data.get("N_dots"),
        mod2_images=mod2, mode=mode)

    tr, va, te = train_val_test_split(len(ds), val_size=val_size,
                                      test_size=test_size, seed=42)
    train_loader = DataLoader(Subset(ds, tr), batch_size=batch_size,
                              shuffle=True, seed=seed)
    val_loader = DataLoader(Subset(ds, va), batch_size=batch_size,
                            shuffle=False)
    test_loader = DataLoader(Subset(ds, te), batch_size=batch_size,
                             shuffle=False)
    return train_loader, val_loader, test_loader


def create_dataloaders_uniform(data_path: Optional[str] = None,
                               data_name: Optional[str] = None,
                               batch_size: int = 128, num_workers: int = 1,
                               multimodal_flag: bool = True,
                               second_modality: Optional[str] = None,
                               mnist100_path: Optional[str] = None,
                               val_size: float = 0.15,
                               test_size: float = 0.15,
                               num_classes: int = 32, n_samples: int = 512,
                               side: int = 100, seed: int = 0,
                               # legacy alias from examples/basic_training.py:29
                               path2data: Optional[str] = None):
    """Uniform-class-frequency loaders (SURVEY.md §2.3 contract).

    Loads ``{data_path}/{data_name}``(.npz) when present; otherwise
    generates a deterministic synthetic numerosity dataset with
    ``n_samples`` / ``num_classes`` / ``side``.
    """
    del num_workers
    data = _from_npz_or_synthetic(data_path or path2data, data_name,
                                  class_probs=None, num_classes=num_classes,
                                  n_samples=n_samples, side=side, seed=seed)
    return _build_loaders(data, batch_size, multimodal_flag, second_modality,
                          mnist100_path, val_size, test_size, seed)


def create_dataloaders_zipfian(data_path: Optional[str] = None,
                               data_name: Optional[str] = None,
                               batch_size: int = 128, num_workers: int = 1,
                               multimodal_flag: bool = True,
                               second_modality: Optional[str] = None,
                               mnist100_path: Optional[str] = None,
                               val_size: float = 0.15,
                               test_size: float = 0.15,
                               num_classes: int = 32, n_samples: int = 512,
                               side: int = 100, seed: int = 0,
                               zipf_exponent: float = 1.0,
                               path2data: Optional[str] = None):
    """Zipf-distributed class frequencies (reference README.md:219)."""
    del num_workers
    data = _from_npz_or_synthetic(
        data_path or path2data, data_name,
        class_probs=zipf_probs(num_classes, zipf_exponent),
        num_classes=num_classes, n_samples=n_samples, side=side, seed=seed)
    return _build_loaders(data, batch_size, multimodal_flag, second_modality,
                          mnist100_path, val_size, test_size, seed)
