"""Array-backed datasets and loaders (torch-free).

Implements the loader contract reconstructed in SURVEY.md §2.3 from the
reference's call sites (its ``imdbn/datasets/`` package is absent from the
snapshot): loaders yield ``(images, y_onehot)`` batches (multimodal) or
``(mod1, mod2)`` (bimodal), and the validation loader is a Subset-style
object exposing ``dataset.indices`` and ``dataset.dataset`` carrying
per-sample metadata lists (``labels``, ``cumArea_list``, ``CH_list``,
``density_list``, ``N_list``) in a stable order — every probe / PCA /
trajectory utility depends on that ordering (reference idbn.py:131-146,
imdbn_logging.py:60-66).

Unlike torch DataLoaders, batches are gathered with vectorized NumPy
indexing (no worker processes needed), and every loader exposes
``materialize()`` so the fused on-device training paths can load the whole
epoch into HBM and scan over it.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class NumerosityDataset:
    """Numerosity stimuli + labels + geometry metadata.

    Attributes follow the reference metadata protocol (idbn.py:131-146):
    ``labels`` (numeric numerosity), ``cumArea_list``, ``CH_list``,
    ``density_list``, ``N_list``.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 onehot: np.ndarray, cumArea: np.ndarray, CH: np.ndarray,
                 density: Optional[np.ndarray] = None,
                 n_dots: Optional[np.ndarray] = None,
                 mod2_images: Optional[np.ndarray] = None,
                 mode: str = "multimodal"):
        self.images = np.asarray(images, np.float32)
        self.onehot = np.asarray(onehot, np.float32)
        self.labels: List[float] = [float(x) for x in labels]
        self.cumArea_list: List[float] = [float(x) for x in cumArea]
        self.CH_list: List[float] = [float(x) for x in CH]
        self.density_list: Optional[List[float]] = (
            [float(x) for x in density] if density is not None else None)
        self.N_list: Optional[List[int]] = (
            [int(x) for x in n_dots] if n_dots is not None else None)
        self.mod2_images = (np.asarray(mod2_images, np.float32)
                            if mod2_images is not None else None)
        self.mode = mode
        self.num_classes = self.onehot.shape[1]

    def __len__(self) -> int:
        return len(self.images)

    def _pair(self, idx) -> Tuple[np.ndarray, np.ndarray]:
        if self.mode == "bimodal":
            if self.mod2_images is None:
                raise ValueError("bimodal mode requires mod2_images")
            return self.images[idx], self.mod2_images[idx]
        if self.mode == "mod2":
            if self.mod2_images is None:
                raise ValueError("mod2 mode requires mod2_images")
            return self.mod2_images[idx], self.onehot[idx]
        return self.images[idx], self.onehot[idx]

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        return self._pair(int(i))

    def gather(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized batch gather."""
        return self._pair(np.asarray(indices, dtype=np.int64))


class Subset:
    """View of a dataset at fixed indices (torch ``Subset`` semantics:
    exposes ``.dataset`` and ``.indices``, SURVEY.md §2.3)."""

    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(int(i) for i in indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[self.indices[int(i)]]

    def gather(self, indices: np.ndarray) -> Tuple[np.ndarray, ...]:
        # explicit int64: np.asarray([]) defaults to float64, which would
        # crash integer indexing on empty splits
        base_idx = np.asarray(self.indices, dtype=np.int64)[
            np.asarray(indices, dtype=np.int64)]
        return self.dataset.gather(base_idx)


class DataLoader:
    """Minimal batch iterator over an array-backed dataset.

    Yields tuples of NumPy arrays. ``shuffle=True`` reshuffles every
    epoch with a deterministic per-epoch seed. ``num_workers`` is accepted
    for reference API compatibility and ignored (batch gathers are
    vectorized NumPy, no worker processes).
    """

    def __init__(self, dataset, batch_size: int = 128, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.drop_last = bool(drop_last)
        self.seed = int(seed)
        self._epoch = 0
        del num_workers

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            order = rng.permutation(n)
            self._epoch += 1
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start:start + self.batch_size]
            yield self.dataset.gather(idx)

    def materialize(self) -> Tuple[np.ndarray, ...]:
        """Full dataset as stacked arrays in index order (for the fused
        on-device epoch paths)."""
        return self.dataset.gather(np.arange(len(self.dataset)))


def train_val_test_split(n: int, val_size: float = 0.15,
                         test_size: float = 0.15, seed: int = 42):
    """Deterministic index split; val/test keep a stable (sorted) order so
    the metadata contract holds across runs."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_val = int(round(n * val_size))
    n_test = int(round(n * test_size))
    val_idx = np.sort(perm[:n_val])
    test_idx = np.sort(perm[n_val:n_val + n_test])
    train_idx = perm[n_val + n_test:]
    return train_idx, val_idx, test_idx
