"""Native C++ dot-generator tests: build, determinism, feature parity
with the Python generator's statistical properties, and backend wiring."""

import numpy as np
import pytest

from multimodal_idbn_tpu.data import native
from multimodal_idbn_tpu.data.numerosity import generate_numerosity_dataset

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="g++ unavailable")


def test_native_generates_valid_stimuli():
    nums = np.arange(1, 17, dtype=np.int32)
    imgs, ca, ch, dens, npl = native.generate_dot_dataset_native(
        0, nums, side=64)
    assert imgs.shape == (16, 64, 64)
    assert set(np.unique(imgs)) <= {0.0, 1.0}
    # every target count placed at these densities
    np.testing.assert_array_equal(npl, nums)
    assert (ca > 0).all()
    assert (ch >= 1).all()
    assert (dens > 0).all()
    # pixel area equals the recorded cumArea
    np.testing.assert_allclose(imgs.reshape(16, -1).sum(1), ca)


def test_native_deterministic_and_seed_sensitive():
    nums = np.full(8, 5, np.int32)
    a, *_ = native.generate_dot_dataset_native(7, nums, side=40)
    b, *_ = native.generate_dot_dataset_native(7, nums, side=40)
    c, *_ = native.generate_dot_dataset_native(8, nums, side=40)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    # per-sample streams: different samples differ
    assert not np.array_equal(a[0], a[1])


def test_dots_nonoverlapping():
    """Connected-component count equals the placed-dot count."""
    from scipy import ndimage

    nums = np.asarray([12], np.int32)
    imgs, _, _, _, npl = native.generate_dot_dataset_native(3, nums,
                                                            side=100)
    _, n_components = ndimage.label(imgs[0])
    assert n_components == int(npl[0])


def test_backend_wiring_matches_python_statistics():
    kw = dict(n_samples=64, num_classes=8, side=50, seed=0)
    d_nat = generate_numerosity_dataset(backend="native", **kw)
    d_py = generate_numerosity_dataset(backend="python", **kw)
    # identical class sampling (shared numpy RNG), same schema
    np.testing.assert_array_equal(d_nat["class_idx"], d_py["class_idx"])
    assert sorted(d_nat) == sorted(d_py)
    # statistically matching geometry: mean pixel area within 15%
    r = d_nat["cumArea"].mean() / d_py["cumArea"].mean()
    assert 0.85 < r < 1.18
    # numerosity ↔ area correlation holds on both (random radii add
    # variance, so the bar is moderate at N=64)
    for d in (d_nat, d_py):
        assert np.corrcoef(d["labels"], d["cumArea"])[0, 1] > 0.7


def test_auto_backend_used_by_loaders():
    from multimodal_idbn_tpu.data import create_dataloaders_uniform

    train, val, _ = create_dataloaders_uniform(batch_size=8, n_samples=32,
                                               num_classes=4, side=30,
                                               seed=0)
    img, y = next(iter(train))
    assert img.shape == (8, 30, 30)
    assert set(np.unique(img)) <= {0.0, 1.0}


def test_hull_area_matches_python_helper():
    """Convex hull of the same point set agrees across implementations."""
    from multimodal_idbn_tpu.data.numerosity import _convex_hull_area

    rng = np.random.RandomState(0)
    # reconstruct hulls indirectly: place known centers via tiny radii is
    # not exposed; instead compare the Python helper against shoelace on
    # a square — and rely on the statistical test above for the C++ side.
    square = np.array([[0, 0], [0, 10], [10, 0], [10, 10], [5, 5]], float)
    assert abs(_convex_hull_area(square) - 100.0) < 1e-9


def test_labels_truthful_at_high_density():
    """Labels must equal actual dot counts even at dense configs
    (code-review finding: silent label noise on placement failure)."""
    for backend in ("native", "python"):
        d = generate_numerosity_dataset(n_samples=24, num_classes=32,
                                        side=64, seed=5, backend=backend)
        np.testing.assert_array_equal(d["N_dots"],
                                      d["labels"].astype(np.int32),
                                      err_msg=backend)
