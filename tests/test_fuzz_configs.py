"""Bounded configuration fuzz: random architectures / class counts /
batch sizes through the full training paths must run and stay finite.
Catches shape edge cases (odd widths, K=2, single-layer DBNs, batch
bigger than splits) that the targeted tests don't enumerate."""

import jax
import numpy as np
import pytest

from multimodal_idbn_tpu.checkpoint import load_train_checkpoint
from multimodal_idbn_tpu.data import create_dataloaders_uniform
from multimodal_idbn_tpu.models import iDBN, iMDBN


@pytest.fixture(scope="module", autouse=True)
def _clear_caches_after_module():
    # Heavy module: drop compiled executables at teardown (see the
    # backend_compile_and_load segfault note in CLAUDE.md).
    yield
    jax.clear_caches()

CONFIGS = [
    # (layer_sizes, joint_hidden, K, batch, n_samples, side, fused, extra)
    ([81, 17], 9, 2, 8, 40, 9, True, {}),        # odd widths, K=2
    ([100, 33, 11], 7, 3, 16, 50, 10, True, {}),  # 3-layer, tiny joint
    ([64, 16], 5, 7, 32, 45, 8, True, {}),       # batch > train split
    ([121, 24], 13, 4, 8, 40, 11, False, {}),    # per-batch path
    ([81, 17], 9, 3, 8, 40, 9, True,             # framework extensions
     {"COMPUTE_DTYPE": "bfloat16", "PCD": True}),
]


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=[f"cfg{i}" for i in range(len(CONFIGS))])
def test_random_config_end_to_end(cfg):
    layers, joint_h, K, bs, n, side, fused, extra = cfg
    params = {
        "LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
        "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.9,
        "LEARNING_RATE_DYNAMIC": True, "CD": 1, "JOINT_CD": 1,
        "JOINT_LEARNING_RATE": 0.04, "CROSS_GIBBS_STEPS": 2,
        "JOINT_AUX_COND_STEPS": 2, **extra,
    }
    train, val, _ = create_dataloaders_uniform(
        batch_size=bs, n_samples=n, num_classes=K, side=side, seed=1)
    m = iMDBN(layers, joint_h, params=params, dataloader=train,
              val_loader=val, num_labels=K, seed=1)
    m.image_idbn.train(epochs=1, fused=fused)
    assert np.isfinite(m.image_idbn.loss_history[-1])
    m.train_joint(epochs=1, fused=fused, log_every=10**9,
                  log_every_pca=10**9, log_every_probe=10**9)
    assert m.last_metrics is not None
    for v in m.last_metrics.values():
        assert np.isfinite(v)
    # inference after training
    img, y = next(iter(val))
    rec, p_y = m._cross_reconstruct(m.image_idbn.represent(img), y, steps=2)
    assert np.isfinite(np.asarray(rec)).all()
    np.testing.assert_allclose(np.asarray(p_y).sum(1), 1.0, atol=1e-4)


RESUME_CONFIGS = [
    # (layers, extra_params, fused, epochs, checkpoint_every)
    ([81, 17], {}, True, 5, 2),                      # odd widths, off-cadence end
    ([100, 33, 11], {"PCD": True}, True, 5, 3),      # 3-layer + fantasy chains
    ([64, 16], {"DTYPE": "bfloat16"}, True, 4, 1),   # extension-dtype states
    ([121, 24], {}, False, 4, 2),                    # per-batch (non-fused) path
]


@pytest.mark.parametrize(
    "cfg", RESUME_CONFIGS,
    ids=[f"resume{i}" for i in range(len(RESUME_CONFIGS))])
def test_random_config_resume_bit_identical(cfg, tmp_path):
    """Crash-safe resume fuzz: across fused/non-fused, PCD, and bf16
    configs, loading the last mid-run checkpoint and finishing the run
    must reproduce the uninterrupted run bit-for-bit."""
    layers, extra, fused, epochs, every = cfg
    params = {
        "LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
        "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.9,
        "LEARNING_RATE_DYNAMIC": True, "CD": 1, **extra,
    }
    side = int(round(layers[0] ** 0.5))

    def make():
        train, val, _ = create_dataloaders_uniform(
            batch_size=16, n_samples=48, num_classes=3, side=side, seed=1)
        return iDBN(layers, dict(params), train, val, seed=1)

    a = make()
    a.train(epochs, fused=fused)

    ck = str(tmp_path / "fuzz.ckpt")
    b = make()
    b.train(epochs, fused=fused, checkpoint_every=every,
            checkpoint_path=ck)

    c = make()
    phase, nxt = load_train_checkpoint(c, ck)
    # the last mid-run save lands on the last edge before the end
    assert phase == "image" and 0 < nxt < epochs
    c.train(epochs, fused=fused, start_epoch=nxt)

    for ra, rc in zip(a.layers, c.layers):
        for xa, xc in zip(ra.state, rc.state):
            np.testing.assert_array_equal(np.asarray(xa, np.float32),
                                          np.asarray(xc, np.float32))
    np.testing.assert_array_equal(a.loss_history, c.loss_history)
