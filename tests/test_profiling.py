"""Profiling utilities tests."""

import time

import numpy as np

from multimodal_idbn_tpu.utils.profiling import (
    StepTimer,
    measure_gibbs_steps_per_sec,
    trace,
)


def test_step_timer_statistics():
    t = StepTimer()
    for _ in range(3):
        with t.step():
            time.sleep(0.01)
    assert t.count == 3
    assert 0.005 < t.mean() < 0.2
    assert t.steps_per_sec() > 1

    class Run:
        def __init__(self):
            self.logged = []

        def log(self, d):
            self.logged.append(d)

    run = Run()
    t.log_to(run, prefix="perf/epoch", epoch=2)
    keys = set(run.logged[0])
    assert "perf/epoch_seconds" in keys
    assert "perf/epochs_per_sec" in keys
    assert run.logged[0]["epoch"] == 2
    # None run is a no-op
    t.log_to(None)


def test_trace_context_noop():
    with trace(enabled=False):
        x = 1 + 1
    assert x == 2
    with trace("/tmp/jax_trace_test"):
        pass


def test_measure_gibbs_steps_per_sec_small():
    stats = measure_gibbs_steps_per_sec(num_visible=36, num_hidden=16,
                                        batch_size=8, n_steps=20,
                                        groups=((32, 36),))
    assert stats["chain_steps_per_sec"] > 0
    assert stats["cell_updates_per_sec"] > stats["chain_steps_per_sec"]
    assert stats["elapsed_s"] > 0


def test_models_expose_epoch_timer():
    from multimodal_idbn_tpu.data import create_dataloaders_uniform
    from multimodal_idbn_tpu.models import iDBN

    train, val, _ = create_dataloaders_uniform(batch_size=8, n_samples=32,
                                               num_classes=3, side=10,
                                               seed=0)
    m = iDBN([100, 16], {
        "LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4, "INIT_MOMENTUM": 0.5,
        "FINAL_MOMENTUM": 0.9, "LEARNING_RATE_DYNAMIC": True, "CD": 1,
    }, train, val, seed=0)
    m.train(epochs=2)  # wandb_run=None -> epoch-blocked: 1 dispatch,
    assert m.epoch_timer.count == 2  # amortized to per-epoch entries
    assert m.epoch_timer.steps_per_sec() > 0
    assert len(m.loss_history) == 2  # per-epoch losses still recorded

    # with a run object the per-epoch path times each epoch
    class Run:
        def log(self, d):
            pass

    m2 = iDBN([100, 16], {
        "LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4, "INIT_MOMENTUM": 0.5,
        "FINAL_MOMENTUM": 0.9, "LEARNING_RATE_DYNAMIC": True, "CD": 1,
    }, train, val, seed=0, wandb_run=Run())
    m2.train(epochs=2, log_every_pca=10**9, log_every_probe=10**9)
    assert m2.epoch_timer.count == 2


def test_step_timer_amortized_block():
    """step(n=E) records E equal per-step entries so p50/mean stay
    per-epoch even when one dispatch covers a whole epoch block."""
    t = StepTimer()
    with t.step(5):
        time.sleep(0.05)
    assert t.count == 5
    assert len(set(np.round(t.durations, 9))) == 1
    assert 0.005 < t.p50() < 0.05  # per-epoch, not per-block


def test_enable_persistent_compilation_cache(tmp_path, monkeypatch):
    """The helper every CLI entry point calls must point JAX's persistent
    cache at the requested (or env-derived) directory and return it."""
    import jax

    from multimodal_idbn_tpu import config as fw_config

    prev = jax.config.jax_compilation_cache_dir
    try:
        p = fw_config.enable_persistent_compilation_cache(str(tmp_path))
        assert p == str(tmp_path)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
        assert fw_config.enable_persistent_compilation_cache() == \
            str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
