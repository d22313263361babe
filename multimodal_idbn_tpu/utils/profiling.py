"""Tracing and performance instrumentation.

The reference has no performance tracing at all — only tqdm bars and
prints (SURVEY.md §5.1). The TPU rebuild exposes:

- :func:`trace` — a ``jax.profiler`` trace context (view in TensorBoard /
  Perfetto) around any training or inference region;
- :class:`StepTimer` — wall-clock step statistics with steps/sec and
  optional run-object logging under ``perf/*`` keys;
- :func:`measure_gibbs_steps_per_sec` — the BASELINE.json throughput
  metric: HBM-resident joint-chain Gibbs iterations per second.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace", enabled: bool = True):
    """``jax.profiler.trace`` wrapper (no-op when disabled/unsupported).

    Only profiler start/stop failures are swallowed — exceptions raised by
    the traced body propagate unchanged (a catch-all around the ``yield``
    would re-yield and mask the body's exception with contextlib's
    "generator didn't stop" RuntimeError)."""
    if not enabled:
        yield
        return
    cm = None
    try:
        cm = jax.profiler.trace(log_dir)
        cm.__enter__()
    except Exception:
        cm = None
    try:
        yield
    finally:
        if cm is not None:
            try:
                cm.__exit__(None, None, None)
            except Exception:
                pass


class StepTimer:
    """Wall-clock step timing with steps/sec statistics.

    Usage::

        timer = StepTimer()
        for epoch in range(E):
            with timer.step():
                ... one epoch / step ...
        timer.log_to(wandb_run, prefix="perf/epoch")
    """

    def __init__(self):
        self.durations: list = []

    @contextlib.contextmanager
    def step(self, n: int = 1):
        """Time a region covering ``n`` logical steps; the elapsed time is
        recorded amortized (``n`` equal entries) so per-step statistics
        stay meaningful when one dispatch covers a whole epoch block."""
        n = max(1, int(n))
        t0 = time.perf_counter()
        yield
        dt = (time.perf_counter() - t0) / n
        self.durations.extend([dt] * n)

    @property
    def count(self) -> int:
        return len(self.durations)

    def mean(self) -> float:
        return float(np.mean(self.durations)) if self.durations else 0.0

    def p50(self) -> float:
        return (float(np.percentile(self.durations, 50))
                if self.durations else 0.0)

    def steps_per_sec(self) -> float:
        total = float(np.sum(self.durations))
        return self.count / total if total > 0 else 0.0

    def last(self) -> float:
        return self.durations[-1] if self.durations else 0.0

    def log_to(self, run, prefix: str = "perf/step", epoch: Optional[int]
               = None) -> None:
        if run is None or not self.durations:
            return
        payload = {
            f"{prefix}_seconds": self.last(),
            f"{prefix}_mean_seconds": self.mean(),
            f"{prefix}s_per_sec": self.steps_per_sec(),
        }
        if epoch is not None:
            payload["epoch"] = epoch
        run.log(payload)


def measure_gibbs_steps_per_sec(num_visible: int = 532,
                                num_hidden: int = 500,
                                batch_size: int = 128,
                                n_steps: int = 500,
                                groups=((500, 532),),
                                seed: int = 0,
                                warmup: bool = True) -> dict:
    """BASELINE.json metric: Gibbs chain throughput with all state
    resident in HBM (defaults = the flagship joint RBM: 500+32 visibles,
    softmax label group, reference configs yaml:9-11).

    Returns {"chain_steps_per_sec", "cell_updates_per_sec", "elapsed_s"}
    where a chain step is one full v→h→v mean-field iteration over the
    whole batch.
    """
    from multimodal_idbn_tpu.ops import rbm_ops

    key = jax.random.key(seed)
    state = rbm_ops.init_rbm_state(key, num_visible, num_hidden)
    Dz = groups[0][0] if groups else num_visible
    v_known = jnp.zeros((batch_size, num_visible), jnp.float32)
    km = jnp.zeros((batch_size, num_visible), jnp.float32)
    km = km.at[:, :Dz].set(1.0)

    run = jax.jit(lambda k: rbm_ops.conditional_gibbs(
        state, k, v_known, km, n_steps=n_steps, sample_h=False,
        sample_v=False, groups=tuple(tuple(g) for g in groups)))
    if warmup:
        jax.block_until_ready(run(jax.random.fold_in(key, 1)))
    # Median of several dispatches: single timed dispatches through the
    # tunnel wobble several-fold run-to-run (CLAUDE.md measurement rule).
    times = []
    for rep in range(2, 5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.fold_in(key, rep)))
        times.append(time.perf_counter() - t0)
    elapsed = float(np.median(times))
    return {
        "chain_steps_per_sec": n_steps / elapsed,
        "cell_updates_per_sec": n_steps * batch_size * (num_visible
                                                        + num_hidden)
        / elapsed,
        "elapsed_s": elapsed,
    }
