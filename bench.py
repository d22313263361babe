"""Benchmark: CD-1 epoch on the flagship [10000, 1500, 500] iDBN.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

- value: steady-state wall-clock per fused on-device training epoch
  (batch 128, N=2048 synthetic samples, CD-1, both layers updated per
  batch — the reference's iterative schedule, SURVEY.md §2.1(8)).
- vs_baseline: speedup over the PyTorch-CPU reference semantics (the
  reference publishes no numbers, SURVEY.md §6, so the denominator is
  measured here: identical math implemented in torch on CPU, timed on a
  few batches and extrapolated to the epoch).

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

LAYERS = (10000, 1500, 500)
BATCH = 128
N_SAMPLES = 2048
CD = 1


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_data(n=N_SAMPLES, v=LAYERS[0], seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, v) < 0.12).astype(np.float32)  # ~dot-image sparsity


def bench_jax():
    import jax
    import jax.numpy as jnp

    from multimodal_idbn_tpu.ops import dbn_train, rbm_ops

    log(f"[bench] jax devices: {jax.devices()}")
    data = jnp.asarray(make_data())
    keys = jax.random.split(jax.random.key(0), len(LAYERS))
    states = tuple(
        rbm_ops.init_rbm_state(keys[i], LAYERS[i], LAYERS[i + 1])
        for i in range(len(LAYERS) - 1))
    kwargs = dict(cd=CD, sparsity_flags=(False, True), batch_size=BATCH)

    def epoch(states, e):
        return dbn_train.idbn_epoch(states, jax.random.fold_in(keys[-1], e),
                                    data, 0.1, 0.5, 1e-4, 0.1, **kwargs)

    t0 = time.perf_counter()
    states, _ = epoch(states, 0)
    jax.block_until_ready(states)
    log(f"[bench] first epoch (compile): {time.perf_counter() - t0:.1f}s")

    # Median over groups: per-dispatch tunnel jitter makes a single
    # 5-epoch average wobble 1-3 ms run-to-run; the median of several
    # groups is stable.
    group, n_groups = 5, 5
    e = 1
    times = []
    for _ in range(n_groups):
        t0 = time.perf_counter()
        for _ in range(group):
            states, losses = epoch(states, e)
            e += 1
        jax.block_until_ready(states)
        times.append((time.perf_counter() - t0) / group)
    dt = float(np.median(times))
    log(f"[bench] steady-state epoch: {dt * 1000:.1f} ms median "
        f"(groups: {[round(t * 1000, 1) for t in times]} ms, "
        f"loss {float(losses.mean()):.4f})")
    return dt


def bench_torch_cpu():
    """Reference-semantics CD-1 epoch on torch CPU (the reference's own
    execution model: per-batch loop, one device), extrapolated from a few
    timed batches."""
    import torch

    torch.manual_seed(0)

    class TorchRBM:
        def __init__(self, v, h):
            self.W = torch.randn(v, h) / (v ** 0.5)
            self.hb = torch.zeros(h)
            self.vb = torch.zeros(v)
            self.W_m = torch.zeros_like(self.W)
            self.hb_m = torch.zeros_like(self.hb)
            self.vb_m = torch.zeros_like(self.vb)

        @torch.no_grad()
        def train_epoch(self, data, lr=0.1, mom=0.5, wd=1e-4, cd=CD):
            bsz = data.size(0)
            pos_h = torch.sigmoid(data @ self.W + self.hb)
            pos_assoc = data.T @ pos_h
            h = (pos_h > torch.rand_like(pos_h)).float()
            for _ in range(cd):
                v_prob = torch.sigmoid(h @ self.W.T + self.vb)
                v = (v_prob > torch.rand_like(v_prob)).float()
                h_prob = torch.sigmoid(v @ self.W + self.hb)
                h = (h_prob > torch.rand_like(h_prob)).float()
            neg_assoc = v.T @ h_prob
            self.W_m.mul_(mom).add_(lr * ((pos_assoc - neg_assoc) / bsz
                                          - wd * self.W))
            self.W.add_(self.W_m)
            self.hb_m.mul_(mom).add_(lr * (pos_h.sum(0)
                                           - h_prob.sum(0)) / bsz)
            self.hb.add_(self.hb_m)
            self.vb_m.mul_(mom).add_(lr * (data.sum(0) - v.sum(0)) / bsz)
            self.vb.add_(self.vb_m)
            return torch.sigmoid(data @ self.W + self.hb)

    rbms = [TorchRBM(LAYERS[i], LAYERS[i + 1])
            for i in range(len(LAYERS) - 1)]
    data = torch.from_numpy(make_data())
    nb = N_SAMPLES // BATCH

    def one_batch(b):
        v = data[b * BATCH:(b + 1) * BATCH]
        for rbm in rbms:
            v = rbm.train_epoch(v)
        return v

    one_batch(0)  # warm caches
    n_timed = 3
    t0 = time.perf_counter()
    for b in range(1, 1 + n_timed):
        one_batch(b)
    per_batch = (time.perf_counter() - t0) / n_timed
    epoch_s = per_batch * nb
    log(f"[bench] torch-CPU per-batch {per_batch * 1000:.0f} ms -> "
        f"epoch {epoch_s:.2f}s ({nb} batches)")
    return epoch_s


def bench_gibbs_chains():
    """Secondary BASELINE metric: HBM-resident joint-chain throughput
    (flagship joint RBM 500+32→500, batch 128, softmax label group)."""
    from multimodal_idbn_tpu.utils.profiling import measure_gibbs_steps_per_sec

    stats = measure_gibbs_steps_per_sec(num_visible=532, num_hidden=500,
                                        batch_size=128, n_steps=500)
    log(f"[bench] joint Gibbs chain: "
        f"{stats['chain_steps_per_sec']:.0f} chain-steps/s "
        f"({stats['cell_updates_per_sec']:.3e} cell updates/s)")
    return stats


def main():
    # Primary metric first: a missing/broken torch must not prevent the
    # JSON line (torch is the optional baseline denominator, not a dep).
    jax_epoch = bench_jax()
    try:
        torch_epoch = bench_torch_cpu()
        vs_baseline = round(torch_epoch / jax_epoch, 2)
    except Exception as e:  # pragma: no cover - env-dependent
        log(f"[bench] torch-CPU baseline unavailable: {e}")
        vs_baseline = None
    bench_gibbs_chains()
    result = {
        "metric": "idbn_cd1_epoch_time_10000-1500-500_b128",
        "value": round(jax_epoch, 4),
        "unit": "s",
        "vs_baseline": vs_baseline,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
