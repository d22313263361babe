"""Throughput studies beyond the reference's fixed batch-128 schedule.

1. Batch scaling: the flagship CD-1 epoch is HBM-bound at batch 128
   (bench.py: ~94% roofline, MFU 17%) because every CD update streams
   W once per GEMM. Larger batches raise arithmetic intensity (same W
   traffic, more rows) — this measures epoch time / samples-per-second /
   implied MFU as batch grows. Training-semantics note: bigger batches
   mean fewer updates per epoch (different optimization trajectory), so
   this is a THROUGHPUT characterization, not a drop-in replacement for
   the reference schedule (reference rbm.py:181-227 hot loop).

2. Inference serving: post-training cross-modal inference throughput —
   `represent` (deterministic encoder), `img2txt` (conditional Gibbs,
   z clamped), `txt2img` (annealed noisy mean-field + decode) — at
   serving-style batch sizes (reference flow imdbn.py:387-488).

Usage: python benchmarks/throughput_study.py [--quick]
Appends nothing; prints a markdown table to stdout (record in
RESULTS.md).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


LAYERS = (10000, 1500, 500)
K = 32
N = 4096


def median_time(fn, *args, per=10, groups=3, sync=None):
    """Median per-call wall time over `groups` groups of `per` calls."""
    out = fn(*args)
    (sync or (lambda o: jax.tree.map(lambda x: x.block_until_ready(), o)))(out)
    times = []
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(per):
            out = fn(*args)
        (sync or (lambda o: jax.tree.map(
            lambda x: x.block_until_ready(), o)))(out)
        times.append((time.perf_counter() - t0) / per)
    return sorted(times)[len(times) // 2]


def batch_scaling(quick=False):
    from multimodal_idbn_tpu.ops import dbn_train, rbm_ops

    rng = np.random.RandomState(0)
    data = jnp.asarray((rng.rand(N, LAYERS[0]) < 0.12).astype(np.float32))
    keys = jax.random.split(jax.random.key(0), 3)
    # FLOP per CD-1 update ≈ 3 GEMMs fwd/bwd chain + 2 assoc GEMMs = 5
    # matmuls of B x V x H per layer (SURVEY.md §6 loop A).
    flop_per_sample = sum(2 * 5 * LAYERS[i] * LAYERS[i + 1]
                          for i in range(2))
    rows = []
    for bs in ([128, 512] if quick else [128, 256, 512, 1024, 2048]):
        states = tuple(rbm_ops.init_rbm_state(keys[i], LAYERS[i],
                                              LAYERS[i + 1])
                       for i in range(2))

        def epoch(states, e, bs=bs):
            return dbn_train.idbn_epoch(
                states, jax.random.fold_in(keys[-1], e), data, 0.1, 0.5,
                1e-4, 0.1, cd=1, sparsity_flags=(False, True),
                batch_size=bs)

        t0 = time.perf_counter()
        states, l = epoch(states, 0)
        float(l[-1, -1])
        log(f"  bs={bs} compile {time.perf_counter() - t0:.1f}s")
        e_holder = [1]

        def run(states):
            s, l = epoch(states, e_holder[0])
            e_holder[0] += 1
            return s, l

        t = median_time(run, states, per=5, groups=3,
                        sync=lambda o: float(o[1][-1, -1]))
        sps = N // bs * bs / t
        tflops = sps * flop_per_sample / 1e12
        rows.append((bs, t * 1e3, sps, tflops))
        log(f"  bs={bs}: {t*1e3:.2f} ms/epoch, {sps/1e3:.1f}k samples/s, "
            f"{tflops:.1f} TFLOP/s")
    print("\n### Batch-scaling (flagship CD-1 epoch, N=4096)\n")
    print("| batch | epoch | samples/s | implied TFLOP/s (bf16 peak 197) |")
    print("|---|---|---|---|")
    for bs, ms, sps, tf in rows:
        print(f"| {bs} | {ms:.1f} ms | {sps/1e3:.0f}k | {tf:.1f} |")


def inference_serving(quick=False):
    from multimodal_idbn_tpu.models import iMDBN

    class Loader:
        batch_size = 128

        def materialize(self):
            rng = np.random.RandomState(1)
            return ((rng.rand(256, LAYERS[0]) < 0.12).astype(np.float32),
                    np.eye(K, dtype=np.float32)[
                        rng.randint(0, K, 256)])

    params = {"LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
              "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
              "LEARNING_RATE_DYNAMIC": True, "CD": 1,
              "CROSS_GIBBS_STEPS": 50, "SEED": 0}
    model = iMDBN(layer_sizes_img=list(LAYERS), joint_layer_size=500,
                  params=params, dataloader=Loader(), val_loader=Loader(),
                  num_labels=K, seed=0)
    rng = np.random.RandomState(2)
    rows = []
    for bs in ([32] if quick else [1, 32, 256]):
        imgs = jnp.asarray((rng.rand(bs, LAYERS[0]) < 0.12)
                           .astype(np.float32))
        lbls = np.eye(K, dtype=np.float32)[rng.randint(0, K, bs)]

        t_rep = median_time(model.image_idbn.represent, imgs, per=10)
        t_i2t = median_time(model.img2txt, imgs, per=5)
        t_t2i = median_time(model.txt2img, lbls, per=5)
        rows.append((bs, t_rep, t_i2t, t_t2i))
        log(f"  bs={bs}: represent {t_rep*1e3:.2f} ms, img2txt "
            f"{t_i2t*1e3:.2f} ms, txt2img {t_t2i*1e3:.2f} ms")
    print("\n### Cross-modal inference serving (flagship shapes, 50 Gibbs "
          "steps)\n")
    print("| batch | represent | img2txt (50 steps) | txt2img "
          "(anneal+decode) | img2txt samples/s |")
    print("|---|---|---|---|---|")
    for bs, tr, ti, tt in rows:
        print(f"| {bs} | {tr*1e3:.2f} ms | {ti*1e3:.1f} ms | "
              f"{tt*1e3:.1f} ms | {bs/ti:.0f} |")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    log(f"backend: {jax.default_backend()}")
    batch_scaling(args.quick)
    inference_serving(args.quick)
