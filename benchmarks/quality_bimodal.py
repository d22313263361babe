"""Quality benchmark: full flagship BIMODAL training run on the TPU.

Trains the reference's flagship bimodal configuration
(configs/bimodal_training_config.yaml:12-18,20-41: mod1 iDBN
[10000, 1500, 1500] CD-10 x 100 epochs; mod2 iDBN [1568, 500, 500, 1000]
CD-10 x 100 epochs; joint DBN [1500, 500] CD-5 x 150 epochs with
cross_gibbs_steps=50 and JOINT_AUX_COND_STEPS=30) on the synthetic
two-modality dataset (numerosity + paired MNIST-100 renders) and reports
the quality metrics the reference tracks for this family
(imdbn_bimodal.py:846-850): cross_modality/mod1_mse, mod2_mse, plus each
DBN's auto-recon MSE and the blank baselines for context.

Usage: python benchmarks/quality_bimodal.py [--seed N] [--quick] [--cpu]
Prints one JSON dict on stdout; progress on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from multimodal_idbn_tpu.config import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n-samples", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--matmul-precision", default="highest",
                    choices=["default", "high", "highest"],
                    help="XLA f32 matmul precision; 'highest' = true-f32 "
                         "GEMMs matching the torch reference")
    args = ap.parse_args()
    from multimodal_idbn_tpu.config import set_matmul_precision
    set_matmul_precision(args.matmul_precision)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multimodal_idbn_tpu.data import (DataLoader, NumerosityDataset,
                                          Subset,
                                          generate_numerosity_dataset,
                                          train_val_test_split)
    from multimodal_idbn_tpu.data.numerosity import generate_mnist100_images
    from multimodal_idbn_tpu.models import iMDBN_BiModal

    epochs_mod = 10 if args.quick else 100
    epochs_joint = 10 if args.quick else 150

    params = {
        "LEARNING_RATE": 0.1,
        "WEIGHT_PENALTY": 1e-4,
        "INIT_MOMENTUM": 0.5,
        "FINAL_MOMENTUM": 0.95,
        "LEARNING_RATE_DYNAMIC": True,
        "CD": 10,
        "JOINT_LEARNING_RATE": 0.04,
        "JOINT_CD": 5,
        "CROSS_GIBBS_STEPS": 50,
        "JOINT_AUX_COND_STEPS": 30,
        "SEED": args.seed,
    }
    mod1_layers = [10000, 1500, 1500]
    mod2_layers = [1568, 500, 500, 1000]
    joint_layers = [1500, 500]

    log(f"[bimodal] building dataset ({args.n_samples} pairs, "
        f"32 classes)...")
    d = generate_numerosity_dataset(n_samples=args.n_samples,
                                    num_classes=32, side=100, seed=0)
    labels = d["labels"].astype(np.int64)
    mod2 = generate_mnist100_images(labels, seed=0)
    tr_i, va_i, _ = train_val_test_split(args.n_samples, val_size=0.15,
                                         test_size=0.15, seed=42)

    def to_ds(idx, mode="bimodal"):
        return NumerosityDataset(
            d["images"][idx], labels[idx].astype(np.float32),
            d["onehot"][idx], d["images"][idx].sum((1, 2)),
            np.maximum(d["images"][idx].sum((1, 2)), 1.0),
            mod2_images=mod2[idx], mode=mode)

    tr = to_ds(tr_i)
    va = to_ds(va_i)
    train_loader = DataLoader(Subset(tr, np.arange(len(tr_i))),
                              batch_size=128, shuffle=True,
                              seed=args.seed)
    val_loader = DataLoader(Subset(va, np.arange(len(va_i))),
                            batch_size=128)

    model = iMDBN_BiModal(mod1_layers, mod2_layers, joint_layers,
                          params=params, dataloader=train_loader,
                          val_loader=val_loader, seed=args.seed)

    # Per-modality pretraining (scripts/train_bimodal.py wiring)
    m1ds = to_ds(tr_i, mode="multimodal")
    m2ds = to_ds(tr_i, mode="mod2")
    model.mod1_dbn.dataloader = DataLoader(m1ds, batch_size=128,
                                           shuffle=True, seed=args.seed)
    model.mod2_dbn.dataloader = DataLoader(m2ds, batch_size=128,
                                           shuffle=True,
                                           seed=args.seed + 1)
    t0 = time.time()
    log(f"[bimodal] training mod1 iDBN {mod1_layers} "
        f"({epochs_mod} epochs, CD-10)...")
    model.mod1_dbn.train(epochs=epochs_mod, log_every_pca=10**9,
                         log_every_probe=10**9)
    log(f"[bimodal] training mod2 iDBN {mod2_layers} "
        f"({epochs_mod} epochs, CD-10)...")
    model.mod2_dbn.train(epochs=epochs_mod, log_every_pca=10**9,
                         log_every_probe=10**9)
    t_pre = time.time() - t0
    log(f"[bimodal] pretraining: {t_pre:.1f}s")

    log(f"[bimodal] joint training {joint_layers} "
        f"({epochs_joint} epochs, CD-5, cross_steps=50)...")
    t0 = time.time()
    model.train_joint(epochs=epochs_joint, log_every=10**9,
                      log_every_pca=10**9, log_every_probe=10**9,
                      log_every_trajectory=10**9)
    t_joint = time.time() - t0
    log(f"[bimodal] joint: {t_joint:.1f}s")

    # Eval (same protocol as benchmarks/bimodal_head_to_head.py)
    v1s, v2s, c1s, c2s, r1s, r2s = [], [], [], [], [], []
    for m1, m2 in val_loader:
        v1 = np.asarray(m1, np.float32).reshape(len(m1), -1)
        v2 = np.asarray(m2, np.float32).reshape(len(m2), -1)
        z1 = np.asarray(model.mod1_dbn.represent(v1))
        z2 = np.asarray(model.mod2_dbn.represent(v2))
        c1, c2 = model._cross_reconstruct(z1, z2, steps=50)
        v1s.append(v1); v2s.append(v2)
        c1s.append(np.asarray(c1).reshape(v1.shape))
        c2s.append(np.asarray(c2).reshape(v2.shape))
        r1s.append(np.asarray(model.mod1_dbn.reconstruct(v1)))
        r2s.append(np.asarray(model.mod2_dbn.reconstruct(v2)))
    v1 = np.concatenate(v1s); v2 = np.concatenate(v2s)
    c1 = np.concatenate(c1s); c2 = np.concatenate(c2s)
    r1 = np.clip(np.concatenate(r1s), 0, 1)
    r2 = np.clip(np.concatenate(r2s), 0, 1)
    n = v1.shape[0]
    out = {
        "seed": args.seed,
        "mod1_mse": round(float(((c1 - v1) ** 2).sum()
                                / (n * v1.shape[1])), 6),
        "mod2_mse": round(float(((c2 - v2) ** 2).sum()
                                / (n * v2.shape[1])), 6),
        "mod1_auto_mse": round(float(((r1 - v1) ** 2).mean()), 6),
        "mod2_auto_mse": round(float(((r2 - v2) ** 2).mean()), 6),
        "mod1_blank": round(float((v1 ** 2).mean()), 6),
        "mod2_blank": round(float((v2 ** 2).mean()), 6),
        "pretrain_s": round(t_pre, 1),
        "joint_s": round(t_joint, 1),
    }
    log(f"[bimodal] {out}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
