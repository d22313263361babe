"""TXT→IMG reconstruction: how good can it possibly get?

Both the reference and this rebuild score cross_modality/image_mse at
~blank level on the flagship numerosity dataset (benchmarks/RESULTS.md).
This script measures whether that is a model deficiency or an
information bound of the task: given ONLY the label (dot count), the
L2-optimal prediction is the per-class mean image E[x | y], and its MSE
is the per-pixel conditional variance — dots land at random positions,
so most of the pixel variance is simply unpredictable from the label.

Reports (val set):
- blank:       MSE of predicting all-zeros            = E[x²]
- global mean: MSE of predicting the train-set mean   = Var[x] + bias²
- class mean:  MSE of predicting E[x | y] (train est.) ≈ Bayes L2 bound
- headroom:    how far below blank the bound sits — the maximum any
  TXT→IMG decoder (reference or rebuild) could improve.

Usage: python benchmarks/txt2img_bound.py [--n-samples N]
One JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-samples", type=int, default=2048)
    ap.add_argument("--num-classes", type=int, default=32)
    ap.add_argument("--side", type=int, default=100)
    args = ap.parse_args()

    from multimodal_idbn_tpu.data import create_dataloaders_uniform

    train, val, _ = create_dataloaders_uniform(
        batch_size=128, n_samples=args.n_samples,
        num_classes=args.num_classes, side=args.side, seed=0)

    Xtr, ytr = train.materialize()
    Xva, yva = val.materialize()
    Xtr = np.asarray(Xtr, np.float32).reshape(len(Xtr), -1)
    Xva = np.asarray(Xva, np.float32).reshape(len(Xva), -1)
    ytr = np.asarray(ytr)
    yva = np.asarray(yva)
    if ytr.ndim > 1:  # one-hot labels
        ytr, yva = ytr.argmax(axis=1), yva.argmax(axis=1)
    ytr, yva = ytr.astype(int), yva.astype(int)

    blank = float(np.mean(Xva ** 2))
    gmean = Xtr.mean(axis=0)
    global_mse = float(np.mean((Xva - gmean[None]) ** 2))

    cls_mean = np.zeros((args.num_classes, Xtr.shape[1]), np.float32)
    for c in range(args.num_classes):
        m = ytr == c
        if m.any():
            cls_mean[c] = Xtr[m].mean(axis=0)
    class_mse = float(np.mean((Xva - cls_mean[yva]) ** 2))

    # Analytic Bernoulli bound with the TRUE per-(class, pixel) rate would
    # be E[q(1-q)]; the empirical class mean estimates it from finite data.
    result = {
        "metric": "txt2img_l2_bound",
        "blank_mse": round(blank, 5),
        "global_mean_mse": round(global_mse, 5),
        "class_mean_mse_bayes_bound": round(class_mse, 5),
        "headroom_vs_blank_pct": round(100 * (1 - class_mse / blank), 2),
        "n_train": len(Xtr), "n_val": len(Xva),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
