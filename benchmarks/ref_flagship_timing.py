"""Measure the REAL reference's per-epoch cost at flagship scale (torch
CPU) to budget the strong-regime head-to-head (VERDICT r3 item 2).

Times ONE image-iDBN epoch ([10000,1500,500], CD-10, batch 128) and ONE
joint epoch (500+32 -> 500, CD-5, cross_steps=50, aux_cond_steps=30,
per-batch cross metrics) of /root/reference's own code
(idbn.py:179, imdbn.py:508) on the synthetic numerosity dataset, then
extrapolates the full 100+150-epoch schedule.

Usage: python benchmarks/ref_flagship_timing.py [--n-samples 2048]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

for name in ("wandb", "torchvision", "torchvision.utils"):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
sys.modules["torchvision.utils"].make_grid = lambda *a, **k: None
sys.modules["wandb"].Image = object
sys.path.insert(0, "/root/reference")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-samples", type=int, default=2048)
    args = ap.parse_args()

    import numpy as np
    import torch

    from multimodal_idbn_tpu.data import (generate_numerosity_dataset,
                                          train_val_test_split)
    from imdbn.models.imdbn import iMDBN as RefIMDBN

    d = generate_numerosity_dataset(n_samples=args.n_samples,
                                    num_classes=32, side=100, seed=0)
    tr, va, _ = train_val_test_split(args.n_samples, val_size=0.15,
                                     test_size=0.15, seed=42)
    img = d["images"].reshape(len(d["images"]), -1).astype(np.float32)
    y = d["onehot"].astype(np.float32)

    torch.manual_seed(0)
    g = torch.Generator().manual_seed(0)
    train_ds = torch.utils.data.TensorDataset(
        torch.from_numpy(img[tr]), torch.from_numpy(y[tr]))
    val_ds = torch.utils.data.TensorDataset(
        torch.from_numpy(img[va]), torch.from_numpy(y[va]))
    train_loader = torch.utils.data.DataLoader(
        train_ds, batch_size=128, shuffle=True, generator=g)
    val_loader = torch.utils.data.DataLoader(val_ds, batch_size=128)

    params = {
        "LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
        "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
        "LEARNING_RATE_DYNAMIC": True, "CD": 10, "JOINT_CD": 5,
        "JOINT_LEARNING_RATE": 0.04, "CROSS_GIBBS_STEPS": 50,
        "JOINT_AUX_COND_STEPS": 30, "SEED": 0,
    }
    model = RefIMDBN([10000, 1500, 500], 500, params=params,
                     dataloader=train_loader, val_loader=val_loader,
                     device=torch.device("cpu"), num_labels=32)

    t0 = time.time()
    model.image_idbn.train(epochs=1)
    t_img = time.time() - t0
    log(f"[timing] one flagship image epoch: {t_img:.1f}s")

    t0 = time.time()
    model.train_joint(epochs=1)
    t_joint_warm = time.time() - t0  # epoch 0 = warmup epoch (2x clamped)
    log(f"[timing] one flagship joint epoch (warmup-style): "
        f"{t_joint_warm:.1f}s")

    out = {
        "img_epoch_s": round(t_img, 1),
        "joint_warmup_epoch_s": round(t_joint_warm, 1),
        "full_100_150_h": round((100 * t_img + 150 * t_joint_warm) / 3600,
                                2),
        "reduced_30_40_h": round((30 * t_img + 40 * t_joint_warm) / 3600,
                                 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
