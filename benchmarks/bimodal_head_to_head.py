"""Bimodal head-to-head quality: this rebuild vs the REAL reference code.

Runs /root/reference's own `iMDBN_BiModal` (imdbn_bimodal.py:711
train_joint; iDBN.train for the per-modality pretraining, exactly as
scripts/train_bimodal.py:236-264 wires it) and this repo's
`iMDBN_BiModal` on the SAME synthetic two-modality dataset (numerosity
images + rendered MNIST-100 pairs) with an identical scaled-down
schedule over multiple seeds, and reports the cross-modal reconstruction
MSE distributions side by side (VERDICT r3 item 1: the bimodal half of
the model zoo had zero measured quality numbers).

Both sides see byte-identical train/val arrays; per-seed stochasticity
(init + CD sampling + shuffle + the sample_h=True cross chains) is each
side's own RNG, so the comparison is distribution-vs-distribution.

Usage:
    python benchmarks/bimodal_head_to_head.py                  # 5 seeds
    python benchmarks/bimodal_head_to_head.py --seeds 0 1 2
    python benchmarks/bimodal_head_to_head.py --quick          # smoke
Internal roles (driver subprocesses):
    --role ref|ours --seed N --data D.npz
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = "/root/reference"
sys.path.insert(0, str(REPO))

# Scaled from configs/bimodal_training_config.yaml:12-18 (mod1
# [10000,1500,1500], mod2 [1568,500,500,1000], joint [1500,500]) so the
# torch side finishes in minutes; structure preserved: 3-layer mod1,
# 4-layer mod2 with the real 1568-pixel MNIST-100 input, 2-layer joint,
# warmup 8, aux clamps, per-batch cross metrics.
SCHEDULE = dict(side=40, num_classes=16, n_samples=1024, batch=128,
                mod1_layers=(1600, 400, 128),
                mod2_layers=(1568, 256, 128, 128),
                joint_layers=(128, 64),
                epochs_mod=20, epochs_joint=30, cd=3, joint_cd=3,
                cross_steps=20, aux_cond_steps=10)
QUICK = dict(SCHEDULE, n_samples=256, mod2_layers=(1568, 64, 32),
             epochs_mod=2, epochs_joint=10, cross_steps=5,
             aux_cond_steps=3)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_params(s, seed):
    return {
        "LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
        "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
        "LEARNING_RATE_DYNAMIC": True, "CD": s["cd"],
        "JOINT_CD": s["joint_cd"], "CROSS_GIBBS_STEPS": s["cross_steps"],
        "JOINT_AUX_COND_STEPS": s["aux_cond_steps"], "SEED": seed,
    }


def build_dataset(s, path):
    """One dataset for every run of both sides: numerosity mod1 + paired
    MNIST-100 renders of the same counts (data seed 0, split seed 42)."""
    import numpy as np

    from multimodal_idbn_tpu.data import (generate_numerosity_dataset,
                                          train_val_test_split)
    from multimodal_idbn_tpu.data.numerosity import generate_mnist100_images

    d = generate_numerosity_dataset(n_samples=s["n_samples"],
                                    num_classes=s["num_classes"],
                                    side=s["side"], seed=0)
    labels = d["labels"].astype(np.int64)
    mod2 = generate_mnist100_images(labels, seed=0)
    tr, va, _ = train_val_test_split(s["n_samples"], val_size=0.15,
                                     test_size=0.15, seed=42)
    m1 = d["images"].reshape(len(labels), -1).astype(np.float32)
    m2 = mod2.reshape(len(labels), -1).astype(np.float32)
    np.savez(path, train_m1=m1[tr], train_m2=m2[tr],
             train_lbl=labels[tr], val_m1=m1[va], val_m2=m2[va],
             val_lbl=labels[va])
    log(f"[b2h] dataset: train {len(tr)}, val {len(va)}, mod1 "
        f"{m1.shape[1]}px, mod2 {m2.shape[1]}px, "
        f"{s['num_classes']} classes -> {path}")


# --------------------------------------------------------------------------
# Shared evaluation protocol (mirrors the reference's per-batch cross
# metrics, imdbn_bimodal.py:824-850, computed once on the val set):
# per-pixel MSE of each modality reconstructed FROM the other, plus each
# DBN's auto-reconstruction and the blank baselines mean(v^2).
# --------------------------------------------------------------------------

def eval_metrics_numpy(v1, v2, m1_from_m2, m2_from_m1, rec1, rec2):
    import numpy as np

    n = v1.shape[0]
    out = {
        "mod1_mse": float(((m1_from_m2 - v1) ** 2).sum()
                          / (n * v1.shape[1])),
        "mod2_mse": float(((m2_from_m1 - v2) ** 2).sum()
                          / (n * v2.shape[1])),
        "mod1_auto_mse": float(((np.clip(rec1, 0, 1) - v1) ** 2).mean()),
        "mod2_auto_mse": float(((np.clip(rec2, 0, 1) - v2) ** 2).mean()),
        "mod1_blank": float((v1 ** 2).mean()),
        "mod2_blank": float((v2 ** 2).mean()),
    }
    return {k: round(v, 6) for k, v in out.items()}


# --------------------------------------------------------------------------
# Reference side (torch, real /root/reference code)
# --------------------------------------------------------------------------

def run_reference(s, seed, data_path):
    import types
    for name in ("wandb", "torchvision", "torchvision.utils"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.modules["torchvision.utils"].make_grid = lambda *a, **k: None
    sys.modules["wandb"].Image = object
    sys.path.insert(0, REFERENCE)

    import numpy as np
    import torch
    from imdbn.models.imdbn_bimodal import iMDBN_BiModal as RefBiModal

    d = np.load(data_path)
    torch.manual_seed(seed)
    g = torch.Generator().manual_seed(seed)
    train_ds = torch.utils.data.TensorDataset(
        torch.from_numpy(d["train_m1"]), torch.from_numpy(d["train_m2"]))
    val_ds = torch.utils.data.TensorDataset(
        torch.from_numpy(d["val_m1"]), torch.from_numpy(d["val_m2"]))
    train_loader = torch.utils.data.DataLoader(
        train_ds, batch_size=s["batch"], shuffle=True, generator=g)
    val_loader = torch.utils.data.DataLoader(val_ds,
                                             batch_size=s["batch"])

    model = RefBiModal(list(s["mod1_layers"]), list(s["mod2_layers"]),
                       list(s["joint_layers"]),
                       params=make_params(s, seed),
                       dataloader=train_loader, val_loader=val_loader,
                       device=torch.device("cpu"))

    # Per-modality pretraining exactly like scripts/train_bimodal.py:236
    def mod_loader(col, gseed):
        ds = torch.utils.data.TensorDataset(
            torch.from_numpy(d[col]),
            torch.from_numpy(d["train_lbl"]))
        return torch.utils.data.DataLoader(
            ds, batch_size=s["batch"], shuffle=True,
            generator=torch.Generator().manual_seed(gseed))

    t0 = time.time()
    model.mod1_dbn.dataloader = mod_loader("train_m1", seed)
    model.mod1_dbn.train(epochs=s["epochs_mod"])
    model.mod2_dbn.dataloader = mod_loader("train_m2", seed + 1)
    model.mod2_dbn.train(epochs=s["epochs_mod"])
    t_pre = time.time() - t0
    model.train_joint(epochs=s["epochs_joint"])
    t_all = time.time() - t0
    log(f"[b2h ref seed {seed}] trained in {t_all:.0f}s (pre {t_pre:.0f}s)")

    v1s, v2s, c1s, c2s, r1s, r2s = [], [], [], [], [], []
    with torch.no_grad():
        for m1, m2 in val_loader:
            v1 = m1.view(m1.size(0), -1).float()
            v2 = m2.view(m2.size(0), -1).float()
            z1 = model.mod1_dbn.represent(v1)
            z2 = model.mod2_dbn.represent(v2)
            c1, c2 = model._cross_reconstruct(z1, z2,
                                              steps=s["cross_steps"])
            v1s.append(v1.numpy()); v2s.append(v2.numpy())
            c1s.append(c1.view(v1.shape).numpy())
            c2s.append(c2.view(v2.shape).numpy())
            r1s.append(model.mod1_dbn.reconstruct(v1).numpy())
            r2s.append(model.mod2_dbn.reconstruct(v2).numpy())
    import numpy as np
    out = eval_metrics_numpy(
        np.concatenate(v1s), np.concatenate(v2s), np.concatenate(c1s),
        np.concatenate(c2s), np.concatenate(r1s), np.concatenate(r2s))
    out["train_s"] = round(t_all, 1)
    return out


# --------------------------------------------------------------------------
# This repo's side (forced CPU so seeds time-share off the single TPU)
# --------------------------------------------------------------------------

def run_ours(s, seed, data_path):
    import jax
    jax.config.update("jax_platforms", "cpu")  # before backend init

    import numpy as np

    from multimodal_idbn_tpu.data import DataLoader, NumerosityDataset, Subset
    from multimodal_idbn_tpu.models import iMDBN_BiModal

    d = np.load(data_path)

    def to_ds(m1, m2, lbl, mode):
        n = m1.shape[0]
        side = int(round(m1.shape[1] ** 0.5))
        onehot = np.eye(int(d["train_lbl"].max()) + 1,
                        dtype=np.float32)[lbl][:, 1:]
        return NumerosityDataset(
            m1.reshape(n, side, side), lbl.astype(np.float32), onehot,
            m1.sum(1), np.maximum(m1.sum(1), 1.0),
            mod2_images=m2.reshape(n, 28, 56), mode=mode)

    tr = to_ds(d["train_m1"], d["train_m2"], d["train_lbl"], "bimodal")
    va = to_ds(d["val_m1"], d["val_m2"], d["val_lbl"], "bimodal")
    train_loader = DataLoader(Subset(tr, np.arange(len(tr.labels))),
                              batch_size=s["batch"], shuffle=True,
                              seed=seed)
    val_loader = DataLoader(Subset(va, np.arange(len(va.labels))),
                            batch_size=s["batch"])

    model = iMDBN_BiModal(list(s["mod1_layers"]), list(s["mod2_layers"]),
                          list(s["joint_layers"]),
                          params=make_params(s, seed),
                          dataloader=train_loader, val_loader=val_loader,
                          seed=seed)

    # Per-modality pretraining (same wiring as the reference script /
    # tests/test_bimodal.py): single-modality loaders over the train set.
    # "multimodal" mode yields (mod1_img, onehot); "mod2" mode yields
    # (mod2_img, onehot) — iDBN.train ignores the second element.
    labels = np.asarray(tr.labels, np.float32)
    cum = np.asarray(tr.cumArea_list)
    ch = np.asarray(tr.CH_list)
    m1ds = NumerosityDataset(tr.images, labels, tr.onehot, cum, ch)
    m2ds = NumerosityDataset(tr.images, labels, tr.onehot, cum, ch,
                             mod2_images=tr.mod2_images, mode="mod2")
    model.mod1_dbn.dataloader = DataLoader(m1ds, batch_size=s["batch"],
                                           shuffle=True, seed=seed)
    model.mod2_dbn.dataloader = DataLoader(m2ds, batch_size=s["batch"],
                                           shuffle=True, seed=seed + 1)
    t0 = time.time()
    model.mod1_dbn.train(epochs=s["epochs_mod"], log_every_pca=10**9,
                         log_every_probe=10**9)
    model.mod2_dbn.train(epochs=s["epochs_mod"], log_every_pca=10**9,
                         log_every_probe=10**9)
    t_pre = time.time() - t0
    model.train_joint(epochs=s["epochs_joint"])
    t_all = time.time() - t0
    log(f"[b2h ours seed {seed}] trained in {t_all:.0f}s (pre {t_pre:.0f}s)")

    v1s, v2s, c1s, c2s, r1s, r2s = [], [], [], [], [], []
    for m1, m2 in val_loader:
        v1 = np.asarray(m1, np.float32).reshape(len(m1), -1)
        v2 = np.asarray(m2, np.float32).reshape(len(m2), -1)
        z1 = np.asarray(model.mod1_dbn.represent(v1))
        z2 = np.asarray(model.mod2_dbn.represent(v2))
        c1, c2 = model._cross_reconstruct(z1, z2, steps=s["cross_steps"])
        v1s.append(v1); v2s.append(v2)
        c1s.append(np.asarray(c1).reshape(v1.shape))
        c2s.append(np.asarray(c2).reshape(v2.shape))
        r1s.append(np.asarray(model.mod1_dbn.reconstruct(v1)))
        r2s.append(np.asarray(model.mod2_dbn.reconstruct(v2)))
    out = eval_metrics_numpy(
        np.concatenate(v1s), np.concatenate(v2s), np.concatenate(c1s),
        np.concatenate(c2s), np.concatenate(r1s), np.concatenate(r2s))
    out["train_s"] = round(t_all, 1)
    return out


# --------------------------------------------------------------------------
# Driver
# --------------------------------------------------------------------------

def _spawn(role, seed, data_path, quick, outdir):
    args = [sys.executable, __file__, "--role", role, "--seed", str(seed),
            "--data", str(data_path)]
    if quick:
        args.append("--quick")
    out = open(os.path.join(outdir, f"{role}_{seed}.log"), "w")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache")
    return subprocess.Popen(args, stdout=subprocess.PIPE, stderr=out,
                            cwd=outdir, env=env, text=True)


def summarize(vals):
    import numpy as np
    v = np.asarray(vals, np.float64)
    return f"{np.median(v):.4f} [{v.min():.4f}-{v.max():.4f}]"


METRICS = ("mod1_mse", "mod2_mse", "mod1_auto_mse", "mod2_auto_mse",
           "mod1_blank", "mod2_blank")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=["driver", "ref", "ours"],
                    default="driver")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, nargs="*",
                    default=[0, 1, 2, 3, 4])
    ap.add_argument("--data", type=str, default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--jobs", type=int, default=4,
                    help="max concurrent subprocesses")
    args = ap.parse_args()
    s = QUICK if args.quick else SCHEDULE

    if args.role != "driver":
        fn = run_reference if args.role == "ref" else run_ours
        print(json.dumps(fn(s, args.seed, args.data)))
        return

    import tempfile
    outdir = tempfile.mkdtemp(prefix="b2h_")
    data_path = os.path.join(outdir, "dataset.npz")
    build_dataset(s, data_path)

    jobs = [(role, seed) for seed in args.seeds
            for role in ("ref", "ours")]
    results = {"ref": {}, "ours": {}}
    pending = list(jobs)
    running = []
    while pending or running:
        while pending and len(running) < args.jobs:
            role, seed = pending.pop(0)
            log(f"[b2h] launching {role} seed {seed}")
            running.append((role, seed,
                            _spawn(role, seed, data_path, args.quick,
                                   outdir)))
        for role, seed, proc in running[:]:
            if proc.poll() is not None:
                running.remove((role, seed, proc))
                out = proc.stdout.read().strip()
                if proc.returncode != 0 or not out:
                    log(f"[b2h] {role} seed {seed} FAILED rc="
                        f"{proc.returncode} (log in {outdir})")
                    results[role][seed] = None
                else:
                    results[role][seed] = json.loads(out.splitlines()[-1])
                    log(f"[b2h] {role} seed {seed}: "
                        f"{results[role][seed]}")
        time.sleep(2)

    table = {}
    for metric in METRICS:
        for role in ("ref", "ours"):
            vals = [r[metric] for r in results[role].values() if r]
            if vals:
                table[f"{role}_{metric}"] = summarize(vals)
    log("\n| metric | reference (torch) | rebuild (jax) |")
    log("|---|---|---|")
    for metric in METRICS:
        log(f"| {metric} | {table.get('ref_' + metric, '-')} | "
            f"{table.get('ours_' + metric, '-')} |")
    print(json.dumps({"schedule": {k: (list(v) if isinstance(v, tuple)
                                       else v) for k, v in s.items()},
                      "seeds": args.seeds,
                      "ref": results["ref"], "ours": results["ours"],
                      "summary": table}))


if __name__ == "__main__":
    main()
