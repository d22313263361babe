"""Head-to-head quality: this rebuild vs the REAL reference torch code.

Runs the actual reference package (/root/reference: iDBN.train at
idbn.py:179, iMDBN.train_joint at imdbn.py:508) and this repo's iMDBN on
the SAME synthetic numerosity dataset with an IDENTICAL scaled-down
schedule, over multiple seeds, and reports the cross-modal quality
distributions side by side (VERDICT r1 item 2: converts "oracle-pinned
semantics" into measured output parity).

Both sides see byte-identical train/val arrays (written to one npz by the
driver); per-seed stochasticity (init + CD sampling + shuffle order) is
each side's own RNG, so the comparison is distribution-vs-distribution.

Usage:
    python benchmarks/reference_head_to_head.py                  # 5 seeds
    python benchmarks/reference_head_to_head.py --seeds 0 1 2    # subset
    python benchmarks/reference_head_to_head.py --quick          # smoke

Prints one JSON dict at the end; a markdown table on stderr.
Internal roles (used by the driver via subprocess):
    --role ref  --seed N --data D.npz   # reference torch side
    --role ours --seed N --data D.npz   # this repo (forced CPU)
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

# Identical schedule on both sides (scaled from the flagship so the torch
# side finishes in minutes; ratios preserved: CD>1, warmup 8, aux clamps,
# per-batch cross metrics).
SCHEDULE = dict(side=40, num_classes=16, n_samples=1024, batch=128,
                layers=(1600, 400, 128), joint_hidden=128,
                epochs_img=30, epochs_joint=30, cd=3, joint_cd=3,
                cross_steps=20, aux_cond_steps=10)
QUICK = dict(SCHEDULE, n_samples=256, epochs_img=4, epochs_joint=10,
             cross_steps=5, aux_cond_steps=3)
# The REAL flagship schedule (configs/multimodal_training_config.yaml:9-34
# + quality_multimodal.py): strong-signal regime where the rebuild reaches
# top1 >= 0.5. One torch seed ≈ 1 h on this CPU (measured:
# benchmarks/ref_flagship_timing.py — image epoch 18.5 s, joint 7-14 s).
FLAGSHIP = dict(side=100, num_classes=32, n_samples=2048, batch=128,
                layers=(10000, 1500, 500), joint_hidden=500,
                epochs_img=100, epochs_joint=150, cd=10, joint_cd=5,
                cross_steps=50, aux_cond_steps=30, joint_lr=0.04)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_params(s, seed):
    return {
        "LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
        "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
        "LEARNING_RATE_DYNAMIC": True, "CD": s["cd"],
        # flagship config pins joint lr 0.04 (multimodal_training_config
        # .yaml:24); the scaled schedules keep the r2 legacy lr=0.1
        "JOINT_LEARNING_RATE": s.get("joint_lr", 0.1),
        "JOINT_CD": s["joint_cd"], "CROSS_GIBBS_STEPS": s["cross_steps"],
        "JOINT_AUX_COND_STEPS": s["aux_cond_steps"], "SEED": seed,
    }


def build_dataset(s, path):
    """One dataset for every run of both sides (data seed fixed at 0;
    split seed 42 like the loader contract, SURVEY.md §2.3)."""
    import numpy as np

    from multimodal_idbn_tpu.data import (generate_numerosity_dataset,
                                          train_val_test_split)

    d = generate_numerosity_dataset(n_samples=s["n_samples"],
                                    num_classes=s["num_classes"],
                                    side=s["side"], seed=0)
    tr, va, _ = train_val_test_split(s["n_samples"], val_size=0.15,
                                     test_size=0.15, seed=42)
    img = d["images"].reshape(len(d["images"]), -1).astype(np.float32)
    y = d["onehot"].astype(np.float32)
    np.savez(path, train_img=img[tr], train_y=y[tr],
             val_img=img[va], val_y=y[va])
    log(f"[h2h] dataset: train {len(tr)}, val {len(va)}, "
        f"{img.shape[1]} pixels, {y.shape[1]} classes -> {path}")


# --------------------------------------------------------------------------
# Shared evaluation protocol (mirrors the reference's per-batch cross
# metrics, imdbn.py:613-639, computed once on the val set after training).
# --------------------------------------------------------------------------

def probe_metrics(z, h_joint, y, img):
    """Linear-probe accuracies on both sides' embeddings with ONE shared
    protocol mirroring the reference's log_linear_probe /
    log_joint_linear_probe (probe_utils.py:344,:435): 5-bin quantile
    targets (make_bin_labels :141), stratified split seed 42 (:170),
    full-batch AdamW+CE linear classifier with patience 20 (:195-263).
    The probe code is identical for the torch and jax sides (this repo's
    oracle-matched utils, forced CPU), so accuracy differences isolate
    embedding quality (VERDICT r3 item 4)."""
    import numpy as np

    from multimodal_idbn_tpu.utils.probe_utils import (
        make_bin_labels, stratified_split, train_linear_classifier)

    feats = {"labels": y.argmax(1).astype(np.float32) + 1,
             "area": img.sum(1)}
    out = {}
    for emb_name, E in (("top", z), ("joint", h_joint)):
        if E is None:
            continue
        for feat_name, vals in feats.items():
            yb, _ = make_bin_labels(vals, n_bins=5)
            tr, te = stratified_split(yb, test_size=0.2, rng_seed=42)
            acc, _, _ = train_linear_classifier(
                E[tr], yb[tr], E[te], yb[te], n_classes=5)
            out[f"probe_{emb_name}_{feat_name}"] = round(float(acc), 4)
    return out


def eval_metrics_numpy(z, y, p_y, img_from_txt, img, rec):
    import numpy as np

    n, npix = img.shape
    gt = y.argmax(1)
    pred = p_y.argmax(1)
    top1 = float((pred == gt).mean())
    k = min(3, p_y.shape[1])
    topk = np.argsort(-p_y, axis=1)[:, :k]
    top3 = float((topk == gt[:, None]).any(1).mean())
    p = np.clip(p_y, 1e-6, 1 - 1e-6)
    onehot = np.eye(p_y.shape[1], dtype=np.float32)[gt]
    ce = float(-(onehot * np.log(p)
                 + (1 - onehot) * np.log(1 - p)).sum() / n)
    image_mse = float(((img_from_txt - img) ** 2).sum() / (n * npix))
    recon_mse = float(((np.clip(rec, 0, 1) - img) ** 2).mean())
    return {"top1": round(top1, 4), "top3": round(top3, 4),
            "ce": round(ce, 4), "image_mse": round(image_mse, 6),
            "recon_mse": round(recon_mse, 6)}


# --------------------------------------------------------------------------
# Reference side (torch, real /root/reference code)
# --------------------------------------------------------------------------

def run_reference(s, seed, data_path):
    # The probe protocol uses this repo's jax-based utils; keep that off
    # the TPU (must run before jax backend init).
    import jax
    jax.config.update("jax_platforms", "cpu")

    # wandb/torchvision are not installed in this image; stub them (only
    # diagnostics paths touch them, and wandb_run=None skips those).
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
    from imdbn.models.imdbn import iMDBN as RefIMDBN

    d = np.load(data_path)
    torch.manual_seed(seed)
    g = torch.Generator().manual_seed(seed)
    train_ds = torch.utils.data.TensorDataset(
        torch.from_numpy(d["train_img"]), torch.from_numpy(d["train_y"]))
    val_ds = torch.utils.data.TensorDataset(
        torch.from_numpy(d["val_img"]), torch.from_numpy(d["val_y"]))
    train_loader = torch.utils.data.DataLoader(
        train_ds, batch_size=s["batch"], shuffle=True, generator=g)
    val_loader = torch.utils.data.DataLoader(val_ds,
                                             batch_size=s["batch"])

    model = RefIMDBN(list(s["layers"]), s["joint_hidden"],
                     params=make_params(s, seed), dataloader=train_loader,
                     val_loader=val_loader,
                     device=torch.device("cpu"),
                     num_labels=d["train_y"].shape[1])
    t0 = time.time()
    model.image_idbn.train(epochs=s["epochs_img"])
    t_img = time.time() - t0
    model.train_joint(epochs=s["epochs_joint"])
    t_all = time.time() - t0
    log(f"[h2h ref seed {seed}] trained in {t_all:.0f}s (img {t_img:.0f}s)")

    import numpy as np

    def evaluate(loader, probes):
        zs, ys, ps, ifs, imgs, recs, hs = [], [], [], [], [], [], []
        with torch.no_grad():
            for img, y in loader:
                img = img.view(img.size(0), -1).float()
                z = model.image_idbn.represent(img)
                img_ft, p_y = model._cross_reconstruct(z, y.float())
                rec = model.image_idbn.reconstruct(img)
                h = model.joint_rbm.forward(
                    torch.cat([z, y.float()], dim=1))
                zs.append(z.numpy()); ys.append(y.numpy())
                ps.append(p_y.numpy()); ifs.append(img_ft.numpy())
                imgs.append(img.numpy()); recs.append(rec.numpy())
                hs.append(h.numpy())
        out = eval_metrics_numpy(
            np.concatenate(zs), np.concatenate(ys), np.concatenate(ps),
            np.concatenate(ifs), np.concatenate(imgs),
            np.concatenate(recs))
        if probes:
            out.update(probe_metrics(
                np.concatenate(zs), np.concatenate(hs),
                np.concatenate(ys), np.concatenate(imgs)))
        return out

    out = evaluate(val_loader, probes=True)
    # Train-set metrics: the regime the reference's own per-batch
    # cross_modality/* logging measures (imdbn.py:613-659) — frozen
    # final weights instead of the evolving last epoch.
    train_eval_loader = torch.utils.data.DataLoader(
        train_ds, batch_size=s["batch"])
    out.update({f"train_{k}": v
                for k, v in evaluate(train_eval_loader,
                                     probes=False).items()})
    out["train_s"] = round(t_all, 1)
    return out


# --------------------------------------------------------------------------
# This repo's side (forced CPU so seeds parallelize off the single TPU;
# the jnp semantics are device-independent and the TPU path is covered by
# bench.py + benchmarks/quality_multimodal.py)
# --------------------------------------------------------------------------

def run_ours(s, seed, data_path, tpu=False, init_retry=0,
             matmul_precision=None, ckpt_dir=None):
    import jax
    if not tpu:
        jax.config.update("jax_platforms", "cpu")  # before backend init
    if matmul_precision:
        # TPU default executes f32 GEMMs at bf16 input precision; the
        # torch reference is true f32 (rbm.py:181-227). "highest" matches
        # its numerics (config.set_matmul_precision; VERDICT r3 weak #1).
        jax.config.update("jax_default_matmul_precision", matmul_precision)

    import numpy as np

    from multimodal_idbn_tpu.data import (DataLoader, NumerosityDataset,
                                          Subset)
    from multimodal_idbn_tpu.models import iMDBN

    d = np.load(data_path)

    def to_ds(img, y):
        n, npix = img.shape
        side = int(round(npix ** 0.5))
        labels = y.argmax(1).astype(np.float32) + 1
        return NumerosityDataset(img.reshape(n, side, side), labels, y,
                                 img.sum(1), np.maximum(img.sum(1), 1.0))

    tr = to_ds(d["train_img"], d["train_y"])
    va = to_ds(d["val_img"], d["val_y"])
    train_loader = DataLoader(Subset(tr, np.arange(len(tr.labels))),
                              batch_size=s["batch"], shuffle=True,
                              seed=seed)
    val_loader = DataLoader(Subset(va, np.arange(len(va.labels))),
                            batch_size=s["batch"])

    model = iMDBN(list(s["layers"]), s["joint_hidden"],
                  params=make_params(s, seed), dataloader=train_loader,
                  val_loader=val_loader, num_labels=d["train_y"].shape[1],
                  seed=seed)
    # Crash-safe resume (ckpt_dir set by the driver for TPU seeds): the
    # axon tunnel's backend connection drops every ~25 min of sustained
    # occupancy and reconnects unreliably, so long (highest-precision)
    # seeds checkpoint every few epochs and the driver relaunches a
    # crashed subprocess — the run resumes bit-identically
    # (checkpoint/__init__.py; the resume-parity tests are the proof).
    image_start = joint_start = 0
    image_done = False
    img_kw, joint_kw = {}, {}
    if ckpt_dir:
        from pathlib import Path

        from multimodal_idbn_tpu.checkpoint import (
            load_train_checkpoint_expecting)
        ckd = Path(ckpt_dir)
        ckd.mkdir(parents=True, exist_ok=True)
        img_ck, joint_ck = ckd / "image.ckpt.npz", ckd / "joint.ckpt.npz"
        if joint_ck.exists():
            joint_start = load_train_checkpoint_expecting(
                model, joint_ck, "joint")
            image_done = True
            log(f"[h2h ours seed {seed}] resuming joint at epoch "
                f"{joint_start}")
        elif img_ck.exists():
            image_start = load_train_checkpoint_expecting(
                model.image_idbn, img_ck, "image")
            image_done = image_start >= int(s["epochs_img"])
            log(f"[h2h ours seed {seed}] resuming image at epoch "
                f"{image_start}")
        img_kw = {"checkpoint_every": 10, "checkpoint_path": str(img_ck)}
        joint_kw = {"checkpoint_every": 15,
                    "checkpoint_path": str(joint_ck)}

    log(f"[h2h ours seed {seed}] image phase start "
        f"({s['epochs_img']} epochs CD-{s['cd']})")
    t0 = time.time()
    if image_done:
        pass  # restored past the image phase
    elif init_retry:
        retries = model.image_idbn.train_with_retry(
            epochs=s["epochs_img"], max_retries=init_retry,
            start_epoch=image_start, **img_kw)
        log(f"[h2h ours seed {seed}] init_retry={init_retry}: "
            f"{retries} retries used")
    else:
        model.image_idbn.train(epochs=s["epochs_img"],
                               start_epoch=image_start, **img_kw)
    t_img = time.time() - t0
    log(f"[h2h ours seed {seed}] image phase done in {t_img:.0f}s; "
        f"joint phase start ({s['epochs_joint']} epochs)")
    model.train_joint(epochs=s["epochs_joint"], start_epoch=joint_start,
                      **joint_kw)
    t_all = time.time() - t0
    log(f"[h2h ours seed {seed}] trained in {t_all:.0f}s (img {t_img:.0f}s)")

    from multimodal_idbn_tpu.ops import rbm_ops

    def evaluate(loader, probes):
        zs, ys, ps, ifs, imgs, recs, hs = [], [], [], [], [], [], []
        for img, y in loader:
            img = np.asarray(img, np.float32).reshape(len(img), -1)
            y = np.asarray(y, np.float32)
            z = np.asarray(model.image_idbn.represent(img))
            img_ft, p_y = model._cross_reconstruct(z, y)
            rec = np.asarray(model.image_idbn.reconstruct(img))
            h = np.asarray(rbm_ops.hidden_probs(
                model.joint_rbm.state, np.concatenate([z, y], axis=1)))
            zs.append(z); ys.append(y)
            ps.append(np.asarray(p_y)); ifs.append(np.asarray(img_ft))
            imgs.append(img); recs.append(rec); hs.append(h)
        out = eval_metrics_numpy(
            np.concatenate(zs), np.concatenate(ys), np.concatenate(ps),
            np.concatenate(ifs), np.concatenate(imgs),
            np.concatenate(recs))
        if probes:
            out.update(probe_metrics(
                np.concatenate(zs), np.concatenate(hs),
                np.concatenate(ys), np.concatenate(imgs)))
        return out

    out = evaluate(val_loader, probes=True)
    # Train-set metrics (the reference's per-batch cross_modality/*
    # regime, imdbn.py:613-659) with frozen final weights.
    train_eval_loader = DataLoader(Subset(tr, np.arange(len(tr.labels))),
                                   batch_size=s["batch"])
    out.update({f"train_{k}": v
                for k, v in evaluate(train_eval_loader,
                                     probes=False).items()})
    out["train_s"] = round(t_all, 1)
    return out


# --------------------------------------------------------------------------
# Driver: fan the per-seed runs out as parallel subprocesses
# --------------------------------------------------------------------------

def _spawn(role, seed, data_path, preset, outdir, tpu=False,
           init_retry=0, matmul_precision=None):
    args = [sys.executable, __file__, "--role", role, "--seed", str(seed),
            "--data", str(data_path)]
    if preset:
        args.append(preset)
    if tpu:
        # TPU seeds checkpoint + resume so a dropped axon connection
        # costs a relaunch, not the seed
        args += ["--tpu", "--ckpt-dir",
                 os.path.join(outdir, f"ckpt_ours_{seed}")]
    if init_retry and role == "ours":
        args += ["--init-retry", str(init_retry)]
    if matmul_precision and role == "ours":
        args += ["--matmul-precision", matmul_precision]
    # append mode: a relaunched seed (--seed-retries) must not destroy
    # the previous attempt's crash log
    out = open(os.path.join(outdir, f"{role}_{seed}.log"), "a")
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache")
    if not tpu:
        env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(args, stdout=subprocess.PIPE, stderr=out,
                            cwd=outdir, env=env, text=True)
    out.close()  # the child holds its own dup; don't leak ours
    return proc


def summarize(vals):
    import numpy as np
    v = np.asarray(vals, np.float64)
    return f"{np.median(v):.3f} [{v.min():.3f}-{v.max():.3f}]"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=["driver", "ref", "ours"],
                    default="driver")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, nargs="*",
                    default=[0, 1, 2, 3, 4])
    ap.add_argument("--data", type=str, default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--flagship", action="store_true",
                    help="the REAL flagship schedule (strong-signal "
                         "regime; ~1 h per torch seed)")
    ap.add_argument("--tpu", action="store_true",
                    help="(role=ours) run on the real TPU instead of "
                         "forced CPU")
    ap.add_argument("--roles", nargs="*", default=["ref", "ours"],
                    choices=["ref", "ours"],
                    help="which sides the driver runs")
    ap.add_argument("--ours-tpu", action="store_true",
                    help="driver: run ours-side seeds on the TPU, "
                         "serially (never two TPU processes)")
    ap.add_argument("--jobs", type=int, default=5,
                    help="max concurrent subprocesses")
    ap.add_argument("--init-retry", type=int, default=0,
                    help="(ours side) iDBN.train_with_retry max_retries "
                         "— the documented init-collapse rescue "
                         "(models/idbn.py:400); 0 = reference parity")
    ap.add_argument("--matmul-precision", default=None,
                    choices=["default", "high", "highest"],
                    help="(ours side) jax_default_matmul_precision; "
                         "'highest' = true-f32 GEMMs matching the torch "
                         "reference (TPU default is bf16-input f32)")
    ap.add_argument("--ckpt-dir", default=None,
                    help="(ours role) crash-safe resume checkpoints here "
                         "(the driver sets this for TPU seeds; the axon "
                         "backend connection drops ~every 25 min)")
    ap.add_argument("--seed-retries", type=int, default=8,
                    help="driver: relaunch a failed ours-TPU seed up to "
                         "this many times (resumes from its checkpoint)")
    ap.add_argument("--out", default=None,
                    help="driver: write the (partial) results JSON here "
                         "after EVERY completed seed, so long background "
                         "runs survive interruption")
    args = ap.parse_args()
    s = (FLAGSHIP if args.flagship else QUICK if args.quick
         else SCHEDULE)

    if args.role != "driver":
        if args.role == "ref":
            print(json.dumps(run_reference(s, args.seed, args.data)))
        else:
            print(json.dumps(run_ours(
                s, args.seed, args.data, tpu=args.tpu,
                init_retry=args.init_retry,
                matmul_precision=args.matmul_precision,
                ckpt_dir=args.ckpt_dir)))
        return

    import tempfile
    outdir = tempfile.mkdtemp(prefix="h2h_")
    data_path = os.path.join(outdir, "dataset.npz")
    build_dataset(s, data_path)

    preset = ("--flagship" if args.flagship
              else "--quick" if args.quick else None)
    jobs = [(role, seed) for seed in args.seeds for role in args.roles]
    results = {"ref": {}, "ours": {}}
    attempts = {}
    pending = list(jobs)
    running = []
    tpu_running = [False]  # at most one TPU process at a time

    def is_tpu(role):
        return args.ours_tpu and role == "ours"

    def write_partial(partial):
        """One schema for every snapshot of --out (retry-path and
        completion-path snapshots must never drift apart)."""
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"schedule": s, "seeds": args.seeds,
                           "matmul_precision": args.matmul_precision,
                           "partial": partial,
                           "ref": results["ref"],
                           "ours": results["ours"]}, f)

    while pending or running:
        launched = True
        while pending and len(running) < args.jobs and launched:
            launched = False
            for i, (role, seed) in enumerate(pending):
                if is_tpu(role) and tpu_running[0]:
                    continue
                pending.pop(i)
                log(f"[h2h] launching {role} seed {seed}"
                    + (" (TPU)" if is_tpu(role) else ""))
                if is_tpu(role):
                    tpu_running[0] = True
                running.append((role, seed,
                                _spawn(role, seed, data_path, preset,
                                       outdir, tpu=is_tpu(role),
                                       init_retry=args.init_retry,
                                       matmul_precision=args
                                       .matmul_precision)))
                launched = True
                break
        for role, seed, proc in running[:]:
            if proc.poll() is not None:
                running.remove((role, seed, proc))
                if is_tpu(role):
                    tpu_running[0] = False
                out = proc.stdout.read().strip()
                if proc.returncode != 0 or not out:
                    att = attempts.get((role, seed), 0) + 1
                    attempts[(role, seed)] = att
                    # TPU seeds get the full retry budget (axon drops
                    # ~every 25 min; they resume from checkpoints). CPU
                    # seeds get one relaunch too — a transient death
                    # (OOM under contention) should not permanently
                    # record None (r4 advisor finding).
                    budget = (args.seed_retries if is_tpu(role) else
                              min(1, args.seed_retries))
                    if att <= budget:
                        log(f"[h2h] {role} seed {seed} died rc="
                            f"{proc.returncode} (attempt {att}/"
                            f"{budget}) — relaunching"
                            + (" from its checkpoint" if is_tpu(role)
                               else ""))
                        pending.append((role, seed))
                        write_partial(True)  # keep the partial fresh
                        continue
                    log(f"[h2h] {role} seed {seed} FAILED rc="
                        f"{proc.returncode} (log in {outdir})")
                    results[role][seed] = None
                else:
                    results[role][seed] = json.loads(out.splitlines()[-1])
                    log(f"[h2h] {role} seed {seed}: "
                        f"{results[role][seed]}")
                # survive interruption of long runs
                write_partial(bool(pending or running))
        time.sleep(2)

    metrics = ("top1", "top3", "ce", "image_mse", "recon_mse",
               "train_top1", "train_top3", "train_ce",
               "probe_top_labels", "probe_top_area",
               "probe_joint_labels", "probe_joint_area")
    table = {}
    for metric in metrics:
        for role in ("ref", "ours"):
            vals = [r[metric] for r in results[role].values()
                    if r and metric in r]
            if vals:
                table[f"{role}_{metric}"] = summarize(vals)
    log("\n| metric | reference (torch) | rebuild (jax) |")
    log("|---|---|---|")
    for metric in metrics:
        log(f"| {metric} | {table.get('ref_' + metric, '-')} | "
            f"{table.get('ours_' + metric, '-')} |")
    final = {"schedule": s, "seeds": args.seeds,
             "matmul_precision": args.matmul_precision,
             "ref": results["ref"], "ours": results["ours"],
             "summary": table}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(final, f)
    print(json.dumps(final))


if __name__ == "__main__":
    main()
