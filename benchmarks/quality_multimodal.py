"""Quality benchmark: full flagship multimodal training run.

Trains the reference's flagship configuration (image iDBN
[10000, 1500, 500] CD-10 for 100 epochs; joint RBM 500+32→500 CD-5 for
150 epochs with cross_gibbs_steps=50 and JOINT_AUX_COND_STEPS=30 —
configs/multimodal_training_config.yaml:9-34) on the synthetic numerosity
dataset and reports the quality metrics the reference tracks
(SURVEY.md §6): cross_modality/text_top1, text_top3, text_ce, image_mse,
idbn auto-recon MSE, and linear-probe accuracies.

Usage: python benchmarks/quality_multimodal.py [--quick]
Prints one JSON dict at the end; human-readable progress on stderr.
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
    ap.add_argument("--quick", action="store_true",
                    help="reduced epochs for smoke runs")
    ap.add_argument("--ckpt-dir", default=None,
                    help="crash-safe resume dir: checkpoint every few "
                         "epochs and resume a relaunched run "
                         "bit-identically (the axon terminal drops "
                         "connections ~every 25 min; CLAUDE.md)")
    ap.add_argument("--matmul-precision", default="highest",
                    choices=["default", "high", "highest"],
                    help="XLA f32 matmul precision; 'highest' = true-f32 "
                         "GEMMs matching the torch reference (the TPU "
                         "default runs bf16-input GEMMs and is an "
                         "uncontrolled quality confound, VERDICT r3)")
    ap.add_argument("--n-samples", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--init-retry", action="store_true",
                    help="use iDBN.train_with_retry: reinit + retrain if "
                         "the image stack collapses to blank-level recon")
    ap.add_argument("--real-best-of-k", action="store_true",
                    help="disable the reference's degenerate best-of-K "
                         "selector (reference_best_of_k_bug=False): pick "
                         "the TXT->IMG candidate by real free energy")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="parameter storage dtype (params['DTYPE'])")
    ap.add_argument("--compute-dtype", default=None,
                    choices=["bfloat16"],
                    help="mixed precision: f32 master weights, bf16 "
                         "Gibbs-chain GEMMs (params['COMPUTE_DTYPE'])")
    ap.add_argument("--pcd", action="store_true",
                    help="persistent-CD trainer for the image iDBN "
                         "(params['PCD'])")
    ap.add_argument("--lr", type=float, default=0.1,
                    help="image-stack learning rate (PCD typically "
                         "needs a smaller one than plain CD)")
    ap.add_argument("--sample-cycle", action="store_true",
                    help="measure label->image->label cycle top1 for the "
                         "sampled generator (sample_txt2img) vs the "
                         "mean decoder (txt2img)")
    args = ap.parse_args()
    from multimodal_idbn_tpu.config import set_matmul_precision
    set_matmul_precision(args.matmul_precision)

    import numpy as np

    from multimodal_idbn_tpu.data import create_dataloaders_uniform
    from multimodal_idbn_tpu.models import iMDBN
    from multimodal_idbn_tpu.utils.probe_utils import log_linear_probe

    epochs_img = 10 if args.quick else 100
    epochs_joint = 10 if args.quick else 150

    params = {
        "LEARNING_RATE": args.lr,
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
        "DTYPE": args.dtype,
        "COMPUTE_DTYPE": args.compute_dtype,
        "PCD": args.pcd,
    }

    log(f"[quality] building dataset ({args.n_samples} x 100x100, "
        f"32 classes)...")
    train, val, _ = create_dataloaders_uniform(
        batch_size=128, n_samples=args.n_samples, num_classes=32, side=100,
        seed=0)

    model = iMDBN([10000, 1500, 500], 500, params=params, dataloader=train,
                  val_loader=val, num_labels=32, seed=args.seed)
    if args.real_best_of_k:
        model.reference_best_of_k_bug = False
        log("[quality] real best-of-K free-energy selection ENABLED")

    image_start = joint_start = 0
    image_done = False
    img_kw, joint_kw = {}, {}
    if args.ckpt_dir:
        from multimodal_idbn_tpu.checkpoint import (
            load_train_checkpoint_expecting)
        ckd = Path(args.ckpt_dir)
        ckd.mkdir(parents=True, exist_ok=True)
        img_ck, joint_ck = ckd / "image.ckpt.npz", ckd / "joint.ckpt.npz"
        if joint_ck.exists():
            joint_start = load_train_checkpoint_expecting(
                model, joint_ck, "joint")
            image_done = True
            log(f"[quality] resuming joint at epoch {joint_start}")
        elif img_ck.exists():
            image_start = load_train_checkpoint_expecting(
                model.image_idbn, img_ck, "image")
            image_done = image_start >= epochs_img
            log(f"[quality] resuming image at epoch {image_start}")
        img_kw = {"checkpoint_every": 10, "checkpoint_path": str(img_ck)}
        joint_kw = {"checkpoint_every": 15,
                    "checkpoint_path": str(joint_ck)}

    log(f"[quality] training image iDBN ({epochs_img} epochs, CD=10)...")
    t0 = time.time()
    retries = 0
    if image_done:
        pass  # restored past the image phase
    elif args.init_retry:
        retries = model.image_idbn.train_with_retry(
            epochs=epochs_img, log_every_pca=10**9, log_every_probe=10**9,
            start_epoch=image_start, **img_kw)
    else:
        model.image_idbn.train(epochs=epochs_img, log_every_pca=10**9,
                               log_every_probe=10**9,
                               start_epoch=image_start, **img_kw)
    t_img = time.time() - t0
    # loss_history is empty when a joint-phase checkpoint restored the
    # run past the image phase (joint checkpoints don't carry the image
    # stack's history)
    idbn_final_loss = (float(model.image_idbn.loss_history[-1])
                       if model.image_idbn.loss_history else None)
    log(f"[quality] image iDBN: {t_img:.1f}s (final loss "
        f"{idbn_final_loss if idbn_final_loss is not None else 'restored'})")

    # auto-recon MSE on the val batch (reference idbn.py:236)
    vb = model.image_idbn.val_batch
    rec = np.clip(np.asarray(model.image_idbn.reconstruct(vb)), 0, 1)
    auto_recon_mse = float(np.mean((rec - np.asarray(vb).reshape(
        len(vb), -1)) ** 2))
    log(f"[quality] idbn auto_recon_mse: {auto_recon_mse:.4f}")

    log(f"[quality] joint training ({epochs_joint} epochs, CD=5, "
        f"cross_steps=50)...")
    t0 = time.time()
    model.train_joint(epochs=epochs_joint, log_every=10**9,
                      log_every_pca=10**9, log_every_probe=10**9,
                      start_epoch=joint_start, **joint_kw)
    t_joint = time.time() - t0
    log(f"[quality] joint: {t_joint:.1f}s | last-epoch metrics: "
        f"{model.last_metrics}")

    # Generative sampling cycle check (framework extension,
    # models/imdbn.py sample_txt2img): draw images from labels, re-encode
    # with img2txt, score top1 against the requested label. Compares the
    # sampled generator against the reference-semantics mean decoder.
    cycle = {}
    if args.sample_cycle:
        ids = np.repeat(np.arange(32), 4)  # 4 draws per class
        for name, imgs in (
                ("sampled", model.sample_txt2img(ids, seed=args.seed)),
                ("mean", model.txt2img(ids))):
            imgs = np.asarray(imgs)
            p_y = np.asarray(model.img2txt(imgs))
            cycle[f"cycle/{name}_top1"] = float(
                (p_y.argmax(1) == ids).mean())
            cycle[f"cycle/{name}_img_mean"] = float(imgs.mean())
            # numerosity-specific: does generated ink scale with the
            # requested dot count? (class id == count - min_count)
            sums = imgs.sum(axis=1)
            if sums.std() > 0:
                cycle[f"cycle/{name}_intensity_corr"] = float(
                    np.corrcoef(ids, sums)[0, 1])
        log(f"[quality] cycle: {cycle}")

    # Linear probes on the top image layer (reference cadence metric)
    probe_acc = {}
    try:
        probe_acc = log_linear_probe(model.image_idbn, epoch=epochs_img,
                                     n_bins=5, steps=1000,
                                     layer_tag="layer2", upto_layer=2,
                                     save_csv=False)
    except Exception as e:
        log(f"[quality] probe failed: {e}")

    result = {
        "config": "flagship [10000,1500,500]+joint500 K=32 "
                  f"N={args.n_samples} seed={args.seed}"
                  + (" (quick)" if args.quick else "")
                  + (" (real best-of-K)" if args.real_best_of_k else "")
                  + (f" (init-retry x{retries})" if args.init_retry
                     else "")
                  + (f" (dtype={args.dtype})"
                     if args.dtype != "float32" else "")
                  + (f" (compute={args.compute_dtype})"
                     if args.compute_dtype else "")
                  + (" (pcd)" if args.pcd else "")
                  + (f" (lr={args.lr})" if args.lr != 0.1 else ""),
        "epochs_img": epochs_img,
        "epochs_joint": epochs_joint,
        "idbn_final_loss": idbn_final_loss,
        "idbn_auto_recon_mse": auto_recon_mse,
        "image_train_seconds": round(t_img, 1),
        "joint_train_seconds": round(t_joint, 1),
        "joint_epoch_seconds_p50": round(model.epoch_timer.p50(), 3),
        **{k: round(v, 4) for k, v in (model.last_metrics or {}).items()},
        **{f"probe/{k}": round(v, 4) for k, v in probe_acc.items()},
        **{k: round(v, 4) for k, v in cycle.items()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
