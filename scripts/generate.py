"""Generate images from class labels with a trained iMDBN.

Framework extension — the reference has no generation CLI (its TXT→IMG
flow is the mean-field decoder inside training diagnostics,
imdbn.py:387-488). This loads a ``save_model`` pickle, rebuilds the
model (``iMDBN.from_payload``), and draws images from p(img | y) with
``sample_txt2img`` (or the mean decoder with ``--mean``).

Usage:
    python scripts/generate.py --model model.pkl --labels 3 7 12 \
        --n-per-label 4 --seed 0 --out draws.npz [--png draws.png]

Output: an npz with ``images [N, D]`` (pixel probabilities of the
sampled configurations) and ``labels [N]``; optionally a PNG grid.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_idbn_tpu.models import iMDBN  # noqa: E402


def main():
    from multimodal_idbn_tpu.config import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()
    ap = argparse.ArgumentParser(
        "Draw images from p(img | label) with a trained iMDBN")
    ap.add_argument("--model", required=True,
                    help="path to a save_model pickle")
    ap.add_argument("--labels", type=int, nargs="+", required=True,
                    help="class ids to condition on")
    def positive_int(v):
        v = int(v)
        if v < 1:
            raise argparse.ArgumentTypeError("must be >= 1")
        return v

    ap.add_argument("--n-per-label", type=positive_int, default=1)
    ap.add_argument("--gibbs-steps", type=int, default=None,
                    help="chain length (default: the model's "
                         "CROSS_GIBBS_STEPS)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mean", action="store_true",
                    help="use the reference-semantics mean decoder "
                         "(txt2img) instead of sampling")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars alone are not "
                         "enough under some bootstraps)")
    ap.add_argument("--out", default="generated.npz")
    ap.add_argument("--png", default=None,
                    help="also save a PNG grid (needs matplotlib and a "
                         "square image size)")
    ap.add_argument("--matmul-precision", default="highest",
                    choices=["default", "high", "highest"],
                    help="XLA f32 matmul precision (TPU default runs "
                         "bf16-input GEMMs; 'highest' matches training "
                         "and the torch reference's numerics)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from multimodal_idbn_tpu.config import set_matmul_precision
    set_matmul_precision(args.matmul_precision)

    payload = iMDBN.load_model(args.model)
    model = iMDBN.from_payload(payload)

    ids = np.repeat(np.asarray(args.labels, np.int64), args.n_per_label)
    if args.mean:
        # Honor --gibbs-steps/--seed on the mean path too (txt2img draws
        # its chain key from the model's internal stream and reads
        # CROSS_GIBBS_STEPS).
        if args.gibbs_steps is not None:
            model.cross_steps = int(args.gibbs_steps)
        import jax
        model.joint_rbm._key = jax.random.key(args.seed)
        imgs = np.asarray(model.txt2img(ids))
    else:
        imgs = np.asarray(model.sample_txt2img(
            ids, gibbs_steps=args.gibbs_steps, seed=args.seed))
    np.savez(args.out, images=imgs, labels=ids)
    print(f"[generate] {imgs.shape[0]} images "
          f"({'mean decode' if args.mean else 'sampled'}) -> {args.out} "
          f"(pixel mean {imgs.mean():.4f})")

    if args.png:
        side = int(round(imgs.shape[1] ** 0.5))
        if side * side != imgs.shape[1]:
            print(f"[generate] skipping PNG: image dim {imgs.shape[1]} "
                  f"is not square")
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = imgs.shape[0]
        cols = min(8, n)
        rows = (n + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols,
                                 figsize=(1.6 * cols, 1.6 * rows),
                                 squeeze=False)
        for i in range(rows * cols):
            ax = axes[i // cols][i % cols]
            ax.axis("off")
            if i < n:
                ax.imshow(imgs[i].reshape(side, side), cmap="gray_r",
                          vmin=0, vmax=1)
                ax.set_title(str(ids[i]), fontsize=8)
        fig.tight_layout()
        fig.savefig(args.png, dpi=120)
        print(f"[generate] grid -> {args.png}")


if __name__ == "__main__":
    main()
