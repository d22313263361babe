"""W&B plotting utilities (torch-free).

Mirror of reference imdbn/utils/wandb_utils.py: same public functions,
metric keys, and figure layouts (2D/3D embedding scatters with per-PC
Spearman correlations; ``log(values)`` coloring for the "Labels" feature,
reference wandb_utils.py:91,:148 — safe because labels are numerosities
≥ 1). Image grids are built with a NumPy tiler instead of torchvision's
``make_grid``. All functions degrade to no-ops when W&B is unavailable.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np

from multimodal_idbn_tpu.utils.wandb_compat import wandb


def _spearmanr(a: np.ndarray, b: np.ndarray) -> float:
    """Spearman rank correlation (scipy-compatible, average-rank ties)."""
    from scipy.stats import spearmanr
    rho, _ = spearmanr(a, b)
    return float(rho)


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2,
              normalize: bool = False) -> np.ndarray:
    """Tile [N, H, W] (or [N, C, H, W]) images into one [H', W', C] grid —
    NumPy replacement for torchvision.utils.make_grid."""
    imgs = np.asarray(images, np.float32)
    if imgs.ndim == 3:
        imgs = imgs[:, None]
    n, c, h, w = imgs.shape
    if normalize:
        lo, hi = imgs.min(), imgs.max()
        imgs = (imgs - lo) / max(1e-8, float(hi - lo))
    ncol = min(nrow, n)
    nrows = int(math.ceil(n / ncol))
    grid = np.zeros((c, nrows * (h + pad) + pad, ncol * (w + pad) + pad),
                    np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[:, pad + r * (h + pad): pad + r * (h + pad) + h,
             pad + col * (w + pad): pad + col * (w + pad) + w] = imgs[i]
    return np.transpose(grid, (1, 2, 0))


def _to_square(x: np.ndarray) -> np.ndarray:
    """[N, D] flat images -> [N, s, s] (or [N, D, 1] when non-square)."""
    x = np.asarray(x)
    if x.ndim >= 3:
        return x.reshape(x.shape[0], *x.shape[-2:])
    n, d = x.shape
    s = int(round(d ** 0.5))
    if s * s == d:
        return x.reshape(n, s, s)
    return x.reshape(n, d, 1)


def log_reconstructions_to_wandb(original, reconstruction, step: int = 0,
                                 num_images: int = 8,
                                 name: str = "reconstruction_grid"):
    """GT/recon pair grid (reference wandb_utils.py:11-21; that version
    hardcodes 100×100 — here the side is inferred)."""
    if wandb is None or wandb.run is None:
        return
    orig = _to_square(np.asarray(original)[:num_images])
    recon = _to_square(np.asarray(reconstruction)[:num_images])
    combined = np.stack([v for pair in zip(orig, recon) for v in pair])
    grid = make_grid(combined, nrow=2, normalize=True)
    wandb.log({name: [wandb.Image(grid, caption=name)]})


def log_reconstruction_grid(wandb_run, original, reconstruction, epoch: int,
                            key: str = "auto_recon_grid"):
    """Original-above-reconstruction grid (reference idbn.py:211-229)."""
    if wandb_run is None or wandb is None:
        return
    orig = _to_square(np.asarray(original))
    rec = np.clip(_to_square(np.asarray(reconstruction)), 0, 1)
    grid = make_grid(np.concatenate([orig, rec], axis=0), nrow=len(orig))
    wandb_run.log({key: wandb.Image(grid), "epoch": epoch})


def log_barplot(results: Dict[str, float], metric_name: str, arch_name: str,
                dist_name: str, ylabel: str = "Value"):
    """Bar plot over numerosity bins (reference wandb_utils.py:23-40)."""
    if wandb is None or wandb.run is None:
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    bins = list(results.keys())
    values = list(results.values())
    plt.figure(figsize=(6, 4))
    plt.bar(bins, values, color="steelblue", alpha=0.8)
    plt.ylabel(ylabel)
    plt.xlabel("Numerosity bins")
    plt.title(f"{metric_name} ({arch_name}, {dist_name})")
    plt.tight_layout()
    wandb.log({f"{arch_name}_{dist_name}_{metric_name}_bins_plot":
               wandb.Image(plt.gcf())})
    plt.close()


def plot_2d_embedding_and_correlations(emb_2d, features, arch_name,
                                       dist_name, method_name, wandb_run):
    """2D embedding scatter per feature + Spearman per PC
    (reference wandb_utils.py:43-110). Returns the correlation dict."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    emb_2d = np.asarray(emb_2d)
    if emb_2d.shape[0] == 0 or emb_2d.shape[1] != 2:
        return {}

    correlations = {}
    n_features = len(features)
    n_cols = 3
    n_rows = int(np.ceil(n_features / n_cols))
    fig, axs = plt.subplots(n_rows, n_cols, figsize=(5 * n_cols, 4 * n_rows))
    axs = np.atleast_1d(axs).flatten()

    i = 0
    for feat_name, values in features.items():
        if i >= len(axs):
            break
        values = np.asarray(values)
        if len(values) != emb_2d.shape[0] or len(values) < 2:
            correlations[f"{feat_name}_dim1"] = np.nan
            correlations[f"{feat_name}_dim2"] = np.nan
            i += 1
            continue
        correlations[f"{feat_name}_dim1"] = _spearmanr(emb_2d[:, 0], values)
        correlations[f"{feat_name}_dim2"] = _spearmanr(emb_2d[:, 1], values)
        # labels are numerosities >= 1, so log-coloring is in-domain
        color_values = np.log(values) if feat_name == "Labels" else values
        sc = axs[i].scatter(emb_2d[:, 0], emb_2d[:, 1], c=color_values,
                            cmap="viridis", s=40, alpha=0.8)
        axs[i].set_title(
            f"Feature: {feat_name}\n"
            f"Dim1={correlations[f'{feat_name}_dim1']:.2f}, "
            f"Dim2={correlations[f'{feat_name}_dim2']:.2f}")
        axs[i].set_xlabel(f"{method_name}-1")
        axs[i].set_ylabel(f"{method_name}-2")
        fig.colorbar(sc, ax=axs[i], label=feat_name)
        i += 1
    for j in range(i, len(axs)):
        axs[j].axis("off")

    plt.suptitle(f"{method_name} 2D Embedding for {arch_name} ({dist_name})",
                 fontsize=16)
    plt.tight_layout(rect=[0, 0.03, 1, 0.95])
    if wandb_run is not None and wandb is not None:
        wandb_run.log({f"embeddings/{dist_name}/{arch_name}/"
                       f"{method_name}_2d_embedding": wandb.Image(plt.gcf())})
    plt.close(fig)
    return correlations


def plot_3d_embedding_and_correlations(emb_3d, features, arch_name,
                                       dist_name, method_name, wandb_run):
    """3D variant (reference wandb_utils.py:113-172)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    emb_3d = np.asarray(emb_3d)
    if emb_3d.shape[0] == 0 or emb_3d.shape[1] != 3:
        return {}

    correlations = {}
    n_features = len(features)
    n_cols = 3
    n_rows = int(math.ceil(n_features / n_cols)) if n_features > 0 else 1
    fig = plt.figure(figsize=(5 * n_cols, 4 * n_rows))

    for idx, (feat_name, values) in enumerate(features.items()):
        ax = fig.add_subplot(n_rows, n_cols, idx + 1, projection="3d")
        values = np.asarray(values)
        if len(values) != emb_3d.shape[0] or len(values) < 2:
            for d in (1, 2, 3):
                correlations[f"{feat_name}_dim{d}"] = np.nan
            ax.axis("off")
            continue
        rhos = [_spearmanr(emb_3d[:, d], values) for d in range(3)]
        for d in (1, 2, 3):
            correlations[f"{feat_name}_dim{d}"] = rhos[d - 1]
        color_values = np.log(values) if feat_name == "Labels" else values
        sc = ax.scatter(emb_3d[:, 0], emb_3d[:, 1], emb_3d[:, 2],
                        c=color_values, cmap="viridis", s=30, alpha=0.8)
        ax.set_title(f"{feat_name}\nDim1={rhos[0]:.2f}, Dim2={rhos[1]:.2f}, "
                     f"Dim3={rhos[2]:.2f}")
        ax.set_xlabel(f"{method_name}-1")
        ax.set_ylabel(f"{method_name}-2")
        ax.set_zlabel(f"{method_name}-3")
        fig.colorbar(sc, ax=ax, shrink=0.6, aspect=12, pad=0.1,
                     label=feat_name)

    total_plots = n_rows * n_cols
    for idx in range(n_features, total_plots):
        ax = fig.add_subplot(n_rows, n_cols, idx + 1, projection="3d")
        ax.axis("off")

    plt.suptitle(f"{method_name} 3D Embedding for {arch_name} ({dist_name})",
                 fontsize=16)
    plt.tight_layout(rect=[0, 0.03, 1, 0.95])
    if wandb_run is not None and wandb is not None:
        wandb_run.log({f"embeddings/{dist_name}/{arch_name}/"
                       f"{method_name}_3d_embedding": wandb.Image(fig)})
    plt.close(fig)
    return correlations


def log_snapshot_panels(wandb_run, epoch: int, imgs: np.ndarray,
                        recs: np.ndarray, p_y: np.ndarray,
                        y_onehot: np.ndarray,
                        class_names: Optional[list] = None):
    """Snapshot suite of reference imdbn.py:715-813: GT|REC pair grid
    (``snap/image_from_text``), confusion matrix (``snap/text_confusion``),
    image MSE (``snap/image_mse``), and the top-k table (``snap/text_topk``)."""
    if wandb_run is None or wandb is None:
        return
    imgs4 = _to_square(imgs)
    recs4 = _to_square(recs)
    B = imgs4.shape[0]

    pair = np.stack([imgs4, recs4], axis=1).reshape(-1, *imgs4.shape[1:])
    grid = make_grid(pair, nrow=2)
    wandb_run.log({"snap/image_from_text": wandb.Image(grid),
                   "epoch": epoch})

    pred = p_y.argmax(axis=1)
    gt = y_onehot.argmax(axis=1)
    K = p_y.shape[1]
    names = (class_names if class_names and len(class_names) == K
             else [str(i) for i in range(K)])
    try:
        cm_plot = wandb.plot.confusion_matrix(
            y_true=[names[i] for i in gt], preds=[names[i] for i in pred],
            class_names=names)
        wandb_run.log({"snap/text_confusion": cm_plot, "epoch": epoch})
    except Exception:
        pass

    mse = float(np.mean((imgs4.reshape(B, -1) - recs4.reshape(B, -1)) ** 2))
    wandb_run.log({"snap/image_mse": mse, "epoch": epoch})

    try:
        probs = np.clip(p_y, 1e-9, 1)
        cols = ["idx", "gt_idx", "pred_idx", "p_pred", "p_y_true"]
        has_names = class_names and len(class_names) == K
        if has_names:
            cols += ["gt_label", "pred_label"]
        tbl = wandb.Table(columns=cols)
        for i in range(B):
            gt_i, pred_i = int(gt[i]), int(pred[i])
            row = [i, gt_i, pred_i, float(probs[i, pred_i]),
                   float(probs[i, gt_i])]
            if has_names:
                row += [class_names[gt_i], class_names[pred_i]]
            tbl.add_data(*row)
        wandb_run.log({"snap/text_topk": tbl, "epoch": epoch})
    except Exception as e:
        wandb_run.log({"warn/snap_topk_table_error": str(e), "epoch": epoch})
