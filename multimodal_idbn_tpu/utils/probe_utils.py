"""Linear-probe diagnostics over validation embeddings.

Mirror of reference imdbn/utils/probe_utils.py (public functions, metric
names, cadences, CSV side effects) with the probe itself trained as a
jitted full-batch JAX loop (AdamW via optax + cross entropy + early
stopping on validation loss, reference probe_utils.py:195-263) instead of
a torch ``nn.Linear``.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_idbn_tpu.utils.wandb_compat import wandb

from multimodal_idbn_tpu.models.rbm import as_array


# -------------------------
# Embeddings + features (reference probe_utils.py:21-135)
# -------------------------

def _get_feat(d: dict, *candidates):
    norm = {k.lower().replace(" ", "").replace("_", ""): k for k in d.keys()}
    for c in candidates:
        key = norm.get(c.lower().replace(" ", "").replace("_", ""))
        if key is not None:
            return d[key]
    return None


def _to_1d_float(t) -> Optional[np.ndarray]:
    if t is None:
        return None
    t = np.asarray(t)
    if t.ndim == 2:  # one-hot → indices
        t = np.argmax(t, axis=1)
    return t.reshape(-1).astype(np.float32)


def _collect_feats(model, n: int) -> Dict[str, np.ndarray]:
    feats_src = getattr(model, "features", None)
    if feats_src is None:
        raise RuntimeError("model.features is required")
    cum_area = _to_1d_float(_get_feat(feats_src, "Cumulative Area",
                                      "cum_area"))
    chull = _to_1d_float(_get_feat(feats_src, "Convex Hull", "convex_hull",
                                   "convexhull"))
    labels = _to_1d_float(_get_feat(feats_src, "Labels", "labels"))
    density = _to_1d_float(_get_feat(feats_src, "Density", "density"))

    def _check(name, v):
        if v is None:
            return False
        if v.size != n:
            raise RuntimeError(f"Feature '{name}' length mismatch: "
                               f"{v.size} vs embeddings {n}.")
        return True

    feats: Dict[str, np.ndarray] = {}
    if _check("cum_area", cum_area):
        feats["cum_area"] = cum_area
    if _check("convex_hull", chull):
        feats["convex_hull"] = chull
    if _check("labels", labels):
        feats["labels"] = labels
    if density is not None and _check("density", density):
        feats["density"] = density
    return feats


def compute_val_embeddings_and_features(model, upto_layer: Optional[int] = None
                                        ) -> Tuple[np.ndarray, dict]:
    """Encode the whole (unshuffled) val set; return [N, D] embeddings and
    the aligned feature dict (reference probe_utils.py:21-80)."""
    assert model.val_loader is not None, "val_loader is None."
    embeds = []
    for batch_data, batch_labels in model.val_loader:
        x = batch_labels if getattr(model, "text_flag", False) else batch_data
        x = as_array(x)
        z = (model.represent(x) if upto_layer is None
             else model.represent(x, upto_layer=upto_layer))
        embeds.append(np.asarray(z))
    E = (np.concatenate(embeds, axis=0) if embeds
         else np.zeros((0, 0), np.float32))
    return E, _collect_feats(model, E.shape[0])


def compute_joint_embeddings_and_features(model) -> Tuple[np.ndarray, dict]:
    """Joint-top embeddings over the val set (reference probe_utils.py:84-135)."""
    assert model.val_loader is not None, "val_loader is None."
    embeds = []
    for img_data, labels in model.val_loader:
        z = model.represent((img_data, labels))
        embeds.append(np.asarray(z))
    if not embeds:
        return np.zeros((0, 0), np.float32), {}
    E = np.concatenate(embeds, axis=0)
    return E, _collect_feats(model, E.shape[0])


# -------------------------
# Binning + split (reference probe_utils.py:141-189)
# -------------------------

def make_bin_labels(values: np.ndarray, n_bins: int = 5):
    """Quantile binning with a 1e-6 jitter on tied edges; returns
    (labels 0..n_bins-1, edges [n_bins+1]) (reference probe_utils.py:141-156)."""
    values = np.asarray(values, np.float32)
    qs = np.linspace(0, 1, n_bins + 1)
    edges = np.quantile(values, qs, method="linear").astype(np.float32)
    for k in range(1, len(edges)):
        if edges[k] <= edges[k - 1]:
            edges[k] = edges[k - 1] + 1e-6
    inner = edges[1:-1]
    # torch.bucketize(right=False) == searchsorted side='left'
    labels = np.searchsorted(inner, values, side="left")
    return labels.astype(np.int64), edges


def _format_bin_names(edges: np.ndarray, precision: int = 4) -> List[str]:
    e = np.asarray(edges, float)

    def fmt(v):
        return f"{v:.{precision}f}".rstrip("0").rstrip(".")

    return [f"{fmt(e[i])}-{fmt(e[i + 1])}" for i in range(len(e) - 1)]


def stratified_split(labels, test_size: float = 0.2, rng_seed: int = 42):
    """Per-class stratified split keeping ≥1 train sample per class
    (reference probe_utils.py:170-189, seed 42)."""
    labels = np.asarray(labels)
    rng = random.Random(rng_seed)
    train_idx: List[int] = []
    test_idx: List[int] = []
    for c in np.unique(labels).tolist():
        idxs = np.nonzero(labels == c)[0].tolist()
        rng.shuffle(idxs)
        n = len(idxs)
        if n <= 1:
            test_idx.extend(idxs)
            continue
        n_test = max(1, int(round(n * test_size)))
        n_test = min(n_test, n - 1)
        test_idx.extend(idxs[:n_test])
        train_idx.extend(idxs[n_test:])
    return train_idx, test_idx


# -------------------------
# Linear classifier probe (reference probe_utils.py:195-263), in JAX
# -------------------------

def _adamw_step(params, m, v, g, t, lr, wd, b1=0.9, b2=0.999, eps=1e-8):
    m = jax.tree_util.tree_map(lambda mi, gi: b1 * mi + (1 - b1) * gi, m, g)
    v = jax.tree_util.tree_map(lambda vi, gi: b2 * vi + (1 - b2) * gi ** 2,
                               v, g)
    bc1 = 1 - b1 ** t
    bc2 = 1 - b2 ** t
    params = jax.tree_util.tree_map(
        lambda p, mi, vi: p - lr * (mi / bc1) / (jnp.sqrt(vi / bc2) + eps)
        - lr * wd * p,
        params, m, v)
    return params, m, v


def train_linear_classifier(X_train, y_train, X_val, y_val, device=None,
                            n_classes: int = 5, max_steps: int = 1000,
                            lr: float = 1e-2, weight_decay: float = 0.0,
                            patience: int = 20, min_delta: float = 0.0):
    """Full-batch linear probe with AdamW + CE + early stopping on val loss
    (reference probe_utils.py:195-263). Returns (best val accuracy,
    y_true list, y_pred list).

    The whole optimization runs as one jitted ``lax.while_loop`` on device
    (best-parameter tracking included) — no per-step host round trips.
    """
    del device
    Xtr = jnp.asarray(X_train, jnp.float32)
    ytr = jnp.asarray(y_train, jnp.int32)
    Xva = jnp.asarray(X_val, jnp.float32)
    yva = jnp.asarray(y_val, jnp.int32)
    D = Xtr.shape[1]

    key = jax.random.key(0)
    # torch nn.Linear default init: U(-1/sqrt(D), 1/sqrt(D))
    lim = 1.0 / np.sqrt(max(1, D))
    W0 = jax.random.uniform(key, (D, n_classes), jnp.float32, -lim, lim)
    b0 = jax.random.uniform(jax.random.fold_in(key, 1), (n_classes,),
                            jnp.float32, -lim, lim)

    def ce(params, X, y):
        logits = X @ params[0] + params[1]
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

    grad_fn = jax.value_and_grad(ce)

    def cond(state):
        step, _, _, _, _, _, no_improve = state
        return (step < max_steps) & (no_improve < patience)

    def body(state):
        step, params, m, v, best_loss, best_params, no_improve = state
        _, g = grad_fn(params, Xtr, ytr)
        params, m, v = _adamw_step(params, m, v, g, step + 1, lr,
                                   weight_decay)
        v_loss = ce(params, Xva, yva)
        improved = v_loss < best_loss - min_delta
        best_loss = jnp.where(improved, v_loss, best_loss)
        best_params = jax.tree_util.tree_map(
            lambda bp, p: jnp.where(improved, p, bp), best_params, params)
        no_improve = jnp.where(improved, 0, no_improve + 1)
        return (step + 1, params, m, v, best_loss, best_params, no_improve)

    zeros = (jnp.zeros_like(W0), jnp.zeros_like(b0))
    init = (jnp.asarray(0), (W0, b0), zeros, zeros,
            jnp.asarray(jnp.inf, jnp.float32), (W0, b0), jnp.asarray(0))
    state = jax.jit(
        lambda s: jax.lax.while_loop(cond, body, s))(init)
    best_params = state[5]

    logits = Xva @ best_params[0] + best_params[1]
    preds = np.asarray(jnp.argmax(logits, axis=1))
    acc = float((preds == np.asarray(yva)).mean())
    return acc, np.asarray(yva).tolist(), preds.tolist()


# -------------------------
# Confusion matrix + logging (reference probe_utils.py:269-320)
# -------------------------

def _confusion_df(y_true, y_pred, n_classes: int, bin_names: List[str]):
    import pandas as pd
    cm = np.zeros((n_classes, n_classes), dtype=int)
    for t, p in zip(y_true, y_pred):
        if 0 <= t < n_classes and 0 <= p < n_classes:
            cm[t, p] += 1
    df = pd.DataFrame(cm, index=bin_names, columns=bin_names)
    df.index.name = "True"
    df.columns.name = "Pred"
    return df


def _save_confusion_csv(df, model, metric_name: str, epoch: int) -> str:
    os.makedirs(model.arch_dir, exist_ok=True)
    path = os.path.join(model.arch_dir,
                        f"probe_{metric_name}_confusion_epoch{epoch}.csv")
    df.to_csv(path)
    return path


def _log_confusion_table_wandb(wandb_run, df, metric_name: str, epoch: int):
    if not wandb_run or wandb is None:
        return
    try:
        table = wandb.Table(dataframe=df)
        wandb_run.log({f"probe/{metric_name}/confusion_table": table,
                       "epoch": epoch})
    except Exception:
        wandb_run.log({f"probe/{metric_name}/confusion_dict": df.to_dict(),
                       "epoch": epoch})


def _log_accuracy_wandb(wandb_run, metric_name: str, acc: float, epoch: int):
    if not wandb_run or wandb is None:
        return
    wandb_run.log({f"probe/{metric_name}/acc": acc, "epoch": epoch})


def _log_bin_edges_wandb(wandb_run, metric_name: str, edges, epoch: int):
    if not wandb_run or wandb is None:
        return
    try:
        wandb_run.log({f"probe/{metric_name}/bin_edges": np.asarray(edges),
                       "epoch": epoch})
    except Exception:
        pass


def _prepare_targets(feats: dict, mkey: str, n_bins: int):
    """All probe targets are quantile-binned, including 'labels'
    (reference probe_utils.py:326-338)."""
    vals = np.asarray(feats[mkey], np.float32)
    y, edges = make_bin_labels(vals, n_bins=n_bins)
    bin_names = _format_bin_names(edges, precision=4)
    return y, n_bins, edges, bin_names


# -------------------------
# Orchestrators (reference probe_utils.py:344-510)
# -------------------------

def _run_probes(model, E_np, feats, epoch, n_bins, test_size, steps, lr,
                rng_seed, patience, min_delta, save_csv, name_fn,
                summary_key, summary_color):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    wandb_run = getattr(model, "wandb_run", None)
    probe_targets = ["cum_area", "convex_hull", "labels"]
    if "density" in feats:
        probe_targets.append("density")

    summary_rows = []
    results = {}
    for mkey in probe_targets:
        y, n_classes, edges, bin_names = _prepare_targets(feats, mkey,
                                                          n_bins=n_bins)
        metric_name = name_fn(mkey)
        train_idx, test_idx = stratified_split(y, test_size=test_size,
                                               rng_seed=rng_seed)
        if len(train_idx) == 0 or len(test_idx) == 0:
            _log_accuracy_wandb(wandb_run,
                                f"{metric_name}/warn_empty_split", 0.0,
                                epoch)
            continue

        acc, y_true, y_pred = train_linear_classifier(
            E_np[train_idx], y[train_idx], E_np[test_idx], y[test_idx],
            n_classes=n_classes, max_steps=steps, lr=lr, weight_decay=0.0,
            patience=patience, min_delta=min_delta)

        summary_rows.append((metric_name, acc))
        results[metric_name] = acc
        df = _confusion_df(y_true, y_pred, n_classes, bin_names)
        _log_accuracy_wandb(wandb_run, metric_name, acc, epoch)
        _log_confusion_table_wandb(wandb_run, df, metric_name, epoch)
        _log_bin_edges_wandb(wandb_run, metric_name, edges, epoch)
        if save_csv:
            csv_path = _save_confusion_csv(
                df, model, metric_name.replace("/", "_"), epoch)
            if wandb_run and wandb is not None:
                wandb_run.log({f"probe/{metric_name}/confusion_csv_path":
                               csv_path, "epoch": epoch})

    if summary_rows and wandb_run and wandb is not None:
        labels = [name for name, _ in summary_rows]
        values = [val for _, val in summary_rows]
        fig, ax = plt.subplots(figsize=(max(6, len(labels) * 1.2), 4))
        ax.bar(range(len(labels)), values, color=summary_color)
        ax.set_xticks(range(len(labels)))
        ax.set_xticklabels(labels, rotation=45, ha="right")
        ax.set_ylim(0, 1)
        ax.set_ylabel("Accuracy")
        ax.set_title(f"Linear probe summary @ epoch {epoch}")
        fig.tight_layout()
        wandb_run.log({summary_key: wandb.Image(fig)})
        plt.close(fig)
    return results


def log_linear_probe(model, epoch: int, n_bins: int = 5,
                     test_size: float = 0.2, steps: int = 1000,
                     lr: float = 1e-2, rng_seed: int = 42,
                     patience: int = 20, min_delta: float = 0.0,
                     save_csv: bool = True, upto_layer: Optional[int] = None,
                     layer_tag: Optional[str] = None):
    """Probe cum_area/convex_hull/labels (+density) from layer embeddings;
    logs ``probe/<name>/acc``, confusion tables, bin edges, CSV
    (reference probe_utils.py:344-432). Returns {metric_name: acc}."""
    E_np, feats = compute_val_embeddings_and_features(model,
                                                      upto_layer=upto_layer)
    return _run_probes(
        model, E_np, feats, epoch, n_bins, test_size, steps, lr, rng_seed,
        patience, min_delta, save_csv,
        name_fn=lambda mkey: f"{layer_tag}/{mkey}" if layer_tag else mkey,
        summary_key=f"probe/{layer_tag or 'top'}/summary",
        summary_color="steelblue")


def log_joint_linear_probe(model, epoch: int, n_bins: int = 5,
                           test_size: float = 0.2, steps: int = 1000,
                           lr: float = 1e-2, rng_seed: int = 42,
                           patience: int = 20, min_delta: float = 0.0,
                           save_csv: bool = False,
                           metric_prefix: str = "joint"):
    """Linear probe on joint embeddings (reference probe_utils.py:435-510)."""
    E_np, feats = compute_joint_embeddings_and_features(model)
    if E_np.size == 0:
        return {}
    return _run_probes(
        model, E_np, feats, epoch, n_bins, test_size, steps, lr, rng_seed,
        patience, min_delta, save_csv,
        name_fn=lambda mkey: (f"{metric_prefix}/{mkey}" if metric_prefix
                              else mkey),
        summary_key=f"probe/{metric_prefix or 'joint'}/summary",
        summary_color="indianred")
