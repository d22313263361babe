"""iMDBN_BiModal: two modality iDBNs joined by a multi-layer joint DBN.

API mirror of reference imdbn/models/imdbn_bimodal.py:422-1076 plus its
module-level helpers (:43-419): alternating-modality warmup, per-layer
free CD down the joint stack, symmetric cross-reconstruction through
joint layer 0, bimodal probes and trajectory panels, dual back-compat
save format. Fused on-device joint epochs via
``multimodal_idbn_tpu.ops.bimodal_ops``.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_idbn_tpu.checkpoint import (align_loader_for_resume,
                                            checkpoint_epochs,
                                            maybe_save_train_checkpoint)
from multimodal_idbn_tpu.models.idbn import iDBN
from multimodal_idbn_tpu.models.rbm import (RBM, _warn_compute_dtype_joint,
                                            as_array, param_dtype, param_sr)
from multimodal_idbn_tpu.ops import bimodal_ops
from multimodal_idbn_tpu.utils.wandb_compat import wandb

# Hardcoded in the reference (imdbn_bimodal.py:734).
WARMUP_EPOCHS = 8


# ---------------------------------------------------------------------------
# Module-level helpers (reference imdbn_bimodal.py:43-419)
# ---------------------------------------------------------------------------

def compute_bimodal_joint_embeddings_and_features(model):
    """Joint-top embeddings over the val set + feature dict
    (reference imdbn_bimodal.py:43-73)."""
    all_embeddings = []
    for mod1, mod2 in model.val_loader:
        h = model.represent((mod1, mod2))
        all_embeddings.append(np.asarray(h))
    E = (np.concatenate(all_embeddings, axis=0) if all_embeddings
         else np.zeros((0, 0), np.float32))

    feats = {}
    if model.features is not None:
        mapping = {"Cumulative Area": "cum_area", "Convex Hull":
                   "convex_hull", "Labels": "labels", "Density": "density"}
        for src, dst in mapping.items():
            if src in model.features:
                feats[dst] = np.asarray(model.features[src])
    return E, feats


def log_bimodal_joint_linear_probe(model, epoch, n_bins=5, test_size=0.2,
                                   steps=1000, lr=1e-2, patience=20,
                                   min_delta=0.0, metric_prefix="joint",
                                   save_csv=False):
    """Linear probes on the bimodal joint representation
    (reference imdbn_bimodal.py:76-152)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from multimodal_idbn_tpu.utils.probe_utils import (
        _confusion_df,
        _format_bin_names,
        _log_accuracy_wandb,
        _log_confusion_table_wandb,
        make_bin_labels,
        stratified_split,
        train_linear_classifier,
    )

    E_np, feats = compute_bimodal_joint_embeddings_and_features(model)
    if E_np.size == 0:
        return {}

    probe_targets = ["cum_area", "convex_hull", "labels"]
    if "density" in feats:
        probe_targets.append("density")

    summary_rows = []
    results = {}
    for mkey in probe_targets:
        if mkey not in feats:
            continue
        vals = np.asarray(feats[mkey], np.float32)
        y, edges = make_bin_labels(vals, n_bins=n_bins)
        bin_names = _format_bin_names(edges, precision=4)
        metric_name = f"{metric_prefix}/{mkey}"

        train_idx, test_idx = stratified_split(y, test_size=test_size,
                                               rng_seed=42)
        if len(train_idx) == 0 or len(test_idx) == 0:
            if model.wandb_run:
                model.wandb_run.log({f"{metric_name}/warn_empty_split": 0.0,
                                     "epoch": epoch})
            continue

        acc, y_true, y_pred = train_linear_classifier(
            E_np[train_idx], y[train_idx], E_np[test_idx], y[test_idx],
            n_classes=n_bins, max_steps=steps, lr=lr, weight_decay=0.0,
            patience=patience, min_delta=min_delta)
        summary_rows.append((metric_name, acc))
        results[metric_name] = acc
        df = _confusion_df(y_true, y_pred, n_bins, bin_names)
        _log_accuracy_wandb(model.wandb_run, metric_name, acc, epoch)
        _log_confusion_table_wandb(model.wandb_run, df, metric_name, epoch)

    if summary_rows and model.wandb_run:
        labels_plot = [name for name, _ in summary_rows]
        values = [val for _, val in summary_rows]
        fig, ax = plt.subplots(figsize=(max(6, len(labels_plot) * 1.2), 4))
        ax.bar(range(len(labels_plot)), values, color="indianred")
        ax.set_xticks(range(len(labels_plot)))
        ax.set_xticklabels(labels_plot, rotation=45, ha="right")
        ax.set_ylim(0, 1)
        ax.set_ylabel("Accuracy")
        ax.set_title(f"Joint probe summary @ epoch {epoch}")
        fig.tight_layout()
        model.wandb_run.log({f"probe/{metric_prefix}/summary":
                             wandb.Image(fig), "epoch": epoch})
        plt.close(fig)
    return results


def _mod2_to_mod1_chain(model, z2, steps: int):
    """MOD2→MOD1 stochastic-h chain on joint layer 0; returns the per-step
    (h_prob, z1) trajectories (reference imdbn_bimodal.py:244-254).
    Runs as one scan via imdbn_logging-style kernels."""
    from multimodal_idbn_tpu.ops import rbm_ops
    from multimodal_idbn_tpu.ops.sampling import clamp_mask, sample_bernoulli

    joint = model.joint_rbm.state
    Dz1 = model.Dz_mod1
    B = z2.shape[0]
    v_known = jnp.concatenate([jnp.zeros((B, Dz1), jnp.float32), z2], axis=1)
    km = jnp.concatenate([jnp.zeros((B, Dz1), jnp.float32),
                          jnp.ones_like(z2)], axis=1)
    h0 = rbm_ops.hidden_probs(joint, v_known)
    v_prob0 = rbm_ops.visible_probs(joint, h0, groups=())
    v_cur = clamp_mask(v_prob0, v_known, km)

    def body(v, skey):
        h_prob = rbm_ops.hidden_probs(joint, v)
        h = sample_bernoulli(skey, h_prob)
        v_logits = h @ joint.w.T + joint.vb
        v = clamp_mask(jax.nn.sigmoid(v_logits), v_known, km)
        return v, (h_prob, v[:, :Dz1])

    key = model.joint_rbm._next_key()
    _, (hs, zs) = jax.lax.scan(body, v_cur,
                               jax.random.split(key, int(steps)))
    h_traj = np.concatenate([np.asarray(h0), np.asarray(hs)[:, 0, :]], 0)
    z_traj = np.concatenate([np.asarray(v_cur[:, :Dz1]),
                             np.asarray(zs)[:, 0, :]], 0)
    return h_traj, z_traj


def log_bimodal_latent_trajectory(model, sample_idx: int = 0,
                                  steps: int = 50, tag: str = "trajectory",
                                  n_frames: int = 8):
    """MOD2→MOD1 trajectory in joint-hidden PCA space with recon panel
    (reference imdbn_bimodal.py:156-334)."""
    import math
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from multimodal_idbn_tpu.utils.pca import pca_fit_transform

    if model.val_loader is None or model.wandb_run is None:
        return

    # PCA background: h_joint (layer-0 hidden) for all val samples.
    all_h, all_labels = [], []
    for mod1, mod2 in model.val_loader:
        z1 = model.mod1_dbn.represent(as_array(mod1))
        z2 = model.mod2_dbn.represent(as_array(mod2))
        h = model.joint_rbm.forward(jnp.concatenate([z1, z2], axis=1))
        all_h.append(np.asarray(h))
    H_all = np.concatenate(all_h, axis=0)
    try:
        base = model.val_loader.dataset.dataset
        indices = model.val_loader.dataset.indices
        all_labels = [base.labels[i] for i in indices]
    except Exception:
        all_labels = [0.0] * H_all.shape[0]
    color_vec = np.asarray(all_labels, float)
    N_val = H_all.shape[0]
    sample_idx = min(sample_idx, N_val - 1)

    # fetch sample
    seen = 0
    mod1_s = mod2_s = None
    for mod1, mod2 in model.val_loader:
        b = len(mod1)
        if seen + b <= sample_idx:
            seen += b
            continue
        pos = sample_idx - seen
        mod1_s = as_array(mod1)[pos:pos + 1]
        mod2_s = as_array(mod2)[pos:pos + 1]
        break
    if mod1_s is None:
        return

    z1_true = model.mod1_dbn.represent(mod1_s)
    z2_true = model.mod2_dbn.represent(mod2_s)

    h_traj, z_traj = _mod2_to_mod1_chain(model, z2_true, steps)
    recs = np.asarray(model.mod1_dbn.decode(z_traj))  # [steps+1, D1]

    mean = H_all.mean(0, keepdims=True)
    _, _, Vt = np.linalg.svd(H_all - mean, full_matrices=False)
    proj = Vt[:2].T
    H2d = (H_all - mean) @ proj
    traj_2d = (h_traj - mean) @ proj
    h_true = np.asarray(model.joint_rbm.forward(
        jnp.concatenate([z1_true, z2_true], axis=1)))
    h_true_2d = (h_true - mean) @ proj

    sel_idx = np.unique(np.linspace(0, len(recs) - 1, n_frames,
                                    dtype=int)).tolist()
    Npix = mod1_s.shape[1]
    side = int(round(Npix ** 0.5))

    def _to_img(t):
        return np.clip(np.asarray(t).reshape(-1), 0, 1).reshape(side, side)

    n_tiles = len(sel_idx) + 1
    rows = 2
    cols = math.ceil(n_tiles / rows)
    fig = plt.figure(figsize=(8 + cols * 2.2, max(6, rows * 2.2)))
    gs = fig.add_gridspec(nrows=rows, ncols=cols + 4)
    ax0 = fig.add_subplot(gs[:, :4])
    sc = ax0.scatter(H2d[:, 0], H2d[:, 1], c=color_vec, cmap="viridis",
                     s=12, alpha=0.35)
    ax0.scatter(h_true_2d[0, 0], h_true_2d[0, 1], s=80, marker="*", c="k",
                edgecolor="w", linewidths=0.8, label="GT", zorder=3)
    ax0.scatter(traj_2d[0, 0], traj_2d[0, 1], s=50, marker="D", c="red",
                edgecolor="k", linewidths=0.5, label="start", zorder=3)
    ax0.plot(traj_2d[:, 0], traj_2d[:, 1], linewidth=1.6, marker="o",
             markersize=3, c="red", label="trajectory", zorder=2)
    ax0.set_title(f"PCA h_joint - sample {sample_idx} - steps={steps}")
    ax0.set_xlabel("PC1")
    ax0.set_ylabel("PC2")
    fig.colorbar(sc, ax=ax0, fraction=0.046, pad=0.02, label="Numerosity")
    ax0.legend(loc="best")

    right_gs = gs[:, 4:].subgridspec(nrows=rows, ncols=cols)
    ax = fig.add_subplot(right_gs[0, 0])
    ax.imshow(_to_img(mod1_s), cmap="gray", vmin=0, vmax=1)
    ax.set_title("GT", fontsize=9)
    ax.axis("off")
    for k, si in enumerate(sel_idx):
        r, c = divmod(k + 1, cols)
        ax = fig.add_subplot(right_gs[r, c])
        ax.imshow(_to_img(recs[si]), cmap="gray", vmin=0, vmax=1)
        ax.set_title(f"step {si}", fontsize=9)
        ax.axis("off")

    plt.tight_layout()
    model.wandb_run.log({f"{tag}/mod2_to_mod1": wandb.Image(fig)})
    plt.close(fig)


def log_bimodal_latent_trajectory_3d(model, sample_idx: int = 0,
                                     steps: int = 50,
                                     tag: str = "trajectory"):
    """3D PCA trajectory in mod1 latent space (reference :338-419)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if model.val_loader is None or model.wandb_run is None:
        return

    all_z1 = []
    for mod1, _mod2 in model.val_loader:
        all_z1.append(np.asarray(model.mod1_dbn.represent(as_array(mod1))))
    Z1_all = np.concatenate(all_z1, axis=0)
    N_val = Z1_all.shape[0]
    sample_idx = min(sample_idx, N_val - 1)

    seen = 0
    mod2_s = None
    for mod1, mod2 in model.val_loader:
        b = len(mod1)
        if seen + b <= sample_idx:
            seen += b
            continue
        pos = sample_idx - seen
        mod2_s = as_array(mod2)[pos:pos + 1]
        break
    if mod2_s is None:
        return
    z2 = model.mod2_dbn.represent(mod2_s)
    _, z_traj = _mod2_to_mod1_chain(model, z2, steps)

    mean = Z1_all.mean(0, keepdims=True)
    _, _, Vt = np.linalg.svd(Z1_all - mean, full_matrices=False)
    proj = Vt[:3].T
    Z3 = (Z1_all - mean) @ proj
    T3 = (z_traj - mean) @ proj

    fig = plt.figure(figsize=(6.5, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(Z3[:, 0], Z3[:, 1], Z3[:, 2], s=6, alpha=0.15)
    ax.plot(T3[:, 0], T3[:, 1], T3[:, 2], c="r", linewidth=1.2)
    ax.set_title(f"PCA-3 trajectory sample {sample_idx}")
    fig.tight_layout()
    model.wandb_run.log({f"{tag}/mod2_to_mod1_3d": wandb.Image(fig)})
    plt.close(fig)


# ---------------------------------------------------------------------------
# The model (reference imdbn_bimodal.py:422-1076)
# ---------------------------------------------------------------------------

class iMDBN_BiModal:
    """Bimodal DBN: two modality iDBNs + a joint DBN stack (no softmax
    groups); ``joint_rbm`` aliases joint layer 0 for backward compat
    (reference imdbn_bimodal.py:543-575)."""

    def __init__(self, layer_sizes_mod1: list, layer_sizes_mod2: list,
                 joint_layer_sizes, params: Optional[dict] = None,
                 dataloader=None, val_loader=None, device=None,
                 wandb_run=None, logging_cfg: Optional[dict] = None,
                 seed: Optional[int] = None):
        self.params = params or {}
        self.device = device
        self.dataloader = dataloader
        self.val_loader = val_loader
        self.wandb_run = wandb_run
        self.logging_cfg = logging_cfg or {}
        self._seed = seed

        self.mod1_dbn = iDBN(layer_sizes=layer_sizes_mod1,
                             params=self.params, dataloader=None,
                             val_loader=None, device=self.device,
                             wandb_run=self.wandb_run, seed=seed)
        self.mod2_dbn = iDBN(layer_sizes=layer_sizes_mod2,
                             params=self.params, dataloader=None,
                             val_loader=None, device=self.device,
                             wandb_run=self.wandb_run,
                             seed=None if seed is None else seed + 100)

        self.Dz_mod1 = int(self.mod1_dbn.layers[-1].num_hidden)
        self.Dz_mod2 = int(self.mod2_dbn.layers[-1].num_hidden)

        self._build_joint(joint_layer_sizes)

        self.joint_cd = int(self.params.get("JOINT_CD",
                                            self.params.get("CD", 1)))
        self.cross_steps = int(self.params.get("CROSS_GIBBS_STEPS", 50))

        # params["DP_DEVICES"]=N|"all": data-parallel training (framework
        # extension; reference is single-device). The modality iDBNs read
        # the same key from the shared params dict.
        self.mesh = None
        self._dp_devices = self.params.get("DP_DEVICES")

        try:
            vb_mod1, vb_mod2 = next(iter(val_loader))
            self.validation_mod1 = as_array(vb_mod1)[:8]
            self.validation_mod2 = as_array(vb_mod2)[:8]
        except Exception:
            self.validation_mod1 = None
            self.validation_mod2 = None

        # Features: Subset protocol OR direct dataset
        # (reference imdbn_bimodal.py:512-537).
        self.features = None
        try:
            if hasattr(val_loader.dataset, "indices"):
                indices = val_loader.dataset.indices
                base = val_loader.dataset.dataset
            else:
                base = val_loader.dataset
                indices = range(len(base))
            numeric_labels = np.asarray([base.labels[i] for i in indices],
                                        np.float32)
            cumArea_vals = [base.cumArea_list[i] for i in indices]
            convex_hull = [base.CH_list[i] for i in indices]
            density_src = getattr(base, "density_list", None)
            density_vals = ([density_src[i] for i in indices]
                            if density_src is not None else None)
            self.features = {
                "Cumulative Area": np.asarray(cumArea_vals, np.float32),
                "Convex Hull": np.asarray(convex_hull, np.float32),
                "Labels": numeric_labels,
            }
            if density_vals is not None:
                self.features["Density"] = np.asarray(density_vals,
                                                      np.float32)
            print(f"[iMDBN_BiModal] Extracted features: "
                  f"{list(self.features.keys())}")
        except Exception as e:
            print(f"[iMDBN_BiModal] Warning: Could not extract features "
                  f"for probes: {e}")

        joint_sizes_for_str = (joint_layer_sizes
                               if isinstance(joint_layer_sizes, list)
                               else [joint_layer_sizes])
        self.arch_str = (
            f"MOD1{'-'.join(map(str, layer_sizes_mod1))}"
            f"_MOD2{'-'.join(map(str, layer_sizes_mod2))}"
            f"_JOINT{'-'.join(map(str, joint_sizes_for_str))}")

    def _build_joint(self, joint_layer_sizes) -> None:
        """Joint DBN stack over [z_mod1 ⊕ z_mod2], no softmax groups
        (reference imdbn_bimodal.py:543-575)."""
        if isinstance(joint_layer_sizes, int):
            joint_layer_sizes = [joint_layer_sizes]
        total_visible = self.Dz_mod1 + self.Dz_mod2
        self.joint_layers: List[RBM] = []
        current_visible = total_visible
        for i, hidden_size in enumerate(joint_layer_sizes):
            rbm = RBM(
                num_visible=current_visible,
                num_hidden=int(hidden_size),
                learning_rate=self.params.get(
                    "JOINT_LEARNING_RATE",
                    self.params.get("LEARNING_RATE", 0.1)),
                weight_decay=self.params.get("WEIGHT_PENALTY", 0.0001),
                momentum=self.params.get("INIT_MOMENTUM", 0.5),
                dynamic_lr=self.params.get("LEARNING_RATE_DYNAMIC", True),
                final_momentum=self.params.get("FINAL_MOMENTUM", 0.95),
                softmax_groups=[],
                seed=(None if self._seed is None
                      else self._seed + 2000 + i),
                dtype=param_dtype(self.params),
                sr=param_sr(self.params),
            )
            self.joint_layers.append(rbm)
            current_visible = int(hidden_size)
        self.joint_rbm = self.joint_layers[0]
        self.num_joint_layers = len(self.joint_layers)
        _warn_compute_dtype_joint(self.params, "iMDBN_BiModal")

    # -- pretrained loading (reference :577-614) ------------------------------

    def load_pretrained_mod1_dbn(self, path: str) -> bool:
        return self._load_pretrained_dbn(self.mod1_dbn, path, "mod1")

    def load_pretrained_mod2_dbn(self, path: str) -> bool:
        return self._load_pretrained_dbn(self.mod2_dbn, path, "mod2")

    def _load_pretrained_dbn(self, dbn: iDBN, path: str, name: str) -> bool:
        try:
            with open(path, "rb") as f:
                obj = pickle.load(f)
        except Exception as e:
            print(f"[load_pretrained_{name}_dbn] error: {e}")
            return False
        if isinstance(obj, dict) and "layers" in obj:
            dbn.layers = list(obj["layers"])
        elif hasattr(obj, "layers"):
            dbn.layers = list(obj.layers)
        else:
            print(f"[load_pretrained_{name}_dbn] unrecognized format")
            return False
        for rbm in dbn.layers:
            if hasattr(rbm, "reset_momentum"):
                rbm.reset_momentum()
            if not hasattr(rbm, "softmax_groups"):
                rbm.softmax_groups = []
        print(f"[load_pretrained_{name}_dbn] loaded from {path}")
        return True

    # -- fine-tuning hooks (absent in the reference class; its CLI calls
    # them and crashes, SURVEY.md §2.2 — provided here so the config knob
    # works) -------------------------------------------------------------------

    def _finetune_last_layer(self, dbn: iDBN, loader, epochs: int,
                             lr_scale: float, cd_k: Optional[int],
                             batch_index: int = 0) -> None:
        if epochs <= 0 or loader is None:
            return
        last = dbn.layers[-1]
        old_lr = float(last.lr)
        last.lr = max(1e-8, old_lr * float(lr_scale))
        use_cd = int(cd_k) if cd_k is not None else int(dbn.cd_k)
        for ep in range(int(epochs)):
            for batch in loader:
                v = as_array(batch[batch_index])
                for rbm in dbn.layers[:-1]:
                    v = rbm.forward(v)
                last.train_epoch(v, ep, epochs, CD=use_cd)
        last.lr = old_lr

    def _finetune(self, dbn: iDBN, modality_idx: int, epochs: int,
                  lr_scale: float, cd_k: Optional[int]) -> None:
        loader = getattr(dbn, "dataloader", None)
        if loader is not None:
            batch_index = 0  # dedicated (images, labels) loader
        else:
            # bimodal loader yields (mod1, mod2): pick this modality
            loader = self.dataloader
            batch_index = modality_idx
        self._finetune_last_layer(dbn, loader, epochs, lr_scale, cd_k,
                                  batch_index=batch_index)

    def finetune_mod1_last_layer(self, epochs: int = 0,
                                 lr_scale: float = 0.3,
                                 cd_k: Optional[int] = None) -> None:
        self._finetune(self.mod1_dbn, 0, epochs, lr_scale, cd_k)

    def finetune_mod2_last_layer(self, epochs: int = 0,
                                 lr_scale: float = 0.3,
                                 cd_k: Optional[int] = None) -> None:
        self._finetune(self.mod2_dbn, 1, epochs, lr_scale, cd_k)

    # -- bias init (reference :616-645) ---------------------------------------

    def init_joint_bias_from_data(self, n_batches: int = 10) -> None:
        """Logit-mean visible biases for both halves of joint layer 0
        (reference imdbn_bimodal.py:616-645)."""
        sum_z1 = sum_z2 = None
        n = 0
        for b, (mod1, mod2) in enumerate(self.dataloader):
            if b >= n_batches:
                break
            z1 = self.mod1_dbn.represent(as_array(mod1))
            z2 = self.mod2_dbn.represent(as_array(mod2))
            sum_z1 = z1.sum(0) if sum_z1 is None else sum_z1 + z1.sum(0)
            sum_z2 = z2.sum(0) if sum_z2 is None else sum_z2 + z2.sum(0)
            n += z1.shape[0]
        if n == 0:
            return
        mean_z1 = jnp.clip(sum_z1 / n, 1e-4, 1 - 1e-4)
        mean_z2 = jnp.clip(sum_z2 / n, 1e-4, 1 - 1e-4)
        vb = self.joint_layers[0].vis_bias
        # cast stats to the storage dtype (scatter of f32 into bf16
        # warns today and errors in future JAX — same fix as iMDBN)
        vb = vb.at[:self.Dz_mod1].set(jnp.asarray(
            jnp.log(mean_z1) - jnp.log1p(-mean_z1), vb.dtype))
        vb = vb.at[self.Dz_mod1:].set(jnp.asarray(
            jnp.log(mean_z2) - jnp.log1p(-mean_z2), vb.dtype))
        self.joint_layers[0].vis_bias = vb

    # -- inference (reference :647-709) ----------------------------------------

    def _cross_reconstruct(self, z_mod1, z_mod2,
                           steps: Optional[int] = None,
                           direction: str = "both"):
        """Symmetric cross-reconstruction through joint layer 0
        (reference imdbn_bimodal.py:648-693). Returns
        (mod1_from_mod2, mod2_from_mod1)."""
        if steps is None:
            steps = self.cross_steps
        return bimodal_ops._bimodal_cross_jit(
            self.joint_rbm.state, self.mod1_dbn._states(),
            self.mod2_dbn._states(), self.joint_rbm._next_key(),
            as_array(z_mod1), as_array(z_mod2), steps=int(steps),
            Dz1=self.Dz_mod1, direction=direction)

    def mod1_to_mod2(self, mod1_images):
        """Decoded modality-2 images from raw modality-1 images [B, ...]
        — convenience over chaining ``mod1_dbn.represent`` +
        ``_cross_reconstruct`` by hand (reference imdbn_bimodal.py:648-693
        has only the internal method)."""
        x = as_array(mod1_images)
        z1 = self.mod1_dbn.represent(x.reshape(x.shape[0], -1))
        z2_0 = jnp.zeros((x.shape[0], self.Dz_mod2), jnp.float32)
        _, mod2 = self._cross_reconstruct(z1, z2_0, direction="1to2")
        return mod2

    def mod2_to_mod1(self, mod2_images):
        """Decoded modality-1 images from raw modality-2 images [B, ...]."""
        x = as_array(mod2_images)
        z2 = self.mod2_dbn.represent(x.reshape(x.shape[0], -1))
        z1_0 = jnp.zeros((x.shape[0], self.Dz_mod1), jnp.float32)
        mod1, _ = self._cross_reconstruct(z1_0, z2, direction="2to1")
        return mod1

    def sample_mod1_to_mod2(self, mod1_images,
                            gibbs_steps: Optional[int] = None,
                            seed: Optional[int] = None):
        """GENERATE modality-2 images from modality-1 images: fully
        sampled conditional Gibbs on joint layer 0 + ancestral-sampled
        decode (framework extension; ``mod1_to_mod2`` is the
        reference-semantics mean-field path — see
        ``bimodal_ops.sample_cross``). ``seed`` fixes the draw."""
        return self._sample_cross(mod1_images, "1to2", gibbs_steps, seed)

    def sample_mod2_to_mod1(self, mod2_images,
                            gibbs_steps: Optional[int] = None,
                            seed: Optional[int] = None):
        """GENERATE modality-1 images from modality-2 images (sampled
        counterpart of ``mod2_to_mod1``)."""
        return self._sample_cross(mod2_images, "2to1", gibbs_steps, seed)

    def _sample_cross(self, images, direction, gibbs_steps, seed):
        x = as_array(images)
        x = x.reshape(x.shape[0], -1)
        if direction == "1to2":
            z1 = self.mod1_dbn.represent(x)
            z2 = jnp.zeros((x.shape[0], self.Dz_mod2), jnp.float32)
        else:
            z1 = jnp.zeros((x.shape[0], self.Dz_mod1), jnp.float32)
            z2 = self.mod2_dbn.represent(x)
        steps = int(gibbs_steps if gibbs_steps is not None
                    else self.cross_steps)
        key = (jax.random.key(seed) if seed is not None
               else self.joint_rbm._next_key())
        return bimodal_ops.sample_cross(
            self.joint_rbm.state, self.mod1_dbn._states(),
            self.mod2_dbn._states(), key, z1, z2, steps=steps,
            Dz1=self.Dz_mod1, direction=direction)

    def represent(self, batch: Tuple) -> jax.Array:
        """Joint representation through ALL joint layers (reference
        imdbn_bimodal.py:695-709)."""
        mod1_data, mod2_data = batch
        z1 = self.mod1_dbn.represent(as_array(mod1_data))
        z2 = self.mod2_dbn.represent(as_array(mod2_data))
        h = jnp.concatenate([z1, z2], axis=1)
        for rbm in self.joint_layers:
            h = rbm.forward(h)
        return h

    # -- joint training (reference :711-961) -----------------------------------

    def set_mesh(self, mesh) -> None:
        """Enable data-parallel training for all three phases (both
        modality iDBNs + the joint DBN). Accepts a ``jax.sharding.Mesh``,
        a device count, ``"all"``, or ``None``."""
        from multimodal_idbn_tpu.parallel import resolve_mesh
        self.mesh = resolve_mesh(mesh)
        # Explicit set_mesh (including None) overrides DP_DEVICES.
        self._dp_devices = None
        self.mod1_dbn.set_mesh(self.mesh)
        self.mod2_dbn.set_mesh(self.mesh)

    def _resolve_mesh(self):
        if self.mesh is None and self._dp_devices:
            self.set_mesh(self._dp_devices)
            self._dp_devices = None
        return self.mesh

    def _joint_states(self):
        return tuple(r.state for r in self.joint_layers)

    def _set_joint_states(self, states) -> None:
        for r, s in zip(self.joint_layers, states):
            r.state = s

    def train_joint(self, epochs: int, log_every: int = 5,
                    log_every_pca: int = 25, log_every_probe: int = 10,
                    log_every_trajectory: int = 50,
                    fused: Optional[bool] = None, start_epoch: int = 0,
                    checkpoint_every: int = 0,
                    checkpoint_path: Optional[str] = None) -> None:
        """Alternating-modality warmup then per-layer free CD + aux clamps
        with per-batch cross metrics (reference imdbn_bimodal.py:711-961).

        ``start_epoch``/``checkpoint_every``/``checkpoint_path``: crash-
        safe resume, same contract as ``iMDBN.train_joint`` (bit-identical
        via ``fold_in(epoch_key, absolute_epoch)``, tests/test_resume.py).
        """
        epochs = int(epochs)
        start_epoch = int(start_epoch)
        if not 0 <= start_epoch <= epochs:
            raise ValueError(f"start_epoch {start_epoch} outside "
                             f"[0, {epochs}]")
        if checkpoint_every and not checkpoint_path:
            raise ValueError("checkpoint_every needs a checkpoint_path")
        print(f"[iMDBN_BiModal] joint training: {self.num_joint_layers} "
              f"layers, {epochs} epochs total")
        if start_epoch == 0:
            self.init_joint_bias_from_data(n_batches=10)

        if fused is None:
            fused = hasattr(self.dataloader, "materialize")
        mesh = self._resolve_mesh()
        if mesh is not None and not fused:
            raise ValueError("data-parallel joint training needs the "
                             "fused epoch path (a dataloader with "
                             ".materialize(), or fused=True)")
        aux_cond_steps = int(self.params.get("JOINT_AUX_COND_STEPS", 30))
        metrics_every = int(self.params.get("CROSS_METRICS_EVERY", 1))
        epoch_key = jax.random.key(self.params.get("SEED", 0) + 11)

        if fused:
            m1, m2 = self.dataloader.materialize()
            V1 = jnp.asarray(np.asarray(m1).reshape(len(m1), -1), jnp.float32)
            V2 = jnp.asarray(np.asarray(m2).reshape(len(m2), -1), jnp.float32)
            Z1 = self.mod1_dbn.represent(V1)
            Z2 = self.mod2_dbn.represent(V2)
            bs = getattr(self.dataloader, "batch_size", 128)
            n = Z1.shape[0]
            nb = n // bs
            mod1_states = self.mod1_dbn._states()
            mod2_states = self.mod2_dbn._states()

        from multimodal_idbn_tpu.ops.schedules import (
            effective_lr, effective_momentum)

        if fused and self.wandb_run is None:
            # Epoch-blocked path (no per-epoch logging without a run
            # object): warmup and main epochs as two dispatches.
            jr = self.joint_layers[0]
            w_end = min(WARMUP_EPOCHS, epochs)
            blocks = [(s, e, s < w_end) for s, e in checkpoint_epochs(
                start_epoch, epochs,
                checkpoint_every if checkpoint_path else 0, w_end)]
            joint = self._joint_states()
            final_totals = None
            for start, end, warmup in blocks:
                idx = jnp.arange(start, end, dtype=jnp.int32)
                lr_arr = jnp.asarray(
                    [effective_lr(jr.lr, e, jr.dynamic_lr)
                     for e in range(start, end)], jnp.float32)
                mom_arr = jnp.asarray(
                    [effective_momentum(jr.momentum, jr.final_momentum, e)
                     for e in range(start, end)], jnp.float32)
                statics = dict(
                    warmup=warmup, joint_cd=self.joint_cd,
                    aux_cond_steps=aux_cond_steps, Dz1=self.Dz_mod1,
                    steps=self.cross_steps, batch_size=bs,
                    metrics_every=metrics_every, n_epochs=end - start,
                    sr=jr.sr)
                if mesh is not None:
                    from multimodal_idbn_tpu.parallel import (
                        dp_bimodal_epoch_block)
                    joint, cd_sums, cd_counts, totals = (
                        dp_bimodal_epoch_block(
                            mesh, joint, mod1_states, mod2_states,
                            epoch_key, Z1, Z2, V1, V2, idx, lr_arr,
                            mom_arr, jr.weight_decay, **statics))
                else:
                    joint, cd_sums, cd_counts, totals = (
                        bimodal_ops.bimodal_epoch_block(
                            joint, mod1_states, mod2_states, epoch_key,
                            Z1, Z2, V1, V2, idx, lr_arr, mom_arr,
                            jr.weight_decay, **statics))
                final_totals = bimodal_ops.BimodalMetrics(
                    *(np.asarray(t)[-1] for t in totals))
                self._set_joint_states(joint)  # sync for checkpointing
                maybe_save_train_checkpoint(self, checkpoint_path,
                                            checkpoint_every,
                                            "bimodal_joint", end,
                                            epochs)
            self._set_joint_states(joint)
            if final_totals is not None:
                tot = {"n": float(final_totals.n),
                       "mse_mod1": float(final_totals.mse_mod1),
                       "mse_mod2": float(final_totals.mse_mod2)}
                self._log_joint_epoch(epochs - 1, [], tot, 10 ** 9,
                                      10 ** 9, 10 ** 9, 10 ** 9)
            print("[iMDBN_BiModal] joint training finished.")
            return

        if not fused:
            # Non-fused epochs draw batch order from the DataLoader's
            # internal epoch counter; restore/align it so the resumed run
            # sees the same shuffles the uninterrupted run would have.
            align_loader_for_resume(self, start_epoch)
        for epoch in range(start_epoch, epochs):
            warmup = epoch < WARMUP_EPOCHS
            jr = self.joint_layers[0]
            lr = effective_lr(jr.lr, epoch, jr.dynamic_lr)
            mom = effective_momentum(jr.momentum, jr.final_momentum, epoch)

            if fused:
                key = jax.random.fold_in(epoch_key, epoch)
                # Permute here so the remainder batch is exactly the
                # unselected shuffle tail (each sample trains once/epoch).
                perm = jax.random.permutation(jax.random.fold_in(key, 0), n)
                Z1p, Z2p, V1p, V2p = (a[perm] for a in (Z1, Z2, V1, V2))
                statics = dict(
                    warmup=warmup, joint_cd=self.joint_cd,
                    aux_cond_steps=aux_cond_steps, Dz1=self.Dz_mod1,
                    steps=self.cross_steps, batch_size=bs,
                    metrics_every=metrics_every, shuffle=False,
                    sr=jr.sr)
                if mesh is not None:
                    from multimodal_idbn_tpu.parallel import (
                        dp_bimodal_joint_epoch)
                    joint, mean_cd, totals = dp_bimodal_joint_epoch(
                        mesh, self._joint_states(), mod1_states,
                        mod2_states, key, Z1p[:nb * bs], Z2p[:nb * bs],
                        V1p[:nb * bs], V2p[:nb * bs], lr, mom,
                        jr.weight_decay, **statics)
                else:
                    joint, mean_cd, totals = (
                        bimodal_ops.bimodal_joint_epoch(
                            self._joint_states(), mod1_states,
                            mod2_states, key, Z1p, Z2p, V1p, V2p, lr,
                            mom, jr.weight_decay, **statics))
                rem = n - nb * bs
                cd_losses = [] if warmup else [float(mean_cd)] * nb
                if rem:
                    joint, cd_rem, m_rem = bimodal_ops.bimodal_batch_step(
                        joint, mod1_states, mod2_states,
                        jax.random.fold_in(key, 991), Z1p[nb * bs:],
                        Z2p[nb * bs:], V1p[nb * bs:], V2p[nb * bs:], lr,
                        mom, jr.weight_decay, warmup=warmup,
                        joint_cd=self.joint_cd,
                        aux_cond_steps=aux_cond_steps, Dz1=self.Dz_mod1,
                        steps=self.cross_steps,
                        compute_metrics=(metrics_every == 1), sr=jr.sr)
                    totals = bimodal_ops.BimodalMetrics(
                        *(a + b for a, b in zip(totals, m_rem)))
                    if not warmup:
                        cd_losses.append(float(cd_rem))
                self._set_joint_states(joint)
                tot = {"n": float(totals.n),
                       "mse_mod1": float(totals.mse_mod1),
                       "mse_mod2": float(totals.mse_mod2)}
            else:
                cd_losses, tot = self._train_joint_epoch_batched(
                    epoch, epochs, warmup, aux_cond_steps, metrics_every)

            self._log_joint_epoch(epoch, cd_losses, tot, log_every,
                                  log_every_pca, log_every_probe,
                                  log_every_trajectory)
            maybe_save_train_checkpoint(self, checkpoint_path,
                                        checkpoint_every, "bimodal_joint",
                                        epoch + 1, epochs,
                                        cadence_only=True)

        print("[iMDBN_BiModal] joint training finished.")

    def _train_joint_epoch_batched(self, epoch, epochs, warmup,
                                   aux_cond_steps, metrics_every: int = 1):
        """Reference-style per-batch loop for non-materializable loaders."""
        from multimodal_idbn_tpu.ops.schedules import (
            effective_lr, effective_momentum)

        cd_losses = []
        tot = {"n": 0.0, "mse_mod1": 0.0, "mse_mod2": 0.0}
        jr = self.joint_rbm
        for b_idx, (mod1, mod2) in enumerate(self.dataloader):
            v1 = as_array(mod1)
            v2 = as_array(mod2)
            z1 = self.mod1_dbn.represent(v1)
            z2 = self.mod2_dbn.represent(v2)
            compute_metrics = (metrics_every <= 1
                               or (b_idx % metrics_every) == 0)
            joint, cd_loss, m = bimodal_ops.bimodal_batch_step(
                self._joint_states(), self.mod1_dbn._states(),
                self.mod2_dbn._states(), jr._next_key(), z1, z2, v1, v2,
                effective_lr(jr.lr, epoch, jr.dynamic_lr),
                effective_momentum(jr.momentum, jr.final_momentum, epoch),
                jr.weight_decay, warmup=warmup, joint_cd=self.joint_cd,
                aux_cond_steps=aux_cond_steps, Dz1=self.Dz_mod1,
                steps=self.cross_steps, compute_metrics=compute_metrics,
                sr=jr.sr)
            self._set_joint_states(joint)
            if not warmup:
                cd_losses.append(float(cd_loss))
            tot["n"] += float(m.n)
            tot["mse_mod1"] += float(m.mse_mod1)
            tot["mse_mod2"] += float(m.mse_mod2)
        return cd_losses, tot

    def _log_joint_epoch(self, epoch, cd_losses, tot, log_every,
                         log_every_pca, log_every_probe,
                         log_every_trajectory) -> None:
        """Epoch-tail logging (reference imdbn_bimodal.py:833-959)."""
        self.last_metrics = None
        if tot["n"] > 0:
            npix1 = self.mod1_dbn.layers[0].num_visible
            npix2 = self.mod2_dbn.layers[0].num_visible
            self.last_metrics = {
                "cross_modality/mod1_mse": tot["mse_mod1"] / (tot["n"]
                                                              * npix1),
                "cross_modality/mod2_mse": tot["mse_mod2"] / (tot["n"]
                                                              * npix2),
            }
        if self.wandb_run is None:
            return
        if cd_losses:
            self.wandb_run.log({"joint/cd_loss": float(np.mean(cd_losses)),
                                "epoch": epoch})
        if self.last_metrics is not None:
            self.wandb_run.log(dict(self.last_metrics, epoch=epoch))

        if self.val_loader is not None:
            if epoch % log_every_pca == 0:
                try:
                    from multimodal_idbn_tpu.utils.pca import (
                        pca_fit_transform)
                    from multimodal_idbn_tpu.utils.wandb_utils import (
                        plot_2d_embedding_and_correlations,
                        plot_3d_embedding_and_correlations)
                    E, feats = (
                        compute_bimodal_joint_embeddings_and_features(self))
                    if E.size > 0 and E.shape[0] > 2 and E.shape[1] > 2:
                        feat_map = {}
                        for src, dst in (("cum_area", "Cumulative Area"),
                                         ("convex_hull", "Convex Hull"),
                                         ("labels", "Labels"),
                                         ("density", "Density")):
                            if src in feats:
                                feat_map[dst] = np.asarray(feats[src])
                        p2 = pca_fit_transform(E, 2)
                        plot_2d_embedding_and_correlations(
                            emb_2d=p2, features=feat_map,
                            arch_name="Joint_bimodal", dist_name="val",
                            method_name="pca", wandb_run=self.wandb_run)
                        if E.shape[1] >= 3:
                            p3 = pca_fit_transform(E, 3)
                            plot_3d_embedding_and_correlations(
                                emb_3d=p3, features=feat_map,
                                arch_name="Joint_bimodal", dist_name="val",
                                method_name="pca", wandb_run=self.wandb_run)

                    # MOD2 latent PCA, Labels coloring only (:887-912)
                    all_z2 = [np.asarray(self.mod2_dbn.represent(
                        as_array(m2))) for _m1, m2 in self.val_loader]
                    Z2_all = np.concatenate(all_z2, axis=0)
                    if Z2_all.shape[0] > 2 and Z2_all.shape[1] > 2:
                        mnist_feat_map = {}
                        if "labels" in feats:
                            mnist_feat_map["Labels"] = np.asarray(
                                feats["labels"])
                        p2m = pca_fit_transform(Z2_all, 2)
                        plot_2d_embedding_and_correlations(
                            emb_2d=p2m, features=mnist_feat_map,
                            arch_name="MOD2_MNIST100", dist_name="val",
                            method_name="pca", wandb_run=self.wandb_run)
                        if Z2_all.shape[1] >= 3:
                            p3m = pca_fit_transform(Z2_all, 3)
                            plot_3d_embedding_and_correlations(
                                emb_3d=p3m, features=mnist_feat_map,
                                arch_name="MOD2_MNIST100", dist_name="val",
                                method_name="pca", wandb_run=self.wandb_run)
                except Exception as e:
                    self.wandb_run.log({"warn/joint_pca_error": str(e)})

            if epoch % log_every_probe == 0:
                try:
                    log_bimodal_joint_linear_probe(
                        self, epoch=epoch, n_bins=5, test_size=0.2,
                        steps=1000, lr=1e-2, patience=20, min_delta=0.0,
                        metric_prefix="joint")
                except Exception as e:
                    self.wandb_run.log({"warn/joint_probe_error": str(e)})

            if epoch % log_every_trajectory == 0:
                traj_cfg = self.logging_cfg.get("trajectory", {})
                if traj_cfg.get("enable", False):
                    try:
                        num_samples = traj_cfg.get("num_samples", 4)
                        for s_idx in range(num_samples):
                            log_bimodal_latent_trajectory(
                                self, sample_idx=s_idx,
                                steps=self.cross_steps,
                                tag=f"trajectory/sample{s_idx}", n_frames=8)
                        if traj_cfg.get("plot_3d", True):
                            log_bimodal_latent_trajectory_3d(
                                self, sample_idx=0, steps=self.cross_steps,
                                tag="trajectory")
                    except Exception as e:
                        self.wandb_run.log({"warn/trajectory_error": str(e)})

        if epoch % max(1, int(log_every)) == 0:
            self._log_snapshots(epoch)

    def _log_snapshots(self, epoch: int, num: int = 8) -> None:
        """Reconstruction snapshot grids + MSEs (reference :963-1015)."""
        if self.wandb_run is None or self.validation_mod1 is None:
            return
        try:
            from multimodal_idbn_tpu.utils.wandb_utils import make_grid
            mod1 = self.validation_mod1[:num]
            mod2 = self.validation_mod2[:num]
            z1 = self.mod1_dbn.represent(mod1)
            z2 = self.mod2_dbn.represent(mod2)
            rec1, rec2 = self._cross_reconstruct(z1, z2,
                                                 steps=self.cross_steps)
            B = mod1.shape[0]
            m1 = np.asarray(mod1)
            m2 = np.asarray(mod2)
            r1 = np.clip(np.asarray(rec1), 0, 1)
            r2 = np.clip(np.asarray(rec2), 0, 1)

            side1 = int(round(m1.shape[1] ** 0.5))
            pair1 = np.stack([m1.reshape(B, side1, side1),
                              r1.reshape(B, side1, side1)],
                             axis=1).reshape(-1, side1, side1)
            self.wandb_run.log({"snap/mod1_from_mod2":
                                wandb.Image(make_grid(pair1, nrow=2)),
                                "epoch": epoch})

            if m2.shape[1] == 1568:  # 28x56 MNIST-100
                h2, w2 = 28, 56
            else:
                h2 = w2 = int(round(m2.shape[1] ** 0.5))
            pair2 = np.stack([m2.reshape(B, h2, w2),
                              r2.reshape(B, h2, w2)],
                             axis=1).reshape(-1, h2, w2)
            self.wandb_run.log({"snap/mod2_from_mod1":
                                wandb.Image(make_grid(pair2, nrow=2)),
                                "epoch": epoch})

            mse1 = float(np.mean((r1 - m1) ** 2))
            mse2 = float(np.mean((r2 - m2) ** 2))
            self.wandb_run.log({"snap/mod1_mse": mse1, "snap/mod2_mse": mse2,
                                "epoch": epoch})
        except Exception as e:
            self.wandb_run.log({"warn/snap_error": str(e), "epoch": epoch})

    # -- persistence (reference :1017-1076) -------------------------------------

    def save_model(self, path: str) -> None:
        import datetime
        payload = {
            "mod1_dbn": self.mod1_dbn,
            "mod2_dbn": self.mod2_dbn,
            "joint_layers": self.joint_layers,
            "num_joint_layers": self.num_joint_layers,
            "Dz_mod1": self.Dz_mod1,
            "Dz_mod2": self.Dz_mod2,
            "params": self.params,
            "arch_str": self.arch_str,
            "features": self.features,
            "metadata": {
                "saved_at": datetime.datetime.now().isoformat(),
                "model_type": "iMDBN_BiModal",
                "architecture": self.arch_str,
            },
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        print(f"[iMDBN_BiModal] Model saved to {path}")
        print(f"[iMDBN_BiModal] Architecture: {self.arch_str}")

    @staticmethod
    def load_model(path: str, device=None) -> Dict[str, Any]:
        """Load payload; upgrades old single-``joint_rbm`` payloads to the
        ``joint_layers`` format (reference imdbn_bimodal.py:1044-1076)."""
        del device
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if "joint_layers" not in payload and "joint_rbm" in payload:
            payload["joint_layers"] = [payload["joint_rbm"]]
            payload["num_joint_layers"] = 1
        print(f"[iMDBN_BiModal] Model loaded from {path}")
        if "arch_str" in payload:
            print(f"[iMDBN_BiModal] Architecture: {payload['arch_str']}")
        return payload

    def __getstate__(self):
        d = dict(self.__dict__)
        d["wandb_run"] = None
        d["dataloader"] = None
        d["val_loader"] = None
        return d
