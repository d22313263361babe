"""iMDBN: multimodal DBN (image iDBN + joint RBM over [z_img ⊕ y]).

API mirror of reference imdbn/models/imdbn.py:42-934: same constructor
disambiguation, training schedule (8 warmup y-clamp epochs, free CD +
aux clamps, per-batch cross-modal metrics), cross-modal inference, and
dual-format pickle save. The execution model is TPU-native: image latents
are precomputed once per joint-training run (the image iDBN is frozen
there), and each epoch is a single fused on-device scan
(``multimodal_idbn_tpu.ops.imdbn_ops.joint_epoch``).
"""

from __future__ import annotations

import os
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
from multimodal_idbn_tpu.ops import imdbn_ops

# Hardcoded in the reference (imdbn.py:540).
WARMUP_Y_EPOCHS = 8


class iMDBN:
    """Image-Multimodal DBN: pretrained image iDBN + joint RBM whose
    visible layer is [z_img (Bernoulli) ⊕ y (softmax group)]
    (reference imdbn.py:42-66, joint built at :191-214).

    Supports both reference constructor signatures (imdbn.py:105-112):
    long form ``iMDBN(image_layers, text_layers, joint_hidden, ...)`` and
    short form ``iMDBN(image_layers, joint_hidden, ...)``.

    Extra attribute ``reference_best_of_k_bug`` (default True): the
    reference's best-of-K candidate selection is a no-op because RBM has
    no ``free_energy`` method (SURVEY.md §2.1(10)); set False to enable
    real free-energy selection.
    """

    def __init__(self, layer_sizes_img: list, layer_sizes_txt_or_joint=None,
                 joint_layer_size: Optional[int] = None,
                 params: Optional[dict] = None, dataloader=None,
                 val_loader=None, device=None, text_posenc_dim: int = 0,
                 num_labels: int = 32, embedding_dim: int = 64,
                 wandb_run=None, logging_config_path: Optional[str] = None,
                 logging_cfg: Optional[dict] = None,
                 seed: Optional[int] = None):
        # Constructor signature disambiguation (imdbn.py:105-112).
        if isinstance(layer_sizes_txt_or_joint, (list, tuple)):
            if joint_layer_size is None:
                raise ValueError(
                    "joint_layer_size required with legacy constructor "
                    "signature")
        else:
            if joint_layer_size is None:
                joint_layer_size = int(layer_sizes_txt_or_joint)

        del text_posenc_dim, embedding_dim  # ignored, API compat (imdbn.py:96-98)

        self.params = params or {}
        self.device = device
        self.dataloader = dataloader
        self.val_loader = val_loader
        self.wandb_run = wandb_run
        self._seed = seed

        # The CLI passes the yaml `logging:` tree as a dict (the reference
        # monolith accepts it at gdbn_model_complete.py:619-620); the
        # path-based fallback mirrors the extracted file (imdbn.py:121-132).
        self.logging_cfg = dict(logging_cfg) if logging_cfg else {}
        if not self.logging_cfg:
            try:
                import yaml
                from pathlib import Path
                cfg_path = (Path(logging_config_path) if logging_config_path
                            else Path("configs/logging_config.yaml"))
                if cfg_path.exists():
                    with cfg_path.open("r") as f:
                        cfg = yaml.safe_load(f)
                    if isinstance(cfg, dict):
                        self.logging_cfg = cfg
            except Exception:
                pass

        self.num_labels = int(num_labels)

        # Cache validation batch for snapshots (imdbn.py:137-145).
        try:
            vb_imgs, vb_lbls = next(iter(val_loader))
            self.validation_images = as_array(vb_imgs)[:8]
            self.validation_labels = as_array(vb_lbls)[:8]
            self.val_batch = (vb_imgs, vb_lbls)
        except Exception:
            self.validation_images = None
            self.validation_labels = None
            self.val_batch = None

        # Image iDBN (imdbn.py:148-156).
        self.image_idbn = iDBN(
            layer_sizes=layer_sizes_img, params=self.params,
            dataloader=self.dataloader, val_loader=self.val_loader,
            device=self.device, wandb_run=self.wandb_run,
            logging_config_path=logging_config_path, seed=seed)

        dz_from_img = int(self.image_idbn.layers[-1].num_hidden)
        self.Dz_img = dz_from_img
        self._build_joint(Dz_img=dz_from_img, joint_hidden=joint_layer_size)

        self.joint_cd = int(self.params.get("JOINT_CD",
                                            self.params.get("CD", 1)))
        self.cross_steps = int(self.params.get("CROSS_GIBBS_STEPS", 50))
        # Parsed but unused by the reference training loop (SURVEY.md §2.2);
        # kept as attributes for API parity.
        self.aux_every_k = int(self.params.get("JOINT_AUX_EVERY_K", 0))
        self.aux_cond_steps = int(self.params.get("JOINT_AUX_COND_STEPS", 50))

        self.reference_best_of_k_bug = True
        self.z_class_mean: Optional[jax.Array] = None

        # params["DP_DEVICES"]=N|"all": data-parallel joint training over
        # a 1-D mesh (framework extension, SURVEY.md §2 row 20 is absent
        # in the reference). The image iDBN reads the same key from the
        # shared params dict, so one knob scales both phases.
        self.mesh = None
        self._dp_devices = self.params.get("DP_DEVICES")

        # Validation features via the Subset metadata protocol
        # (imdbn.py:170-187).
        self.features = None
        try:
            indices = val_loader.dataset.indices
            base = val_loader.dataset.dataset
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
        except Exception:
            pass

        self.arch_str = (f"IMG{'-'.join(map(str, layer_sizes_img))}"
                         f"_JOINT{joint_layer_size}")

    # -- construction helpers ---------------------------------------------------

    def _build_joint(self, Dz_img: int, joint_hidden: int) -> None:
        """Joint RBM: visible [z_img ⊕ y] with the label block as a softmax
        group (reference imdbn.py:191-214)."""
        self.Dz_img = int(Dz_img)
        K = self.num_labels
        self.joint_rbm = RBM(
            num_visible=self.Dz_img + K,
            num_hidden=int(joint_hidden),
            learning_rate=self.params.get(
                "JOINT_LEARNING_RATE", self.params.get("LEARNING_RATE", 0.1)),
            weight_decay=self.params.get("WEIGHT_PENALTY", 0.0001),
            momentum=self.params.get("INIT_MOMENTUM", 0.5),
            dynamic_lr=self.params.get("LEARNING_RATE_DYNAMIC", True),
            final_momentum=self.params.get("FINAL_MOMENTUM", 0.95),
            softmax_groups=[(self.Dz_img, self.Dz_img + K)],
            seed=None if self._seed is None else self._seed + 1000,
            dtype=param_dtype(self.params),
            sr=param_sr(self.params),
        )
        _warn_compute_dtype_joint(self.params, "iMDBN")

    def _joint_groups(self) -> Tuple[Tuple[int, int], ...]:
        return ((self.Dz_img, self.Dz_img + self.num_labels),)

    def set_mesh(self, mesh) -> None:
        """Enable data-parallel training for BOTH phases: the image iDBN
        epochs and the joint epochs (``parallel.dp_joint_epoch``). Accepts
        a ``jax.sharding.Mesh``, a device count, ``"all"``, or ``None``."""
        from multimodal_idbn_tpu.parallel import resolve_mesh
        self.mesh = resolve_mesh(mesh)
        # Explicit set_mesh (including None) overrides DP_DEVICES.
        self._dp_devices = None
        self.image_idbn.set_mesh(self.mesh)

    def _resolve_mesh(self):
        if self.mesh is None and self._dp_devices:
            self.set_mesh(self._dp_devices)
            self._dp_devices = None
        return self.mesh

    # -- data-dependent init (imdbn.py:217-292) -----------------------------------

    def _materialized_train(self, limit: Optional[int] = None):
        """(images_flat [N,D], onehot [N,K], z_img [N,Dz]) as device arrays.

        Works for any loader: ``materialize()`` when available, else
        batch iteration (the reference contract supports plain loaders,
        imdbn.py:244-251). ``limit`` caps the rows *before* encoding.
        """
        if hasattr(self.dataloader, "materialize"):
            imgs, y = self.dataloader.materialize()
            imgs = np.asarray(imgs)
            y = np.asarray(y, np.float32)
            if limit is not None:
                imgs, y = imgs[:limit], y[:limit]
        else:
            im_list, y_list, n = [], [], 0
            for bi, bl in self.dataloader:
                im_list.append(np.asarray(bi))
                y_list.append(np.asarray(bl, np.float32))
                n += len(im_list[-1])
                if limit is not None and n >= limit:
                    break
            if not im_list:
                raise RuntimeError("empty dataloader")
            imgs = np.concatenate(im_list, axis=0)
            y = np.concatenate(y_list, axis=0)
            if limit is not None:
                imgs, y = imgs[:limit], y[:limit]
        X = jnp.asarray(imgs.reshape(len(imgs), -1), jnp.float32)
        Y = jnp.asarray(y)
        Z = self.image_idbn.represent(X)
        return X, Y, Z

    def init_joint_bias_from_data(self, n_batches: int = 10,
                                  _cached=None) -> None:
        """Set joint visible biases + per-class latent means from data
        statistics (reference imdbn.py:217-292, SURVEY.md §2.1(9)).

        Statistics are taken over the first ``n_batches`` worth of samples
        (the reference scans its shuffled loader's first 10 batches; same
        sample count, deterministic order here). ``_cached`` lets
        ``train_joint`` reuse an already-materialized (X, Y, Z) triple.
        """
        bs = getattr(self.dataloader, "batch_size", 128)
        limit = int(n_batches) * int(bs)
        if _cached is not None:
            _, Y, Z = _cached
            Z, Y = Z[:limit], Y[:limit]
        else:
            _, Y, Z = self._materialized_train(limit=limit)
        if Z.shape[0] == 0:
            return
        z_bias, y_bias, z_class_mean = imdbn_ops.joint_bias_stats(
            Z, Y, num_classes=self.num_labels)
        Dz, K = self.Dz_img, self.num_labels
        vb0 = self.joint_rbm.vis_bias
        # cast stats to the storage dtype (scatter of f32 into bf16 warns
        # and will become an error in future JAX)
        vb = vb0.at[:Dz].set(jnp.asarray(z_bias, vb0.dtype))
        vb = vb.at[Dz:Dz + K].set(jnp.asarray(y_bias, vb0.dtype))
        self.joint_rbm.vis_bias = vb
        self.z_class_mean = z_class_mean
        self.z_class_count = Y.sum(0)

    # -- pretrained iDBN loading (imdbn.py:294-342) --------------------------------

    def load_pretrained_image_idbn(self, path: str) -> bool:
        """Load a pickled iDBN (``{"layers": [...]}" dict or object with
        ``.layers``); re-zeros momentum; rebuilds the joint RBM if the top
        width changed (reference imdbn.py:294-342)."""
        try:
            with open(path, "rb") as f:
                obj = pickle.load(f)
        except Exception as e:
            print(f"[load_pretrained_image_idbn] error: {e}")
            return False

        if isinstance(obj, dict) and "layers" in obj:
            self.image_idbn.layers = list(obj["layers"])
        elif hasattr(obj, "layers"):
            self.image_idbn = obj
            if not hasattr(self.image_idbn, "text_flag"):
                self.image_idbn.text_flag = False
            if not hasattr(self.image_idbn, "arch_dir"):
                self.image_idbn.arch_dir = os.path.join("logs-idbn", "loaded")
                os.makedirs(self.image_idbn.arch_dir, exist_ok=True)
        else:
            print("[load_pretrained_image_idbn] unrecognized format")
            return False

        for rbm in self.image_idbn.layers:
            if hasattr(rbm, "reset_momentum"):
                rbm.reset_momentum()
            if not hasattr(rbm, "softmax_groups"):
                rbm.softmax_groups = []

        dz_pre = int(self.image_idbn.layers[-1].num_hidden)
        if dz_pre != getattr(self, "Dz_img", dz_pre):
            print(f"[load_pretrained_image_idbn] rebuilding joint: "
                  f"Dz_img -> {dz_pre}")
            self._build_joint(Dz_img=dz_pre,
                              joint_hidden=self.joint_rbm.num_hidden)

        print(f"[load_pretrained_image_idbn] loaded from {path}")
        return True

    def finetune_image_last_layer(self, epochs: int = 0,
                                  lr_scale: float = 0.3,
                                  cd_k: Optional[int] = None) -> None:
        """Fine-tune the top image RBM at reduced lr (imdbn.py:344-384)."""
        if epochs <= 0:
            return
        last = self.image_idbn.layers[-1]
        old_lr = float(last.lr)
        last.lr = max(1e-8, old_lr * float(lr_scale))
        use_cd = int(cd_k) if cd_k is not None else int(self.image_idbn.cd_k)
        print(f"[finetune_image_last_layer] epochs={epochs}, "
              f"lr={last.lr:.4g}, CD={use_cd}")

        for ep in range(int(epochs)):
            losses = []
            for img, _ in self.dataloader:
                v = as_array(img)
                for rbm in self.image_idbn.layers[:-1]:
                    v = rbm.forward(v)
                losses.append(float(last.train_epoch(v, ep, epochs,
                                                     CD=use_cd)))
            if self.wandb_run and losses:
                self.wandb_run.log({
                    "img_last/finetune_loss": float(np.mean(losses)),
                    "epoch_ft": ep})
        last.lr = old_lr
        print("[finetune_image_last_layer] done")

    # -- cross-modal inference (imdbn.py:387-488) ----------------------------------

    def _cross_reconstruct(self, z_img, y_onehot,
                           steps: Optional[int] = None,
                           direction: str = "both"):
        """IMG→TXT + TXT→IMG round trip; returns (decoded images, p(y|img)).

        Reference imdbn.py:387-488; best-of-K selection honors
        ``self.reference_best_of_k_bug`` (SURVEY.md §2.1(10)).
        """
        if steps is None:
            steps = self.cross_steps
        z_img = as_array(z_img)
        y_onehot = as_array(y_onehot)
        z_affine = None
        if (getattr(self, "z_affine_scale", None) is not None
                and getattr(self, "z_affine_bias", None) is not None):
            z_affine = (jnp.asarray(self.z_affine_scale, jnp.float32),
                        jnp.asarray(self.z_affine_bias, jnp.float32))
        img, p_y = imdbn_ops._cross_reconstruct_jit(
            self.joint_rbm.state, self.image_idbn._states(),
            self.joint_rbm._next_key(), z_img, y_onehot, steps=int(steps),
            Dz=self.Dz_img, groups=self._joint_groups(),
            z_class_mean=self.z_class_mean, z_affine=z_affine,
            use_free_energy=not self.reference_best_of_k_bug,
            direction=direction)
        return img, p_y

    def img2txt(self, images):
        """Label posterior p(y|img) [B, K] for raw images [B, D] or
        [B, H, W] — the IMG→TXT half of the cross-modal round trip
        (conditional mean-field Gibbs with the z block clamped).

        Convenience over the reference flow, which requires the caller to
        chain ``image_idbn.represent`` + ``_cross_reconstruct`` by hand
        (reference imdbn.py:387-488)."""
        img = as_array(images)
        img = img.reshape(img.shape[0], -1)
        z = self.image_idbn.represent(img)
        y0 = jnp.zeros((img.shape[0], self.num_labels), jnp.float32)
        _, p_y = self._cross_reconstruct(z, y0, direction="img2txt")
        return p_y

    def _labels_to_onehot(self, labels) -> np.ndarray:
        """Validate + convert integer class ids [B] or one-hot [B, K]
        (shared by the mean txt2img path and the sampled generator)."""
        y = np.asarray(as_array(labels))
        if y.ndim == 1:
            ids = y.astype(np.int64)
            if ids.size and (ids.min() < 0 or ids.max() >= self.num_labels):
                raise ValueError(
                    f"label ids must be in [0, {self.num_labels}); got "
                    f"range [{ids.min()}, {ids.max()}]")
            y = np.eye(self.num_labels, dtype=np.float32)[ids]
        elif y.shape[-1] != self.num_labels:
            raise ValueError(
                f"one-hot labels must have width {self.num_labels}; got "
                f"{y.shape}")
        return y.astype(np.float32)

    def txt2img(self, labels):
        """Decoded images [B, D] from labels — the TXT→IMG half (noisy
        mean-field annealing with μ-pull, decoded through the image iDBN).

        ``labels`` may be integer class ids [B] or one-hot [B, K]."""
        y = self._labels_to_onehot(labels)
        z0 = jnp.zeros((y.shape[0], self.Dz_img), jnp.float32)
        img, _ = self._cross_reconstruct(z0, y.astype(np.float32),
                                         direction="txt2img")
        return img

    def sample_txt2img(self, labels, gibbs_steps: Optional[int] = None,
                       seed: Optional[int] = None):
        """GENERATE images from labels: sampled conditional Gibbs on the
        joint RBM (y clamped, h and v sampled each step) + ancestral-
        sampled decode through the image iDBN. Framework extension — the
        reference's ``txt2img`` flow is a mean-field decoder whose
        L2-optimal output is the information-bounded per-class mean
        (benchmarks/RESULTS.md); this draws individual sharp images from
        p(img | y) instead. Different seeds give different draws;
        ``seed`` fixes the draw.

        ``labels``: integer class ids [B] or one-hot [B, K]. Returns
        pixel probabilities [B, D] of the sampled configuration.
        """
        y = self._labels_to_onehot(labels)
        steps = int(gibbs_steps if gibbs_steps is not None
                    else self.cross_steps)
        key = (jax.random.key(seed) if seed is not None
               else self.joint_rbm._next_key())
        z_affine = None
        if (getattr(self, "z_affine_scale", None) is not None
                and getattr(self, "z_affine_bias", None) is not None):
            z_affine = (jnp.asarray(self.z_affine_scale, jnp.float32),
                        jnp.asarray(self.z_affine_bias, jnp.float32))
        imgs, _ = imdbn_ops.sample_txt2img(
            self.joint_rbm.state, self.image_idbn._states(), key,
            jnp.asarray(y, jnp.float32), steps=steps, Dz=self.Dz_img,
            groups=self._joint_groups(), z_affine=z_affine)
        return imgs

    def represent(self, batch) -> jax.Array:
        """Joint hidden activations for (images, one-hot labels)
        (reference imdbn.py:491-506)."""
        img_data, lbl_data = batch
        img = as_array(img_data)
        y = as_array(lbl_data)
        z_img = self.image_idbn.represent(img)
        v = jnp.concatenate([z_img, y], axis=1)
        return self.joint_rbm.forward(v)

    # -- joint training (imdbn.py:508-712) -----------------------------------------

    def train_joint(self, epochs: int, log_every_pca: int = 25,
                    log_every_probe: int = 10, log_every: int = 5,
                    w_rec: float = 1.0, w_sup: float = 0.0,
                    fused: Optional[bool] = None, start_epoch: int = 0,
                    checkpoint_every: int = 0,
                    checkpoint_path: Optional[str] = None) -> None:
        """Joint training: 8 warmup y-clamp epochs, then free CD + aux
        clamps, cross-modal metrics every batch (reference imdbn.py:508-712).

        ``w_rec``/``w_sup`` are accepted and unused, as in the reference
        (imdbn.py:534-535). ``fused=None`` auto-selects the on-device epoch
        path when the dataloader materializes.

        Crash-safe resume (framework extension): ``checkpoint_every=N`` +
        ``checkpoint_path`` write a resumable checkpoint (joint + image
        states, momentum, z_class_mean) every N epochs; ``start_epoch=k``
        continues a run restored by ``checkpoint.load_train_checkpoint``
        (the data-derived bias init is skipped — the restored state
        already carries the trained biases). Epoch RNG is
        ``fold_in(epoch_key, absolute_epoch)``, so resume is
        bit-identical (tests/test_resume.py).
        """
        del w_rec, w_sup
        print("[iMDBN] joint training (with warmup y-clamp)")

        if fused is None:
            fused = hasattr(self.dataloader, "materialize")
        mesh = self._resolve_mesh()
        if mesh is not None and not fused:
            raise ValueError("data-parallel joint training needs the "
                             "fused epoch path (a dataloader with "
                             ".materialize(), or fused=True)")
        epochs = int(epochs)
        start_epoch = int(start_epoch)
        if not 0 <= start_epoch <= epochs:
            raise ValueError(f"start_epoch {start_epoch} outside "
                             f"[0, {epochs}]")
        if checkpoint_every and not checkpoint_path:
            raise ValueError("checkpoint_every needs a checkpoint_path")

        aux_cond_steps = int(self.params.get("JOINT_AUX_COND_STEPS", 10))
        metrics_every = int(self.params.get("CROSS_METRICS_EVERY", 1))
        epoch_key = jax.random.key(self.params.get("SEED", 0) + 7)

        if fused:
            X, Y, Z = self._materialized_train()
            if start_epoch == 0:
                self.init_joint_bias_from_data(n_batches=10,
                                               _cached=(X, Y, Z))
            bs = getattr(self.dataloader, "batch_size", 128)
            idbn_states = self.image_idbn._states()
            n = Z.shape[0]
            nb = n // bs
        elif start_epoch == 0:
            self.init_joint_bias_from_data(n_batches=10)

        from multimodal_idbn_tpu.utils.profiling import StepTimer
        timer = StepTimer()

        if fused and self.wandb_run is None:
            # Epoch-blocked path: no per-epoch logging fires without a run
            # object, so run the warmup epochs and the main epochs as two
            # dispatches (nested scans) — identical key derivation to the
            # per-epoch path, tunnel latency paid twice instead of E times.
            # With a mesh the same blocks run batch-sharded (DP).
            self._train_joint_blocked(epochs, epoch_key, X, Y, Z,
                                      idbn_states, bs, n, aux_cond_steps,
                                      metrics_every, timer, mesh=mesh,
                                      start_epoch=start_epoch,
                                      checkpoint_every=checkpoint_every,
                                      checkpoint_path=checkpoint_path)
            self.epoch_timer = timer
            print("[iMDBN] joint training finished.")
            return

        if not fused:
            # Non-fused epochs draw batch order from the DataLoader's
            # internal epoch counter; restore/align it so the resumed run
            # sees the same shuffles the uninterrupted run would have.
            align_loader_for_resume(self, start_epoch)
        for epoch in range(start_epoch, epochs):
            warmup = epoch < WARMUP_Y_EPOCHS
            jr = self.joint_rbm
            from multimodal_idbn_tpu.ops.schedules import (
                effective_lr, effective_momentum)
            lr = effective_lr(jr.lr, epoch, jr.dynamic_lr)
            mom = effective_momentum(jr.momentum, jr.final_momentum, epoch)

            with timer.step():
                if fused:
                    key = jax.random.fold_in(epoch_key, epoch)
                    # Permute once per epoch so every sample trains exactly
                    # once (the fused epoch's internal shuffle would leave
                    # the remainder tail over/under-sampled).
                    perm = jax.random.permutation(
                        jax.random.fold_in(key, 0), n)
                    Zp, Yp, Xp = Z[perm], Y[perm], X[perm]
                    statics = dict(
                        warmup=warmup, joint_cd=self.joint_cd,
                        aux_cond_steps=aux_cond_steps,
                        Dz=self.Dz_img, steps=self.cross_steps,
                        groups=self._joint_groups(),
                        use_free_energy=not self.reference_best_of_k_bug,
                        zclamp_every=50, batch_size=bs,
                        metrics_every=metrics_every, shuffle=False,
                        sr=self.joint_rbm.sr)
                    if mesh is not None:
                        # The [nb*bs] slice keeps the batch count identical
                        # to the single-device path (dp_joint_epoch would
                        # otherwise trim N to a device-divisible length).
                        from multimodal_idbn_tpu.parallel import (
                            dp_joint_epoch)
                        joint, mean_cd, totals = dp_joint_epoch(
                            mesh, jr.state, idbn_states, key,
                            Zp[:nb * bs], Yp[:nb * bs], Xp[:nb * bs],
                            lr, mom, jr.weight_decay, self.z_class_mean,
                            **statics)
                    else:
                        joint, mean_cd, totals = imdbn_ops.joint_epoch(
                            jr.state, idbn_states, key, Zp, Yp, Xp, lr,
                            mom, jr.weight_decay, self.z_class_mean,
                            **statics)
                    rem = n - nb * bs
                    cd_losses = [] if warmup else [float(mean_cd)] * nb
                    if rem:
                        joint, cd_rem, m_rem = (
                            imdbn_ops.joint_train_batch_step(
                                joint, idbn_states,
                                jax.random.fold_in(key, 991),
                                Zp[nb * bs:], Yp[nb * bs:], Xp[nb * bs:],
                                nb, lr, mom, jr.weight_decay,
                                self.z_class_mean, warmup=warmup,
                                joint_cd=self.joint_cd,
                                aux_cond_steps=aux_cond_steps,
                                Dz=self.Dz_img, steps=self.cross_steps,
                                groups=self._joint_groups(),
                                use_free_energy=(
                                    not self.reference_best_of_k_bug),
                                zclamp_every=50,
                                compute_metrics=(metrics_every == 1),
                                sr=self.joint_rbm.sr))
                        totals = imdbn_ops.CrossMetrics(
                            *(a + b for a, b in zip(totals, m_rem)))
                        if not warmup:
                            cd_losses.append(float(cd_rem))
                    jr.state = joint
                    tot = {k: float(v) for k, v in totals._asdict().items()}
                    npix = X.shape[1]
                else:
                    cd_losses, tot, npix = self._train_joint_epoch_batched(
                        epoch, epochs, warmup, aux_cond_steps,
                        metrics_every)
            timer.log_to(self.wandb_run, prefix="perf/joint_epoch",
                         epoch=epoch)

            self._log_joint_epoch(epoch, cd_losses, tot, npix,
                                  log_every_pca, log_every_probe, log_every)
            maybe_save_train_checkpoint(self, checkpoint_path,
                                        checkpoint_every, "joint",
                                        epoch + 1, epochs,
                                        cadence_only=True)

        self.epoch_timer = timer
        print("[iMDBN] joint training finished.")

    def _train_joint_blocked(self, epochs, epoch_key, X, Y, Z, idbn_states,
                             bs, n, aux_cond_steps, metrics_every,
                             timer, mesh=None, start_epoch: int = 0,
                             checkpoint_every: int = 0,
                             checkpoint_path=None) -> None:
        """Run joint training as epoch blocks — one dispatch each — with
        RNG identical to the per-epoch path. Blocks split at the warmup
        boundary (the warmup/main schedules compile differently) and, when
        checkpointing, at multiples of ``checkpoint_every``."""
        from multimodal_idbn_tpu.ops.schedules import (
            effective_lr, effective_momentum)

        jr = self.joint_rbm
        w_end = min(WARMUP_Y_EPOCHS, epochs)
        blocks = [(s, e, s < w_end) for s, e in checkpoint_epochs(
            start_epoch, epochs,
            checkpoint_every if checkpoint_path else 0, w_end)]

        joint = jr.state
        final_totals = None
        if start_epoch == 0 or not hasattr(self, "joint_metrics_history"):
            self.joint_metrics_history = []
        for start, end, warmup in blocks:
            E = end - start
            idx = jnp.arange(start, end, dtype=jnp.int32)
            lr_arr = jnp.asarray(
                [effective_lr(jr.lr, e, jr.dynamic_lr)
                 for e in range(start, end)], jnp.float32)
            mom_arr = jnp.asarray(
                [effective_momentum(jr.momentum, jr.final_momentum, e)
                 for e in range(start, end)], jnp.float32)
            statics = dict(
                warmup=warmup, joint_cd=self.joint_cd,
                aux_cond_steps=aux_cond_steps, Dz=self.Dz_img,
                steps=self.cross_steps, groups=self._joint_groups(),
                use_free_energy=not self.reference_best_of_k_bug,
                zclamp_every=50, batch_size=bs,
                metrics_every=metrics_every, n_epochs=E,
                sr=self.joint_rbm.sr)
            with timer.step(E):
                if mesh is not None:
                    from multimodal_idbn_tpu.parallel import (
                        dp_joint_epoch_block)
                    joint, cd_sums, cd_counts, totals = (
                        dp_joint_epoch_block(
                            mesh, joint, idbn_states, epoch_key, Z, Y, X,
                            idx, lr_arr, mom_arr, jr.weight_decay,
                            self.z_class_mean, **statics))
                else:
                    joint, cd_sums, cd_counts, totals = (
                        imdbn_ops.joint_epoch_block(
                            joint, idbn_states, epoch_key, Z, Y, X, idx,
                            lr_arr, mom_arr, jr.weight_decay,
                            self.z_class_mean, **statics))
            # Per-epoch metric curves (the block computes them anyway) —
            # kept on the model so blocked runs still expose history.
            per_epoch = [np.asarray(t) for t in totals]
            npix = X.shape[1]
            for ei in range(E):
                n = float(per_epoch[totals._fields.index("n")][ei])
                row = {f: float(a[ei]) for f, a in zip(totals._fields,
                                                       per_epoch)}
                if n > 0:
                    self.joint_metrics_history.append({
                        "epoch": start + ei,
                        "cross_modality/text_top1": row["top1"] / n,
                        "cross_modality/text_top3": row["top3"] / n,
                        "cross_modality/text_ce": row["ce_sum"] / n,
                        "cross_modality/image_mse":
                            row["mse_sum"] / max(1.0, n * npix),
                    })
            final_totals = imdbn_ops.CrossMetrics(
                *(np.asarray(t)[-1] for t in totals))
            jr.state = joint  # keep the shell synced for checkpointing
            maybe_save_train_checkpoint(self, checkpoint_path,
                                        checkpoint_every, "joint",
                                        end, epochs)
        jr.state = joint

        if final_totals is not None:
            tot = {k: float(v) for k, v in final_totals._asdict().items()}
            self._log_joint_epoch(epochs - 1, [], tot, X.shape[1],
                                  10 ** 9, 10 ** 9, 10 ** 9)

    def _train_joint_epoch_batched(self, epoch, epochs, warmup,
                                   aux_cond_steps, metrics_every: int = 1):
        """Reference-style per-batch loop (imdbn.py:553-639) for loaders
        that cannot materialize."""
        Dz, K = self.Dz_img, self.num_labels
        cd_losses = []
        tot = {"n": 0.0, "top1": 0.0, "top3": 0.0, "ce_sum": 0.0,
               "mse_sum": 0.0}
        npix = None
        for b_idx, (img, y) in enumerate(self.dataloader):
            img = as_array(img)
            y = as_array(y)
            z_img = self.image_idbn.represent(img)
            B = z_img.shape[0]
            v_plus = jnp.concatenate([z_img, y], axis=1)
            v_known = jnp.concatenate(
                [jnp.zeros((B, Dz), jnp.float32), y], axis=1)
            km = jnp.concatenate(
                [jnp.zeros((B, Dz), jnp.float32),
                 jnp.ones((B, K), jnp.float32)], axis=1)

            if warmup:
                for _ in range(2):
                    self.joint_rbm.train_epoch_clamped(
                        v_known, km, epoch, epochs, CD=1,
                        cond_init_steps=aux_cond_steps, sample_h=False,
                        sample_v=False, aux_lr_mult=0.3,
                        use_noisy_init=True)
            else:
                cd_losses.append(float(self.joint_rbm.train_epoch(
                    v_plus, epoch, epochs, CD=self.joint_cd)))
                self.joint_rbm.train_epoch_clamped(
                    v_known, km, epoch, epochs, CD=1,
                    cond_init_steps=aux_cond_steps, sample_h=False,
                    sample_v=False, reclamp_negative=False,
                    aux_lr_mult=0.3, use_noisy_init=True)
                if (b_idx % 50) == 0:
                    v_known_z = jnp.concatenate(
                        [z_img, jnp.zeros((B, K), jnp.float32)], axis=1)
                    self.joint_rbm.train_epoch_clamped(
                        v_known_z, 1.0 - km, epoch, epochs, CD=1,
                        cond_init_steps=aux_cond_steps, sample_h=False,
                        sample_v=False, reclamp_negative=False,
                        aux_lr_mult=0.3, use_noisy_init=True)

            if metrics_every <= 1 or (b_idx % metrics_every) == 0:
                img_from_txt, p_y = self._cross_reconstruct(
                    z_img, y, steps=self.cross_steps)
                m = imdbn_ops.cross_metrics_batch(img_from_txt, p_y, img, y)
                tot["n"] += float(m.n)
                tot["top1"] += float(m.top1)
                tot["top3"] += float(m.top3)
                tot["ce_sum"] += float(m.ce_sum)
                tot["mse_sum"] += float(m.mse_sum)
            npix = img.shape[1]
        return cd_losses, tot, npix

    def _log_joint_epoch(self, epoch, cd_losses, tot, npix, log_every_pca,
                         log_every_probe, log_every) -> None:
        """Epoch-tail metric/PCA/probe/snapshot logging (imdbn.py:641-710)."""
        self.last_metrics = None
        if tot["n"] > 0:
            self.last_metrics = {
                "cross_modality/text_top1": tot["top1"] / tot["n"],
                "cross_modality/text_top3": tot["top3"] / tot["n"],
                "cross_modality/text_ce": tot["ce_sum"] / tot["n"],
                "cross_modality/image_mse": tot["mse_sum"] / max(
                    1.0, tot["n"] * max(1, npix or 1)),
            }

        if self.wandb_run is None:
            return
        if cd_losses:
            self.wandb_run.log({"joint/cd_loss": float(np.mean(cd_losses)),
                                "epoch": epoch})
        if self.last_metrics is not None:
            self.wandb_run.log(dict(self.last_metrics, epoch=epoch))

        if self.val_loader is not None and self.features is not None:
            if epoch % log_every_pca == 0:
                try:
                    from multimodal_idbn_tpu.utils.pca import pca_fit_transform
                    from multimodal_idbn_tpu.utils.probe_utils import (
                        compute_joint_embeddings_and_features)
                    from multimodal_idbn_tpu.utils.wandb_utils import (
                        plot_2d_embedding_and_correlations,
                        plot_3d_embedding_and_correlations)
                    E, feats = compute_joint_embeddings_and_features(self)
                    emb = np.asarray(E)
                    if emb.size > 0 and emb.shape[0] > 2 and emb.shape[1] > 2:
                        feat_map = {
                            "Cumulative Area": np.asarray(feats["cum_area"]),
                            "Convex Hull": np.asarray(feats["convex_hull"]),
                            "Labels": np.asarray(feats["labels"]),
                        }
                        if "density" in feats:
                            feat_map["Density"] = np.asarray(feats["density"])
                        p2 = pca_fit_transform(emb, 2)
                        plot_2d_embedding_and_correlations(
                            emb_2d=p2, features=feat_map,
                            arch_name="Joint_top", dist_name="val",
                            method_name="pca", wandb_run=self.wandb_run)
                        if emb.shape[1] >= 3:
                            p3 = pca_fit_transform(emb, 3)
                            plot_3d_embedding_and_correlations(
                                emb_3d=p3, features=feat_map,
                                arch_name="Joint_top", dist_name="val",
                                method_name="pca", wandb_run=self.wandb_run)
                except Exception as e:
                    self.wandb_run.log({"warn/joint_pca_error": str(e)})

            if epoch % log_every_probe == 0:
                try:
                    from multimodal_idbn_tpu.utils.probe_utils import (
                        log_joint_linear_probe)
                    log_joint_linear_probe(self, epoch=epoch, n_bins=5,
                                           test_size=0.2, steps=1000,
                                           lr=1e-2, patience=20,
                                           min_delta=0.0,
                                           metric_prefix="joint")
                except Exception as e:
                    self.wandb_run.log({"warn/joint_probe_error": str(e)})

        self._log_config_gated(epoch)

        if epoch % max(1, int(log_every)) == 0:
            self._log_snapshots(epoch)

    def _get_log_cfg(self, section: str) -> dict:
        """Section of the yaml `logging:` tree (reference monolith
        gdbn_model_complete.py:691)."""
        cfg = self.logging_cfg or {}
        if "logging" in cfg and isinstance(cfg["logging"], dict):
            cfg = cfg["logging"]
        sec = cfg.get(section, {})
        return sec if isinstance(sec, dict) else {}

    def _log_cadence(self, name: str, default: int) -> int:
        cfg = self.logging_cfg or {}
        if "logging" in cfg and isinstance(cfg["logging"], dict):
            cfg = cfg["logging"]
        return max(1, int(cfg.get(name, default)))

    def _log_config_gated(self, epoch: int) -> None:
        """Config-gated extras the reference monolith runs in train_joint
        (gdbn_model_complete.py:1091-1147, SURVEY.md §5.5): energy traces,
        cross-modal convergence panels, vec-DB neighbors, trajectories,
        joint auto-recon. Each gate defaults off like the shipped yaml."""
        if self.wandb_run is None:
            return
        energy_cfg = self._get_log_cfg("energy")
        if (energy_cfg.get("enable", False)
                and epoch % self._log_cadence("log_every_energy", 50) == 0):
            try:
                from multimodal_idbn_tpu.utils.energy_utils import (
                    run_and_log_fixed_case)
                run_and_log_fixed_case(self, epoch=epoch)
            except Exception as e:
                self.wandb_run.log({"warn/energy_error": str(e)})

        conv_cfg = self._get_log_cfg("convergence")
        if (conv_cfg.get("enable", False)
                and epoch % self._log_cadence("log_every_convergence",
                                              25) == 0):
            try:
                from multimodal_idbn_tpu.utils.conditional_steps import (
                    run_and_log_cross_panel,
                    run_and_log_z_mismatch_check,
                )
                if conv_cfg.get("panel_analysis", True):
                    run_and_log_cross_panel(
                        self, epoch=epoch,
                        max_steps=int(conv_cfg.get("num_steps", 50)))
                if conv_cfg.get("z_mismatch_check", True):
                    run_and_log_z_mismatch_check(self, epoch=epoch)
            except Exception as e:
                self.wandb_run.log({"warn/convergence_error": str(e)})

        nb_cfg = self._get_log_cfg("neighbors")
        if (nb_cfg.get("enable", False)
                and epoch % self._log_cadence("log_every_neighbors",
                                              50) == 0):
            try:
                from multimodal_idbn_tpu.utils.imdbn_logging import (
                    log_vecdb_neighbors_for_traj)
                log_vecdb_neighbors_for_traj(
                    self, k=int(nb_cfg.get("k", 5)),
                    metric=nb_cfg.get("similarity_metric", "cosine"),
                    dedup=("image" if nb_cfg.get("deduplicate", True)
                           else "index"))
            except Exception as e:
                self.wandb_run.log({"warn/neighbors_error": str(e)})

        traj_cfg = self._get_log_cfg("trajectory")
        if (traj_cfg.get("enable", False)
                and epoch % self._log_cadence("log_every_trajectory",
                                              50) == 0):
            try:
                from multimodal_idbn_tpu.utils.imdbn_logging import (
                    log_joint_auto_recon,
                    log_latent_trajectory_with_recon_panel,
                    log_pca3_trajectory_with_recon_panel,
                )
                for s_idx in range(int(traj_cfg.get("num_samples", 4))):
                    if traj_cfg.get("plot_2d", True):
                        log_latent_trajectory_with_recon_panel(
                            self, sample_idx=s_idx, steps=self.cross_steps,
                            tag=f"pca_traj_with_recon/sample{s_idx}")
                if traj_cfg.get("plot_3d", True):
                    log_pca3_trajectory_with_recon_panel(
                        self, sample_idx=0, steps=self.cross_steps)
                log_joint_auto_recon(self, epoch=epoch)
            except Exception as e:
                self.wandb_run.log({"warn/trajectory_error": str(e)})

    def _log_snapshots(self, epoch: int, num: int = 8) -> None:
        """Reconstruction grids / confusion / top-k tables
        (reference imdbn.py:715-813), W&B-optional."""
        if (self.wandb_run is None or self.validation_images is None
                or self.validation_labels is None):
            return
        try:
            from multimodal_idbn_tpu.utils.wandb_utils import (
                log_snapshot_panels)
            imgs = self.validation_images[:num]
            lbls = self.validation_labels[:num]
            zi = self.image_idbn.represent(imgs)
            img_from_txt, p_y = self._cross_reconstruct(
                zi, lbls, steps=self.cross_steps)
            log_snapshot_panels(
                self.wandb_run, epoch, np.asarray(imgs),
                np.asarray(jnp.clip(img_from_txt, 0, 1)), np.asarray(p_y),
                np.asarray(lbls),
                class_names=getattr(self, "class_names", None))
        except Exception as e:
            self.wandb_run.log({"warn/snap_error": str(e), "epoch": epoch})

    # -- persistence (imdbn.py:815-934) --------------------------------------------

    def save_model(self, path: str) -> None:
        """Dual-format pickle payload (reference imdbn.py:815-883,
        SURVEY.md §2.1(13)): both the DBN-compatible ``{"layers", "params"}``
        shape and the extended iMDBN fields."""
        import datetime

        all_layers = list(self.image_idbn.layers) + [self.joint_rbm]
        payload: Dict[str, Any] = {
            "layers": all_layers,
            "params": self.params,
            "image_idbn": self.image_idbn,
            "joint_rbm": self.joint_rbm,
            "num_labels": self.num_labels,
            "Dz_img": self.Dz_img,
            "arch_str": self.arch_str,
            "features": self.features,
            "metadata": {
                "saved_at": datetime.datetime.now().isoformat(),
                "model_type": "iMDBN",
                "architecture": self.arch_str,
            },
        }
        if getattr(self, "z_class_mean", None) is not None:
            payload["z_class_mean"] = np.asarray(self.z_class_mean)
        if getattr(self, "z_affine_scale", None) is not None:
            payload["z_affine_scale"] = np.asarray(self.z_affine_scale)
        if getattr(self, "z_affine_bias", None) is not None:
            payload["z_affine_bias"] = np.asarray(self.z_affine_bias)
        if getattr(self, "class_names", None) is not None:
            payload["class_names"] = self.class_names
        # Framework extension: persist the best-of-K selection flag so a
        # reassembled model (from_payload) keeps the saver's semantics.
        payload["reference_best_of_k_bug"] = bool(
            self.reference_best_of_k_bug)

        with open(path, "wb") as f:
            pickle.dump(payload, f)

        print(f"[iMDBN] Model saved to {path}")
        print(f"[iMDBN] Architecture: {self.arch_str}")
        print(f"[iMDBN] Total layers: {len(all_layers)} "
              f"(image: {len(self.image_idbn.layers)}, joint: 1)")
        if self.features is not None:
            print(f"[iMDBN] Features saved: {list(self.features.keys())}")

    @staticmethod
    def load_model(path: str, device=None) -> Dict[str, Any]:
        """Load the pickle payload (reference imdbn.py:885-934). Returns
        the raw dict; components are already device-ready under JAX."""
        del device
        with open(path, "rb") as f:
            payload = pickle.load(f)
        print(f"[iMDBN] Model loaded from {path}")
        if "arch_str" in payload:
            print(f"[iMDBN] Architecture: {payload['arch_str']}")
        if payload.get("features") is not None:
            print(f"[iMDBN] Features loaded: "
                  f"{list(payload['features'].keys())}")
        if "metadata" in payload:
            print(f"[iMDBN] Saved at: "
                  f"{payload['metadata'].get('saved_at', 'unknown')}")
        return payload

    @classmethod
    def from_payload(cls, payload: Dict[str, Any], dataloader=None,
                     val_loader=None, wandb_run=None) -> "iMDBN":
        """Rebuild a functional iMDBN from a ``load_model`` payload
        (framework extension — the reference returns the raw dict and
        leaves reassembly to the caller, imdbn.py:885-934). The loaded
        ``image_idbn``/``joint_rbm`` objects are adopted as-is, so all
        inference paths (img2txt, txt2img, sample_txt2img, represent)
        work immediately; training additionally needs a dataloader."""
        m = cls.__new__(cls)
        # Keep the payload's params object AS-IS: pickle preserves the
        # identity shared with image_idbn.params (the one-knob-scales-
        # both-phases invariant of __init__), which a dict() copy would
        # silently break.
        m.params = payload.get("params") if payload.get("params") \
            is not None else {}
        m.device = None
        m.dataloader = dataloader
        m.val_loader = val_loader
        m.wandb_run = wandb_run
        m.logging_cfg = {}
        m._seed = m.params.get("SEED")
        m.num_labels = int(payload["num_labels"])
        m.Dz_img = int(payload["Dz_img"])
        m.image_idbn = payload["image_idbn"]
        m.joint_rbm = payload["joint_rbm"]
        # Pickle strips loaders/run from the embedded iDBN
        # (__getstate__); re-wire the ones given here like __init__ does.
        m.image_idbn.dataloader = dataloader
        m.image_idbn.val_loader = val_loader
        m.image_idbn.wandb_run = wandb_run
        m.arch_str = payload.get(
            "arch_str", f"IMG?_JOINT{m.joint_rbm.num_hidden}")
        m.features = payload.get("features")
        m.validation_images = None
        m.validation_labels = None
        m.val_batch = None
        m.joint_cd = int(m.params.get("JOINT_CD", m.params.get("CD", 1)))
        m.cross_steps = int(m.params.get("CROSS_GIBBS_STEPS", 50))
        m.aux_every_k = int(m.params.get("JOINT_AUX_EVERY_K", 0))
        m.aux_cond_steps = int(m.params.get("JOINT_AUX_COND_STEPS", 50))
        # Restore the saver's best-of-K semantics (persisted by
        # save_model; True = reference no-op for older payloads).
        m.reference_best_of_k_bug = bool(
            payload.get("reference_best_of_k_bug", True))
        m.mesh = None
        m._dp_devices = m.params.get("DP_DEVICES")
        zcm = payload.get("z_class_mean")
        m.z_class_mean = None if zcm is None else jnp.asarray(zcm)
        for attr in ("z_affine_scale", "z_affine_bias", "class_names"):
            if attr in payload:
                setattr(m, attr, payload[attr])
        return m

    # Drop unpicklable/heavy runtime attachments when embedded in payloads.
    def __getstate__(self):
        d = dict(self.__dict__)
        d["wandb_run"] = None
        d["dataloader"] = None
        d["val_loader"] = None
        d["z_class_mean"] = (None if self.z_class_mean is None
                             else np.asarray(self.z_class_mean))
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        if d.get("z_class_mean") is not None:
            self.z_class_mean = jnp.asarray(d["z_class_mean"])
