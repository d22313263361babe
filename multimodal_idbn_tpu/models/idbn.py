"""iDBN: iterative Deep Belief Network (stack of RBMs) — TPU-native.

API mirror of reference imdbn/models/idbn.py:39-373 (constructor, method
names, logging cadences, metadata extraction). The training loop differs
architecturally: by default an entire epoch runs as one fused on-device
``lax.scan`` (``multimodal_idbn_tpu.ops.dbn_train.idbn_epoch``) instead of
the reference's per-batch host loop — same math (verified against the
NumPy oracle), ~one dispatch per epoch.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_idbn_tpu.checkpoint import (align_loader_for_resume,
                                            checkpoint_epochs,
                                            maybe_save_train_checkpoint,
                                            save_train_checkpoint)
from multimodal_idbn_tpu.models.rbm import (RBM, as_array, param_sr,
                                            param_compute_dtype,
                                            param_dtype)
from multimodal_idbn_tpu.ops import dbn_train


class iDBN:
    """Stack of RBMs with iterative layer-wise training.

    Every layer is updated on every batch of every epoch, with layer i+1's
    input being the post-update mean-field activations of layer i
    (reference idbn.py:199-204; SURVEY.md §2.1(8)).

    Attributes mirror the reference (idbn.py:49-58): ``layers``, ``params``,
    ``dataloader``, ``val_loader``, ``device``, ``wandb_run``, ``features``,
    ``arch_str``, ``arch_dir``.
    """

    def __init__(self, layer_sizes: List[int], params: dict, dataloader,
                 val_loader, device=None, wandb_run=None,
                 logging_config_path: Optional[str] = None,
                 seed: Optional[int] = None):
        self.layers: List[RBM] = []
        self.params = params
        self.dataloader = dataloader
        self.val_loader = val_loader
        self.device = device  # accepted for API compat; JAX manages placement
        self.wandb_run = wandb_run

        # Logging config (reference idbn.py:98-110; the default path there
        # points at a Groundeep file that never ships, so this is usually {}).
        self.logging_cfg = {}
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

        self.text_flag = False
        self.arch_str = "-".join(map(str, layer_sizes))
        self.arch_dir = os.path.join("logs-idbn",
                                     f"architecture_{self.arch_str}")
        os.makedirs(self.arch_dir, exist_ok=True)

        self.cd_k = int(self.params.get("CD", 1))
        self.sparsity_last = bool(self.params.get("SPARSITY", False))
        self.sparsity_factor = float(self.params.get("SPARSITY_FACTOR", 0.1))

        # Cache one validation batch (reference idbn.py:123-127).
        try:
            self.val_batch, self.val_labels = next(iter(val_loader))
        except Exception:
            self.val_batch, self.val_labels = None, None

        # Validation features via the Subset metadata protocol
        # (reference idbn.py:129-146; broad except intentional — plain
        # TensorDataset-style loaders have no .indices).
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

        # Build RBM layers (sparsity only on the top layer, idbn.py:149-161).
        # params["DTYPE"]="bfloat16" opts into reduced-precision storage
        # (framework extension; default float32 = reference semantics).
        dtype = param_dtype(self.params)
        # params["COMPUTE_DTYPE"]="bfloat16": mixed precision (f32 master
        # weights, bf16 Gibbs-chain GEMMs) — see models/rbm.py docstring.
        self.compute_dtype = param_compute_dtype(self.params)
        # params["SR"]: stochastic-rounding override (YAML
        # training.stochastic_rounding; None = auto-on for bf16 storage,
        # False = legacy biased epilogue for ablation — see
        # models/rbm.py param_sr and ops/rbm_ops.stochastic_round).
        self.sr = param_sr(self.params)
        # params["PCD"]=True: persistent-CD trainer (framework extension,
        # rbm_ops.pcd_update; the reference trains plain CD-k only).
        self.use_pcd = bool(self.params.get("PCD", False))
        self._pcd_chains = None
        # params["DP_DEVICES"]=N|"all": data-parallel training over a 1-D
        # device mesh (framework extension — the reference is single-device,
        # SURVEY.md §2 row 20). Built lazily at train time; see set_mesh().
        self.mesh = None
        self._dp_devices = self.params.get("DP_DEVICES")
        self._layer_sizes = list(layer_sizes)
        self._init_seed = seed
        for i in range(len(layer_sizes) - 1):
            rbm = RBM(
                num_visible=layer_sizes[i],
                num_hidden=layer_sizes[i + 1],
                learning_rate=self.params["LEARNING_RATE"],
                weight_decay=self.params["WEIGHT_PENALTY"],
                momentum=self.params["INIT_MOMENTUM"],
                dynamic_lr=self.params["LEARNING_RATE_DYNAMIC"],
                final_momentum=self.params["FINAL_MOMENTUM"],
                sparsity=(self.sparsity_last and i == len(layer_sizes) - 2),
                sparsity_factor=self.sparsity_factor,
                seed=None if seed is None else seed + i,
                dtype=dtype,
                sr=self.sr,
            )
            self.layers.append(rbm)

        self.loss_history: List[float] = []

    # -- state plumbing ------------------------------------------------------

    def _states(self):
        return tuple(r.state for r in self.layers)

    def _set_states(self, states) -> None:
        for r, s in zip(self.layers, states):
            r.state = s

    def _sparsity_flags(self):
        return tuple(bool(r.sparsity) for r in self.layers)

    def _fast_sampler(self) -> bool:
        """Opt-in Pallas sampled-CD (config.enable_pallas_cd): TPU-only,
        groupless (always true for image stacks), not combined with PCD,
        mixed precision, or bf16 storage (the Pallas epilogue lacks the
        stochastic-rounding updates bf16 storage needs — its
        nearest-rounded updates are the measured quality collapse, see
        ops/rbm_ops.stochastic_round)."""
        from multimodal_idbn_tpu import config as _config
        if not _config.pallas_cd_enabled() or self.use_pcd \
                or self.compute_dtype is not None or self.mesh is not None:
            return False
        if any(r.state.w.dtype == jnp.bfloat16 for r in self.layers):
            print("[iDBN] pallas_cd disabled for bfloat16 storage "
                  "(no stochastic-rounding epilogue in the Pallas "
                  "kernel); using the jnp CD path")
            return False
        from multimodal_idbn_tpu.ops import pallas_kernels
        return pallas_kernels.sampled_cd_supported()

    def set_mesh(self, mesh) -> None:
        """Enable data-parallel training: batch sharded over a 1-D device
        mesh, parameters replicated, CD statistics all-reduced over ICI
        (``parallel.dp_idbn_epoch``). ``mesh`` may be a
        ``jax.sharding.Mesh``, a device count, ``"all"``, or ``None`` to
        disable. Counter-based threefry keeps results invariant to device
        count up to reduction order (tests/test_parallel.py)."""
        from multimodal_idbn_tpu.parallel import resolve_mesh
        self.mesh = resolve_mesh(mesh)
        # An explicit set_mesh (including None) overrides DP_DEVICES —
        # otherwise _resolve_mesh would silently re-enable DP from params.
        self._dp_devices = None

    def _resolve_mesh(self):
        """Build the mesh from params["DP_DEVICES"] on first use."""
        if self.mesh is None and self._dp_devices:
            self.set_mesh(self._dp_devices)
            self._dp_devices = None
        if self.mesh is not None and (self.use_pcd
                                      or self.compute_dtype is not None):
            raise ValueError(
                "data-parallel training (DP_DEVICES/set_mesh) supports "
                "the default f32 CD path only — not PCD or COMPUTE_DTYPE")
        return self.mesh

    def _ensure_pcd_chains(self, batch_size: int):
        """Per-layer fantasy particles [batch_size, V_i], created once
        and persisted across train() calls (PCD's defining property)."""
        if (self._pcd_chains is None
                or self._pcd_chains[0].shape[0] != batch_size):
            from multimodal_idbn_tpu.ops.rbm_ops import init_pcd_chains
            ck = jax.random.key(self.params.get("SEED", 0) + 12345)
            # Chains live in the layer storage dtype: pcd_update returns
            # chains cast to state.w.dtype, and lax.scan requires carry
            # input/output dtypes to match (bf16-storage + PCD crash
            # otherwise).
            self._pcd_chains = tuple(
                init_pcd_chains(jax.random.fold_in(ck, i), batch_size,
                                r.num_visible, dtype=r.state.w.dtype)
                for i, r in enumerate(self.layers))
        return self._pcd_chains

    def _layers_to_monitor(self) -> List[int]:
        """Top layer plus layer 1 when deeper (reference idbn.py:163-173)."""
        layers = {len(self.layers)}
        if len(self.layers) > 1:
            layers.add(1)
        return sorted(layers)

    def _layer_tag(self, idx: int) -> str:
        return f"layer{idx}"

    # -- training --------------------------------------------------------------

    def _schedule(self, epoch: int):
        from multimodal_idbn_tpu.ops.schedules import (
            effective_lr, effective_momentum)
        r0 = self.layers[0]
        return (effective_lr(r0.lr, epoch, r0.dynamic_lr),
                effective_momentum(r0.momentum, r0.final_momentum, epoch))

    def _train_epoch_fused(self, epoch: int, epochs: int, data: jax.Array,
                           key) -> float:
        """One epoch as a single on-device scan (+ remainder batch).

        The permutation happens here (not inside the fused epoch) so that
        the remainder batch is exactly the unselected tail of the shuffle
        — every sample trains exactly once per epoch, like the reference.
        """
        lr, mom = self._schedule(epoch)
        wd = self.layers[0].weight_decay
        bs = getattr(self.dataloader, "batch_size", 128)
        n = data.shape[0]
        perm = jax.random.permutation(jax.random.fold_in(key, 0), n)
        data_p = data[perm]
        if self.use_pcd:
            states, self._pcd_chains, losses = dbn_train.idbn_epoch_pcd(
                self._states(), self._ensure_pcd_chains(bs), key, data_p,
                lr, mom, wd, self.sparsity_factor, cd=self.cd_k,
                sparsity_flags=self._sparsity_flags(), batch_size=bs,
                shuffle=False, compute_dtype=self.compute_dtype,
                sr=self.sr)
        elif self.mesh is not None:
            # Data-parallel epoch: the [nb*bs] slice keeps the batch count
            # identical to the single-device path (dp_idbn_epoch would
            # otherwise trim N to a device-divisible length itself); the
            # remainder step below runs replicated.
            from multimodal_idbn_tpu.parallel import dp_idbn_epoch
            states, losses = dp_idbn_epoch(
                self.mesh, self._states(), key, data_p[:(n // bs) * bs],
                lr, mom, wd, self.sparsity_factor, cd=self.cd_k,
                sparsity_flags=self._sparsity_flags(), batch_size=bs,
                shuffle=False, sr=self.sr)
        else:
            states, losses = dbn_train.idbn_epoch(
                self._states(), key, data_p, lr, mom, wd,
                self.sparsity_factor, cd=self.cd_k,
                sparsity_flags=self._sparsity_flags(),
                batch_size=bs, shuffle=False,
                compute_dtype=self.compute_dtype,
                fast_sampler=self._fast_sampler(), sr=self.sr)
        # Reference averages over all (batch, layer) loss entries equally
        # (idbn.py:204-208): accumulate sums so the remainder batch gets
        # per-entry (not per-call) weight.
        loss_sum = float(losses.sum())
        loss_count = int(losses.size)
        rem = n - (n // bs) * bs
        if rem:
            states, rl = dbn_train.idbn_batch_step(
                states, jax.random.fold_in(key, 987), data_p[n - rem:],
                lr, mom, wd, self.sparsity_factor, cd=self.cd_k,
                sparsity_flags=self._sparsity_flags(),
                compute_dtype=self.compute_dtype, sr=self.sr)
            loss_sum += float(rl.sum())
            loss_count += int(rl.size)
        self._set_states(states)
        return loss_sum / max(1, loss_count)

    def _save_train_checkpoint(self, path, next_epoch: int,
                               phase: str = "image") -> None:
        save_train_checkpoint(self, path, phase=phase,
                              next_epoch=next_epoch,
                              loss_history=self.loss_history)

    def train(self, epochs: int, log_every_pca: int = 25,
              log_every_probe: int = 10, fused: Optional[bool] = None,
              start_epoch: int = 0, checkpoint_every: int = 0,
              checkpoint_path: Optional[str] = None,
              checkpoint_phase: str = "image"):
        """Train with iterative layer-wise updates (reference idbn.py:179-305).

        ``fused=None`` auto-selects the on-device epoch path when the
        dataloader can materialize its arrays; ``fused=False`` forces the
        reference-style per-batch loop (useful for exotic loaders).

        Crash-safe resume (framework extension): with
        ``checkpoint_every=N`` and ``checkpoint_path``, a resumable
        checkpoint (weights + momentum + loss history) is written every N
        epochs; ``start_epoch=k`` continues a run restored by
        ``checkpoint.load_train_checkpoint``. Every epoch's RNG is
        ``fold_in(epoch_key, absolute_epoch)``, so the resumed run is
        bit-identical to an uninterrupted one (tests/test_resume.py).
        ``checkpoint_phase`` tags the files so a resuming caller can
        detect a wrong/stale checkpoint (e.g. the bimodal CLI's
        "mod1"/"mod2" stacks).
        """
        if fused is None:
            fused = hasattr(self.dataloader, "materialize")
        mesh = self._resolve_mesh()
        if mesh is not None and not fused:
            raise ValueError("data-parallel training needs the fused "
                             "epoch path (a dataloader with "
                             ".materialize(), or fused=True)")
        epochs = int(epochs)
        start_epoch = int(start_epoch)
        if not 0 <= start_epoch <= epochs:
            raise ValueError(f"start_epoch {start_epoch} outside "
                             f"[0, {epochs}]")
        if checkpoint_every and not checkpoint_path:
            raise ValueError("checkpoint_every needs a checkpoint_path")
        data = None
        if fused:
            imgs = self.dataloader.materialize()[0]
            data = jnp.asarray(imgs.reshape(imgs.shape[0], -1), jnp.float32)

        epoch_key = jax.random.key(self.params.get("SEED", 0))

        from multimodal_idbn_tpu.utils.profiling import StepTimer
        timer = StepTimer()

        if fused and self.wandb_run is None:
            # Epoch-blocked path: without a run object no per-epoch
            # logging fires, so run the epochs in as few dispatches as
            # possible (nested scan) — identical RNG/key derivation to
            # the per-epoch path, but per-call (tunnel) latency is paid
            # once per block instead of once per epoch. Checkpointing
            # splits the run at multiples of checkpoint_every; equal-size
            # blocks reuse one compiled executable.
            bs = getattr(self.dataloader, "batch_size", 128)
            for b_start, b_end in checkpoint_epochs(
                    start_epoch, epochs,
                    checkpoint_every if checkpoint_path else 0):
                E = b_end - b_start
                idx = jnp.arange(b_start, b_end, dtype=jnp.int32)
                lr_arr = jnp.asarray(
                    [self._schedule(e)[0] for e in range(b_start, b_end)],
                    jnp.float32)
                mom_arr = jnp.asarray(
                    [self._schedule(e)[1] for e in range(b_start, b_end)],
                    jnp.float32)
                with timer.step(E):
                    if self.use_pcd:
                        (states, self._pcd_chains, sums,
                         counts) = dbn_train.idbn_epoch_block_pcd(
                            self._states(), self._ensure_pcd_chains(bs),
                            epoch_key, data, idx,
                            lr_arr, mom_arr, self.layers[0].weight_decay,
                            self.sparsity_factor, cd=self.cd_k,
                            sparsity_flags=self._sparsity_flags(),
                            batch_size=bs, n_epochs=E,
                            compute_dtype=self.compute_dtype,
                            sr=self.sr)
                    elif mesh is not None:
                        # Blocked DP: same dispatch, batch axis sharded
                        # over the mesh (identical key derivation, so
                        # results match single-device to reduction order).
                        from multimodal_idbn_tpu.parallel import (
                            dp_idbn_epoch_block)
                        states, sums, counts = dp_idbn_epoch_block(
                            mesh, self._states(), epoch_key, data,
                            idx, lr_arr, mom_arr,
                            self.layers[0].weight_decay,
                            self.sparsity_factor, cd=self.cd_k,
                            sparsity_flags=self._sparsity_flags(),
                            batch_size=bs, n_epochs=E, sr=self.sr)
                    else:
                        states, sums, counts = dbn_train.idbn_epoch_block(
                            self._states(), epoch_key, data,
                            idx, lr_arr, mom_arr,
                            self.layers[0].weight_decay,
                            self.sparsity_factor, cd=self.cd_k,
                            sparsity_flags=self._sparsity_flags(),
                            batch_size=bs, n_epochs=E,
                            compute_dtype=self.compute_dtype,
                            fast_sampler=self._fast_sampler(),
                            sr=self.sr)
                    self._set_states(states)
                sums = np.asarray(sums)
                counts = np.asarray(counts)
                self.loss_history.extend(
                    (sums / np.maximum(1.0, counts)).tolist())
                maybe_save_train_checkpoint(
                    self, checkpoint_path, checkpoint_every,
                    checkpoint_phase, b_end, epochs,
                    loss_history=self.loss_history)
            self.epoch_timer = timer
            if epochs > start_epoch:
                self._warn_if_collapsed()
            return

        if not fused:
            # Our DataLoader derives each epoch's shuffle from an internal
            # counter; restore/align it so the resumed run sees the same
            # batch order the uninterrupted run would have.
            align_loader_for_resume(self, start_epoch)
        for epoch in range(start_epoch, epochs):
            with timer.step():
                if fused:
                    mean_loss = self._train_epoch_fused(
                        epoch, epochs, data,
                        jax.random.fold_in(epoch_key, epoch))
                else:
                    losses = []
                    for img, _ in self.dataloader:
                        v = as_array(img)
                        for rbm in self.layers:
                            loss = rbm.train_epoch(v, epoch, epochs,
                                                   CD=self.cd_k)
                            v = rbm.forward(v)
                            losses.append(float(loss))
                    mean_loss = float(np.mean(losses)) if losses else 0.0
            self.loss_history.append(mean_loss)
            timer.log_to(self.wandb_run, prefix="perf/idbn_epoch",
                         epoch=epoch)

            self._log_epoch(epoch, mean_loss, log_every_pca, log_every_probe)
            maybe_save_train_checkpoint(
                self, checkpoint_path, checkpoint_every, checkpoint_phase,
                epoch + 1, epochs, loss_history=self.loss_history,
                cadence_only=True)
        self.epoch_timer = timer
        if epochs > start_epoch:
            self._warn_if_collapsed()

    def reinit_layers(self, seed_offset: int = 0) -> None:
        """Re-draw all layer parameters (fresh W ~ N/sqrt(V), zero biases
        and momentum) with a derived seed. Loss history is kept."""
        base = self._init_seed
        dtype = param_dtype(self.params)
        for i, rbm in enumerate(self.layers):
            self.layers[i] = RBM(
                num_visible=rbm.num_visible, num_hidden=rbm.num_hidden,
                learning_rate=rbm.lr, weight_decay=rbm.weight_decay,
                momentum=rbm.momentum, dynamic_lr=rbm.dynamic_lr,
                final_momentum=rbm.final_momentum, sparsity=rbm.sparsity,
                sparsity_factor=rbm.sparsity_factor,
                softmax_groups=rbm.softmax_groups,
                seed=None if base is None else base + i + seed_offset,
                dtype=dtype)

    def _recon_collapse_ratio(self) -> Optional[float]:
        """Val-batch auto-recon MSE over the blank-reconstruction
        baseline mean(x²), or None without a val batch. Collapsed seeds
        sit at ratio ≈ 1 (blank output), healthy ones ≤ 0.71; 0.9
        separates them (benchmarks/RESULTS.md round-2 study)."""
        if self.val_batch is None:
            return None
        vb = as_array(self.val_batch)
        rec = jnp.clip(self.reconstruct(vb), 0, 1)
        mse = float(jnp.mean((vb - rec) ** 2))
        blank = float(jnp.mean(vb * vb))
        return mse / max(blank, 1e-12)

    def _warn_if_collapsed(self, recon_margin: float = 0.9) -> bool:
        """Always-on, LOG-ONLY end-of-phase collapse signal (semantics
        untouched — reference parity keeps retries opt-in). A flagship
        user otherwise hits a blank-stack run ~1-2 times in 11 with no
        indication (VERDICT r3). Follows the reference's own ``warn/*``
        log-and-continue philosophy (SURVEY.md §5.3)."""
        if getattr(self, "_suppress_collapse_warn", False):
            return False
        ratio = self._recon_collapse_ratio()
        if ratio is None or ratio < recon_margin:
            return False
        print(f"[iDBN] warn/idbn_blank_recon: end-of-phase auto-recon is "
              f"at {ratio:.2f}x the blank baseline (>= {recon_margin}) — "
              f"the stack likely collapsed at initialization. Retrain "
              f"with another seed, or enable the retry rescue "
              f"(iDBN.train_with_retry / the CLIs' training.init_retry).")
        if self.wandb_run is not None:
            self.wandb_run.log({"warn/idbn_blank_recon": ratio})
        return True

    def train_with_retry(self, epochs: int, max_retries: int = 2,
                         recon_margin: float = 0.9, start_epoch: int = 0,
                         **train_kw) -> int:
        """Opt-in mitigation for CD initialization collapse (framework
        extension; benchmarks/RESULTS.md round 2: collapsed seeds train
        the image stack to blank-level reconstruction, MSE ≈ mean(x²),
        and the joint stage inherits it — no downstream flag can rescue
        that; measured ratios to the blank baseline mean(x²): collapsed
        0.96, healthy ≤0.71, so 0.9 separates them). Train normally; if
        the val-batch auto-recon MSE is not below ``recon_margin`` × the
        blank-reconstruction baseline,
        re-initialize with a derived seed and retrain, at most
        ``max_retries`` times. Returns the number of retries used.
        Plain ``train()`` never retries (reference semantics unchanged).

        ``start_epoch`` (crash-safe resume): the first attempt continues
        from a restored checkpoint instead of training from scratch, and
        the collapse check still runs at the end — so a crash+resume
        cannot ship a collapsed model the uninterrupted run would have
        retrained. Retries always restart from epoch 0 (reinit).
        """
        def collapsed() -> bool:
            ratio = self._recon_collapse_ratio()
            return ratio is not None and ratio >= recon_margin

        # This path handles collapse itself — suppress the log-only
        # end-of-train() warning so the user isn't told to enable the
        # rescue they already enabled.
        self._suppress_collapse_warn = True
        try:
            self.train(epochs, start_epoch=start_epoch, **train_kw)
            retries = 0
            still_collapsed = collapsed()
            while retries < int(max_retries) and still_collapsed:
                retries += 1
                print(f"[iDBN] recon at blank level — reinit (retry "
                      f"{retries}/{max_retries})")
                # Invalidate the collapsed attempt's checkpoint BEFORE
                # reinit: a crash between reinit and the retry's first
                # checkpoint write would otherwise make a relaunch
                # resume the collapsed weights at a late epoch, silently
                # discarding the retry (r4 advisor finding).
                ckpt = train_kw.get("checkpoint_path")
                if ckpt is not None and os.path.exists(ckpt):
                    os.replace(ckpt, str(ckpt) + f".collapsed{retries}")
                self.reinit_layers(seed_offset=7919 * retries)
                self.train(epochs, **train_kw)
                still_collapsed = collapsed()
        finally:
            self._suppress_collapse_warn = False
        if still_collapsed:  # out of retries and still blank: say so
            print(f"[iDBN] warn/idbn_blank_recon: still at blank-level "
                  f"reconstruction after {retries} reinit "
                  f"retr{'y' if retries == 1 else 'ies'} — this dataset/"
                  f"schedule/seed combination may need a different "
                  f"learning rate or architecture.")
            if self.wandb_run is not None:
                self.wandb_run.log(
                    {"warn/idbn_blank_recon": self._recon_collapse_ratio()})
        return retries

    def _log_epoch(self, epoch: int, mean_loss: float, log_every_pca: int,
                   log_every_probe: int) -> None:
        """Reference logging cadences (idbn.py:207-305), W&B-optional."""
        if self.wandb_run is None:
            return
        self.wandb_run.log({"idbn/loss": mean_loss, "epoch": epoch})

        # Auto-reconstruction snapshot every 5 epochs (idbn.py:211-238).
        if self.val_batch is not None and epoch % 5 == 0:
            try:
                from multimodal_idbn_tpu.utils.wandb_utils import (
                    log_reconstruction_grid)
                vb = as_array(self.val_batch)[:8]
                rec = self.reconstruct(vb)
                log_reconstruction_grid(self.wandb_run, vb, rec, epoch,
                                        key="idbn/auto_recon_grid")
                mse = float(jnp.mean((vb - jnp.clip(rec, 0, 1)) ** 2))
                self.wandb_run.log({"idbn/auto_recon_mse": mse,
                                    "epoch": epoch})
            except Exception:
                pass

        if self.val_loader is None or self.features is None:
            return

        if epoch % log_every_pca == 0:
            for layer_idx in self._layers_to_monitor():
                tag = self._layer_tag(layer_idx)
                try:
                    from multimodal_idbn_tpu.utils.probe_utils import (
                        compute_val_embeddings_and_features)
                    from multimodal_idbn_tpu.utils.wandb_utils import (
                        plot_2d_embedding_and_correlations,
                        plot_3d_embedding_and_correlations)
                    E, feats = compute_val_embeddings_and_features(
                        self, upto_layer=layer_idx)
                    if E.size == 0:
                        continue
                    feat_map = {
                        "Cumulative Area": np.asarray(feats["cum_area"]),
                        "Convex Hull": np.asarray(feats["convex_hull"]),
                        "Labels": np.asarray(feats["labels"]),
                    }
                    if "density" in feats:
                        feat_map["Density"] = np.asarray(feats["density"])
                    emb = np.asarray(E)
                    if emb.shape[0] > 2 and emb.shape[1] > 2:
                        from multimodal_idbn_tpu.utils.pca import pca_fit_transform
                        p2 = pca_fit_transform(emb, 2)
                        plot_2d_embedding_and_correlations(
                            emb_2d=p2, features=feat_map,
                            arch_name=f"iDBN_{tag}", dist_name="val",
                            method_name="pca", wandb_run=self.wandb_run)
                        if emb.shape[1] >= 3:
                            p3 = pca_fit_transform(emb, 3)
                            plot_3d_embedding_and_correlations(
                                emb_3d=p3, features=feat_map,
                                arch_name=f"iDBN_{tag}", dist_name="val",
                                method_name="pca", wandb_run=self.wandb_run)
                except Exception as e:
                    self.wandb_run.log({f"warn/idbn_pca_error_{tag}": str(e)})

        if epoch % log_every_probe == 0:
            for layer_idx in self._layers_to_monitor():
                tag = self._layer_tag(layer_idx)
                try:
                    from multimodal_idbn_tpu.utils.probe_utils import (
                        log_linear_probe)
                    log_linear_probe(self, epoch=epoch, n_bins=5,
                                     test_size=0.2, steps=1000, lr=1e-2,
                                     patience=20, min_delta=0.0,
                                     upto_layer=layer_idx, layer_tag=tag)
                except Exception as e:
                    self.wandb_run.log(
                        {f"warn/idbn_probe_error_{tag}": str(e)})

    # -- inference ---------------------------------------------------------------

    def represent(self, x, upto_layer: Optional[int] = None) -> jax.Array:
        """Mean-field encode to a given layer (reference idbn.py:308-323)."""
        v = as_array(x)
        L = (len(self.layers) if upto_layer is None
             else max(0, min(len(self.layers), int(upto_layer))))
        return dbn_train.dbn_represent(self._states(), v, upto=L)

    def reconstruct(self, x) -> jax.Array:
        """Encode all the way up then decode back (reference idbn.py:326-344)."""
        return dbn_train.dbn_reconstruct(self._states(), as_array(x))

    def decode(self, top) -> jax.Array:
        """Decode top-layer activations to input space (idbn.py:346-359)."""
        return dbn_train.dbn_decode(self._states(), as_array(top))

    def save_model(self, path: str) -> None:
        """Pickle ``{"layers", "params"}`` (reference idbn.py:361-373)."""
        import pickle
        with open(path, "wb") as f:
            pickle.dump({"layers": self.layers, "params": self.params}, f)
        print(f"[iDBN] Model saved to {path}")

    # Loaders and W&B runs are runtime attachments, not model state; drop
    # them when an iDBN object is embedded in a pickle payload.
    def __getstate__(self):
        d = dict(self.__dict__)
        d["wandb_run"] = None
        d["dataloader"] = None
        d["val_loader"] = None
        return d
