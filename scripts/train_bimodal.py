"""Train the bimodal DBN (numerosity + MNIST-100).

TPU-native mirror of reference scripts/train_bimodal.py:34-267: same YAML
schema and flow (per-modality pretraining via dedicated single-modality
loaders, optional pretrained loads, fine-tune hooks, joint training,
save). Unlike the reference, the fine-tune hooks actually exist on the
model (the reference calls methods that don't, SURVEY.md §2.2).
"""

from pathlib import Path
import argparse
import sys

import numpy as np
import yaml

PROJECT_ROOT = Path(__file__).resolve().parent.parent
if str(PROJECT_ROOT) not in sys.path:
    sys.path.insert(0, str(PROJECT_ROOT))

from multimodal_idbn_tpu.models import iMDBN_BiModal  # noqa: E402
from multimodal_idbn_tpu.data import create_dataloaders_uniform  # noqa: E402
from multimodal_idbn_tpu.data.loaders import (  # noqa: E402
    DataLoader,
    NumerosityDataset,
)
from multimodal_idbn_tpu.utils.wandb_compat import wandb  # noqa: E402

DEFAULT_CONFIG_PATH = PROJECT_ROOT / "configs" / "bimodal_training_config.yaml"


def parse_args():
    ap = argparse.ArgumentParser(
        "Train bimodal DBN (Numerosity + MNIST-100)")
    ap.add_argument("--config", type=Path, default=DEFAULT_CONFIG_PATH)
    return ap.parse_args()


def load_config(path: Path) -> dict:
    with path.open("r") as f:
        return yaml.safe_load(f)


def build_params(cfg: dict) -> dict:
    """YAML → UPPERCASE params (reference train_bimodal.py:34-60)."""
    t = cfg.get("training", {})
    return {
        "LEARNING_RATE": t.get("learning_rate", 0.1),
        "WEIGHT_PENALTY": t.get("weight_penalty", 1e-4),
        "INIT_MOMENTUM": t.get("init_momentum", 0.5),
        "FINAL_MOMENTUM": t.get("final_momentum", 0.95),
        "LEARNING_RATE_DYNAMIC": t.get("learning_rate_dynamic", True),
        "CD": t.get("cd", 1),
        "EPOCHS_MOD1": t.get("epochs_mod1", 100),
        "EPOCHS_MOD2": t.get("epochs_mod2", 100),
        "EPOCHS_JOINT": t.get("epochs_joint", 200),
        "JOINT_LEARNING_RATE": t.get("joint_learning_rate",
                                     t.get("learning_rate", 0.1)),
        "JOINT_CD": t.get("joint_cd", t.get("cd", 1)),
        "CROSS_GIBBS_STEPS": t.get("cross_gibbs_steps", 50),
        "USE_AUX": t.get("use_aux", True),
        "JOINT_AUX_COND_STEPS": t.get("JOINT_AUX_COND_STEPS",
                                      t.get("aux_cond_steps", 50)),
        "JOINT_AUX_EVERY_K": t.get("JOINT_AUX_EVERY_K", 10),
        "CROSS_METRICS_EVERY": t.get("cross_metrics_every", 1),
        # framework extension: data-parallel training over N devices
        # (int or "all"; the reference is single-device)
        "DP_DEVICES": t.get("dp_devices"),
        # framework extension: blank-recon rescue for the modality DBNs
        # (iDBN.train_with_retry; 0 = reference behavior)
        "INIT_RETRY": t.get("init_retry", 0),
        # framework extension: crash-safe resume — write a resumable
        # checkpoint every N epochs (paths.checkpoint_dir); rerunning the
        # same command continues bit-identically from the last checkpoint
        "CHECKPOINT_EVERY": t.get("checkpoint_every", 0),
        # framework extensions: storage dtype + stochastic-rounding
        # override (models/rbm.py param_dtype / param_sr); defaults =
        # reference semantics.
        "DTYPE": t.get("dtype", "float32"),
        "COMPUTE_DTYPE": t.get("compute_dtype"),
        "SR": t.get("stochastic_rounding"),
        "SEED": t.get("seed", 0),
    }


def build_logging_params(cfg: dict) -> dict:
    log_cfg = cfg.get("logging", {})
    return {
        "LOG_EVERY": log_cfg.get("log_every", 5),
        "LOG_EVERY_PCA": log_cfg.get("log_every_pca", 25),
        "LOG_EVERY_PROBE": log_cfg.get("log_every_probe", 10),
        "LOG_EVERY_ENERGY": log_cfg.get("log_every_energy", 50),
        "LOG_EVERY_TRAJECTORY": log_cfg.get("log_every_trajectory", 50),
        "LOG_EVERY_NEIGHBORS": log_cfg.get("log_every_neighbors", 50),
        "LOG_EVERY_CONVERGENCE": log_cfg.get("log_every_convergence", 25),
    }


def maybe_wandb(cfg: dict, params: dict):
    wcfg = cfg.get("wandb", {})
    if not wcfg.get("enable", False):
        return None
    try:
        run = wandb.init(project=wcfg.get("project", "bimodal-idbn-tpu"),
                         entity=wcfg.get("entity"),
                         name=wcfg.get("run_name"), config=cfg)
        if run is not None:
            run.config.update({"_derived_params": params},
                              allow_val_change=True)
        return run
    except Exception as e:
        print(f"[maybe_wandb] disabled ({e})")
        return None


def _create_modality_dataloader(train_loader, modality_idx: int):
    """Materialize one modality (+ numeric labels) into a dedicated
    loader for iDBN pretraining (reference train_bimodal.py:192-233)."""
    base_dataset = train_loader.dataset
    if hasattr(base_dataset, "dataset"):
        base = base_dataset.dataset
        indices = list(base_dataset.indices)
    else:
        base = base_dataset
        indices = list(range(len(base)))

    idx = np.asarray(indices)
    source = base.images if modality_idx == 0 else base.mod2_images
    if source is None:
        raise ValueError(
            f"dataset has no modality-{modality_idx + 1} images — check the "
            f"config's dataset.second_modality setting")
    images = source[idx]
    labels = np.asarray(base.labels)[idx]
    ds = NumerosityDataset(
        images=images, labels=labels, onehot=base.onehot[idx],
        cumArea=np.asarray(base.cumArea_list)[idx],
        CH=np.asarray(base.CH_list)[idx])
    return DataLoader(ds, batch_size=train_loader.batch_size, shuffle=True)


def _train_mod_dbn(bimodal, train_loader, params, modality_idx: int,
                   start_epoch: int = 0, ckpt_kw: dict | None = None):
    dbn = bimodal.mod1_dbn if modality_idx == 0 else bimodal.mod2_dbn
    dbn.dataloader = _create_modality_dataloader(train_loader, modality_idx)
    epochs = params["EPOCHS_MOD1" if modality_idx == 0 else "EPOCHS_MOD2"]
    print(f"  Training MOD{modality_idx + 1} iDBN for {epochs} epochs...")
    init_retry = int(params.get("INIT_RETRY", 0) or 0)
    kw = dict(ckpt_kw or {})
    if init_retry > 0:
        # with start_epoch the first attempt continues from the restored
        # checkpoint; the collapse check still runs at the end, so a
        # crash+resume cannot ship a collapsed modality stack
        retries = dbn.train_with_retry(epochs, max_retries=init_retry,
                                       start_epoch=start_epoch, **kw)
        if retries:
            print(f"  [init_retry] MOD{modality_idx + 1} re-initialized "
                  f"{retries} time(s) after blank-level recon")
    else:
        dbn.train(epochs, start_epoch=start_epoch, **kw)


def main():
    from multimodal_idbn_tpu.config import (
        enable_persistent_compilation_cache, set_matmul_precision)
    enable_persistent_compilation_cache()
    args = parse_args()
    cfg = load_config(args.config)

    # True-f32 GEMMs by default: TPUs run f32 matmuls at bf16 input
    # precision otherwise, and CD training is measurably precision-
    # sensitive (benchmarks/RESULTS.md). Matches the torch reference's
    # numerics (rbm.py:181-227); training.matmul_precision overrides.
    set_matmul_precision(
        str(cfg.get("training", {}).get("matmul_precision", "highest")))

    dataset = cfg.get("dataset", {})
    model = cfg.get("model", {})
    params = build_params(cfg)
    log_params = build_logging_params(cfg)
    logging_cfg = cfg.get("logging", {})

    train_loader, val_loader, _ = create_dataloaders_uniform(
        data_path=dataset.get("path"),
        data_name=dataset.get("name"),
        batch_size=dataset.get("batch_size", 128),
        num_workers=dataset.get("num_workers", 1),
        multimodal_flag=dataset.get("multimodal_flag", True),
        second_modality=dataset.get("second_modality", "mnist100"),
        mnist100_path=dataset.get("mnist100_path"),
        num_classes=model.get("num_labels", 32),
        n_samples=dataset.get("n_samples", 512),
        side=dataset.get("side", 100),
    )

    # fail fast BEFORE any training: MOD2 pretraining and the joint model
    # both need a second modality in the dataset
    base = train_loader.dataset
    base = getattr(base, "dataset", base)
    if getattr(base, "mod2_images", None) is None:
        raise ValueError(
            "bimodal training needs a second modality but the dataset has "
            "none — set dataset.second_modality (e.g. 'mnist100') in the "
            "config")

    wandb_run = maybe_wandb(cfg, params)

    joint_hidden = model.get("joint_hidden", 500)
    if isinstance(joint_hidden, int):
        joint_hidden = [joint_hidden]

    bimodal = iMDBN_BiModal(
        layer_sizes_mod1=model.get("mod1_layers", [10000, 1500, 500]),
        layer_sizes_mod2=model.get("mod2_layers", [1568, 500, 500]),
        joint_layer_sizes=joint_hidden,
        params=params,
        dataloader=train_loader,
        val_loader=val_loader,
        device=None,
        wandb_run=wandb_run,
        logging_cfg=logging_cfg,
        seed=params.get("SEED"),
    )

    # Crash-safe resume (framework extension, mirroring
    # train_multimodal.py): with training.checkpoint_every, each phase
    # writes a resumable checkpoint every N epochs under
    # paths.checkpoint_dir; rerunning the same command picks up
    # bit-identically at the last checkpoint. A phase-complete marker
    # (next_epoch == EPOCHS, written AFTER the finetune hook) keeps a
    # crash in a later phase from retraining earlier ones. Checkpoints
    # are removed after the final model save.
    from multimodal_idbn_tpu.checkpoint import (
        cli_checkpoint_paths, config_fingerprint,
        load_train_checkpoint_expecting, save_train_checkpoint)
    ckpt_every = int(params.get("CHECKPOINT_EVERY", 0) or 0)
    mod1_ckpt = mod2_ckpt = joint_ckpt = None
    mod1_start = mod2_start = joint_start = 0
    mod1_done = mod2_done = False
    # Fingerprint the training-relevant config into every checkpoint so
    # resuming after a hyperparameter edit refuses instead of silently
    # mixing schedules (checkpoint.load_train_checkpoint_expecting).
    fp = config_fingerprint(
        params,
        mod1_layers=model.get("mod1_layers", [10000, 1500, 500]),
        mod2_layers=model.get("mod2_layers", [1568, 500, 500]),
        joint_layers=joint_hidden,
        # numerics knob: see train_multimodal.py — precision edits must
        # not silently resume
        matmul_precision=str(cfg.get("training", {}).get(
            "matmul_precision", "highest")))
    for _m in (bimodal, bimodal.mod1_dbn, bimodal.mod2_dbn):
        _m._ckpt_fingerprint = fp
    ignore_cfg = bool(cfg.get("training", {}).get(
        "resume_ignore_config", False))
    if ckpt_every > 0:
        ckpts = cli_checkpoint_paths(cfg, ("mod1", "mod2", "bimodal_joint"))
        mod1_ckpt, mod2_ckpt = ckpts["mod1"], ckpts["mod2"]
        joint_ckpt = ckpts["bimodal_joint"]
        if joint_ckpt.exists():
            # restores every RBM in the model (both modality stacks +
            # joint layers), so the mod phases are skipped entirely
            joint_start = load_train_checkpoint_expecting(
                bimodal, joint_ckpt, "bimodal_joint",
                ignore_config=ignore_cfg)
            mod1_done = mod2_done = True
            print(f"[train_bimodal] resuming joint training at epoch "
                  f"{joint_start}/{params['EPOCHS_JOINT']}")
        else:
            if mod1_ckpt.exists():
                mod1_start = load_train_checkpoint_expecting(
                    bimodal.mod1_dbn, mod1_ckpt, "mod1",
                    ignore_config=ignore_cfg)
                mod1_done = mod1_start >= int(params["EPOCHS_MOD1"])
                print(f"[train_bimodal] resuming MOD1 training at epoch "
                      f"{mod1_start}/{params['EPOCHS_MOD1']}")
            if mod2_ckpt.exists():
                mod2_start = load_train_checkpoint_expecting(
                    bimodal.mod2_dbn, mod2_ckpt, "mod2",
                    ignore_config=ignore_cfg)
                mod2_done = mod2_start >= int(params["EPOCHS_MOD2"])
                print(f"[train_bimodal] resuming MOD2 training at epoch "
                      f"{mod2_start}/{params['EPOCHS_MOD2']}")

    def _mod_ckpt_kw(path, phase):
        return ({"checkpoint_every": ckpt_every,
                 "checkpoint_path": str(path),
                 "checkpoint_phase": phase} if ckpt_every else None)

    # 1) MOD1 DBN (numerosity)
    mod1_pre = cfg.get("paths", {}).get("mod1_pretrained")
    if mod1_done or (mod1_pre and bimodal.load_pretrained_mod1_dbn(mod1_pre)):
        pass
    else:
        if mod1_pre:
            print("[main] fallback: training MOD1 iDBN from scratch...")
        else:
            print("Training MOD1 iDBN (Numerosity)...")
        _train_mod_dbn(bimodal, train_loader, params, 0,
                       start_epoch=mod1_start,
                       ckpt_kw=_mod_ckpt_kw(mod1_ckpt, "mod1"))

    ft1 = int(cfg.get("paths", {}).get("mod1_finetune_last_epochs", 0))
    if ft1 > 0 and not mod1_done:
        bimodal.finetune_mod1_last_layer(epochs=ft1, lr_scale=0.3)
    if ckpt_every and not mod1_done:
        save_train_checkpoint(bimodal.mod1_dbn, str(mod1_ckpt),
                              phase="mod1",
                              next_epoch=int(params["EPOCHS_MOD1"]),
                              loss_history=bimodal.mod1_dbn.loss_history)

    # 2) MOD2 DBN (MNIST-100)
    mod2_pre = cfg.get("paths", {}).get("mod2_pretrained")
    if mod2_done or (mod2_pre and bimodal.load_pretrained_mod2_dbn(mod2_pre)):
        pass
    else:
        if mod2_pre:
            print("[main] fallback: training MOD2 iDBN from scratch...")
        else:
            print("Training MOD2 iDBN (MNIST-100)...")
        _train_mod_dbn(bimodal, train_loader, params, 1,
                       start_epoch=mod2_start,
                       ckpt_kw=_mod_ckpt_kw(mod2_ckpt, "mod2"))

    ft2 = int(cfg.get("paths", {}).get("mod2_finetune_last_epochs", 0))
    if ft2 > 0 and not mod2_done:
        bimodal.finetune_mod2_last_layer(epochs=ft2, lr_scale=0.3)
    if ckpt_every and not mod2_done:
        save_train_checkpoint(bimodal.mod2_dbn, str(mod2_ckpt),
                              phase="mod2",
                              next_epoch=int(params["EPOCHS_MOD2"]),
                              loss_history=bimodal.mod2_dbn.loss_history)

    # 3) Joint training
    print("Training joint RBM...")
    joint_kw = ({"checkpoint_every": ckpt_every,
                 "checkpoint_path": str(joint_ckpt),
                 "start_epoch": joint_start}
                if ckpt_every else {})
    bimodal.train_joint(
        epochs=params["EPOCHS_JOINT"],
        log_every=log_params["LOG_EVERY"],
        log_every_pca=log_params["LOG_EVERY_PCA"],
        log_every_probe=log_params["LOG_EVERY_PROBE"],
        log_every_trajectory=log_params["LOG_EVERY_TRAJECTORY"],
        **joint_kw)

    # Save
    save_dir = Path(cfg.get("paths", {}).get("save_dir",
                                             "./networks")).expanduser()
    save_dir.mkdir(parents=True, exist_ok=True)
    save_path = save_dir / (f"{cfg.get('paths', {}).get('save_name', 'bimodal_trained')}.pkl")
    bimodal.save_model(str(save_path))
    print(f"Saved bimodal model to {save_path}")

    if ckpt_every:
        # the run completed and the model is saved
        from multimodal_idbn_tpu.checkpoint import remove_checkpoints
        remove_checkpoints((mod1_ckpt, mod2_ckpt, joint_ckpt))

    if wandb_run:
        wandb_run.finish()


if __name__ == "__main__":
    main()
