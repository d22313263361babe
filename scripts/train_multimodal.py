"""Train a multimodal iDBN (image) + joint RBM with label softmax group.

TPU-native mirror of reference scripts/train_multimodal.py:27-160: same
YAML schema, same UPPERCASE params mapping, same load-or-train /
finetune / train_joint / save flow.
"""

from pathlib import Path
import argparse
import sys

import yaml

PROJECT_ROOT = Path(__file__).resolve().parent.parent
if str(PROJECT_ROOT) not in sys.path:
    sys.path.insert(0, str(PROJECT_ROOT))

from multimodal_idbn_tpu.models import iMDBN  # noqa: E402
from multimodal_idbn_tpu.data import (  # noqa: E402
    create_dataloaders_uniform,
    create_dataloaders_zipfian,
)
from multimodal_idbn_tpu.utils.wandb_compat import wandb  # noqa: E402

DEFAULT_CONFIG_PATH = (PROJECT_ROOT / "configs"
                       / "multimodal_training_config.yaml")


def parse_args():
    ap = argparse.ArgumentParser(
        "Train a simple multimodal iDBN (image) + joint RBM with label "
        "softmax")
    ap.add_argument("--config", type=Path, default=DEFAULT_CONFIG_PATH)
    return ap.parse_args()


def load_config(path: Path) -> dict:
    with path.open("r") as f:
        return yaml.safe_load(f)


def build_params(cfg: dict) -> dict:
    """YAML → UPPERCASE params dict (reference train_multimodal.py:27-51)."""
    t = cfg.get("training", {})
    return {
        "LEARNING_RATE": t.get("learning_rate", 0.1),
        "WEIGHT_PENALTY": t.get("weight_penalty", 1e-4),
        "INIT_MOMENTUM": t.get("init_momentum", 0.5),
        "FINAL_MOMENTUM": t.get("final_momentum", 0.95),
        "LEARNING_RATE_DYNAMIC": t.get("learning_rate_dynamic", True),
        "CD": t.get("cd", 1),
        "EPOCHS_IMG": t.get("epochs_image", 100),
        "EPOCHS_JOINT": t.get("epochs_joint", 200),
        "JOINT_LEARNING_RATE": t.get("joint_learning_rate",
                                     t.get("learning_rate", 0.1)),
        "JOINT_CD": t.get("joint_cd", t.get("cd", 1)),
        "CROSS_GIBBS_STEPS": t.get("cross_gibbs_steps", 50),
        "USE_AUX": t.get("use_aux", True),
        "JOINT_AUX_COND_STEPS": t.get("JOINT_AUX_COND_STEPS",
                                      t.get("aux_cond_steps", 50)),
        "JOINT_AUX_EVERY_K": t.get("JOINT_AUX_EVERY_K", 10),
        # framework extension: thin the per-batch cross metrics (default 1
        # keeps the reference's every-batch cadence, imdbn.py:614-639)
        "CROSS_METRICS_EVERY": t.get("cross_metrics_every", 1),
        # framework extension: data-parallel training over N devices
        # (int or "all"; the reference is single-device)
        "DP_DEVICES": t.get("dp_devices"),
        # framework extension: retrain the image iDBN up to N times if
        # its reconstruction collapses to blank level (measured bad-seed
        # rescue, iDBN.train_with_retry; 0 = reference behavior)
        "INIT_RETRY": t.get("init_retry", 0),
        # framework extension: crash-safe resume — write a resumable
        # checkpoint every N epochs (paths.checkpoint_dir); rerunning the
        # same command continues bit-identically from the last checkpoint
        "CHECKPOINT_EVERY": t.get("checkpoint_every", 0),
        # framework extensions: parameter storage / chain-GEMM precision
        # and the stochastic-rounding override (models/rbm.py param_dtype
        # / param_compute_dtype / param_sr). Defaults = reference
        # semantics (f32 everywhere, SR auto = on only for bf16 storage).
        "DTYPE": t.get("dtype", "float32"),
        "COMPUTE_DTYPE": t.get("compute_dtype"),
        "SR": t.get("stochastic_rounding"),
        "SEED": t.get("seed", 0),
    }


def build_logging_params(cfg: dict) -> dict:
    """Logging cadences (reference train_multimodal.py:54-66)."""
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
    """W&B init gated on yaml `wandb.enable`
    (reference train_multimodal.py:69-81)."""
    wcfg = cfg.get("wandb", {})
    if not wcfg.get("enable", False):
        return None
    try:
        run = wandb.init(
            project=wcfg.get("project", "multimodal-idbn-tpu"),
            entity=wcfg.get("entity"),
            name=wcfg.get("run_name"),
            config=cfg)
        if run is not None:
            run.config.update({"_derived_params": params},
                              allow_val_change=True)
        return run
    except Exception as e:
        print(f"[maybe_wandb] disabled ({e})")
        return None


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

    # Framework extension (off by default): route mean-field conditional
    # inference through the Pallas VMEM-chain kernels when shapes fit.
    if cfg.get("training", {}).get("use_pallas_chain", False):
        from multimodal_idbn_tpu import config as fw_config
        fw_config.enable_pallas_chain(True)
        print("[train_multimodal] pallas chain kernels enabled")

    dataset = cfg.get("dataset", {})
    model = cfg.get("model", {})
    params = build_params(cfg)
    log_params = build_logging_params(cfg)
    logging_cfg = cfg.get("logging", {})

    make_loaders = (create_dataloaders_zipfian
                    if dataset.get("distribution") == "zipfian"
                    else create_dataloaders_uniform)
    if make_loaders is create_dataloaders_zipfian:
        print("[train_multimodal] zipfian class distribution")
    train_loader, val_loader, _ = make_loaders(
        data_path=dataset.get("path"),
        data_name=dataset.get("name"),
        batch_size=dataset.get("batch_size", 128),
        num_workers=dataset.get("num_workers", 1),
        multimodal_flag=dataset.get("multimodal_flag", True),
        num_classes=model.get("num_labels", 32),
        n_samples=dataset.get("n_samples", 512),
        side=dataset.get("side", 100),
    )

    wandb_run = maybe_wandb(cfg, params)

    imdbn = iMDBN(
        layer_sizes_img=model.get("image_layers", [10000, 1500, 1500]),
        joint_layer_size=model.get("joint_hidden", 1000),
        params=params,
        dataloader=train_loader,
        val_loader=val_loader,
        device=None,
        num_labels=model.get("num_labels", 32),
        wandb_run=wandb_run,
        logging_cfg=logging_cfg,
        seed=params.get("SEED"),
    )

    if params.get("DP_DEVICES"):
        print(f"[train_multimodal] data-parallel training over "
              f"{params['DP_DEVICES']} device(s)")

    # Crash-safe resume (framework extension): with
    # training.checkpoint_every, a resumable checkpoint is written every
    # N epochs under paths.checkpoint_dir; rerunning the same command
    # picks up bit-identically at the last checkpoint. Checkpoints are
    # removed after the final model save.
    from multimodal_idbn_tpu.checkpoint import (
        cli_checkpoint_paths, config_fingerprint,
        load_train_checkpoint_expecting)
    ckpt_every = int(params.get("CHECKPOINT_EVERY", 0) or 0)
    image_ckpt = joint_ckpt = None
    image_start = joint_start = 0
    image_done = False
    # Fingerprint the training-relevant config into every checkpoint so
    # resuming after a hyperparameter edit refuses instead of silently
    # mixing schedules (checkpoint.load_train_checkpoint_expecting).
    fp = config_fingerprint(
        params,
        image_layers=model.get("image_layers", [10000, 1500, 1500]),
        joint_hidden=model.get("joint_hidden", 1000),
        num_labels=model.get("num_labels", 32),
        # numerics knob: resuming f32-GEMM checkpoints under bf16-input
        # GEMMs (or vice versa) mixes precisions mid-run — refuse
        matmul_precision=str(cfg.get("training", {}).get(
            "matmul_precision", "highest")))
    imdbn._ckpt_fingerprint = fp
    imdbn.image_idbn._ckpt_fingerprint = fp
    ignore_cfg = bool(cfg.get("training", {}).get(
        "resume_ignore_config", False))
    if ckpt_every > 0:
        ckpts = cli_checkpoint_paths(cfg, ("image", "joint"))
        image_ckpt, joint_ckpt = ckpts["image"], ckpts["joint"]
        if joint_ckpt.exists():
            joint_start = load_train_checkpoint_expecting(
                imdbn, joint_ckpt, "joint", ignore_config=ignore_cfg)
            image_done = True
            print(f"[train_multimodal] resuming joint training at epoch "
                  f"{joint_start}/{params['EPOCHS_JOINT']}")
        elif image_ckpt.exists():
            image_start = load_train_checkpoint_expecting(
                imdbn.image_idbn, image_ckpt, "image",
                ignore_config=ignore_cfg)
            image_done = image_start >= int(params["EPOCHS_IMG"])
            print(f"[train_multimodal] resuming image training at epoch "
                  f"{image_start}/{params['EPOCHS_IMG']}")

    # 1) image iDBN: load if available, otherwise train
    image_pre = cfg.get("paths", {}).get("image_idbn_pretrained")
    if not (image_done
            or (image_pre and imdbn.load_pretrained_image_idbn(image_pre))):
        print("Training image iDBN..." if not image_pre else
              "[main] fallback: training image iDBN from scratch...")
        ckpt_kw = ({"checkpoint_every": ckpt_every,
                    "checkpoint_path": str(image_ckpt)}
                   if ckpt_every else {})
        init_retry = int(params.get("INIT_RETRY", 0) or 0)
        if init_retry > 0:
            # with start_epoch the first attempt continues from the
            # restored checkpoint; the collapse check still runs at the
            # end, so a crash+resume cannot ship a collapsed model
            retries = imdbn.image_idbn.train_with_retry(
                params["EPOCHS_IMG"], max_retries=init_retry,
                start_epoch=image_start,
                log_every_pca=log_params["LOG_EVERY_PCA"],
                log_every_probe=log_params["LOG_EVERY_PROBE"], **ckpt_kw)
            if retries:
                print(f"[train_multimodal] init_retry: re-initialized "
                      f"{retries} time(s) after blank-level recon")
        else:
            imdbn.image_idbn.train(
                params["EPOCHS_IMG"], start_epoch=image_start,
                log_every_pca=log_params["LOG_EVERY_PCA"],
                log_every_probe=log_params["LOG_EVERY_PROBE"], **ckpt_kw)
    # optional: fine-tune last image RBM (skipped when the phase marker
    # or a joint checkpoint says the image phase already completed — the
    # restored states are post-finetune, so re-running would double it)
    ft_epochs = int(cfg.get("paths", {}).get(
        "image_idbn_finetune_last_epochs", 0))
    if ft_epochs > 0 and not image_done:
        imdbn.finetune_image_last_layer(epochs=ft_epochs, lr_scale=0.3)
    if ckpt_every and not image_done:
        # phase-complete marker (AFTER the finetune hook): a crash during
        # joint training must not retrain or re-finetune the image stack
        imdbn.image_idbn._save_train_checkpoint(
            str(image_ckpt), int(params["EPOCHS_IMG"]))

    # 2) joint training + full logging
    print("Training joint RBM...")
    joint_kw = ({"checkpoint_every": ckpt_every,
                 "checkpoint_path": str(joint_ckpt),
                 "start_epoch": joint_start}
                if ckpt_every else {})
    imdbn.train_joint(epochs=params["EPOCHS_JOINT"],
                      log_every=log_params["LOG_EVERY"],
                      log_every_pca=log_params["LOG_EVERY_PCA"],
                      log_every_probe=log_params["LOG_EVERY_PROBE"],
                      **joint_kw)

    # Save
    save_dir = Path(cfg.get("paths", {}).get("save_dir",
                                             "./networks")).expanduser()
    save_dir.mkdir(parents=True, exist_ok=True)
    save_path = save_dir / (f"{cfg.get('paths', {}).get('save_name', 'imdbn_trained')}.pkl")
    imdbn.save_model(str(save_path))
    print(f"Saved multimodal model to {save_path}")

    if ckpt_every:
        # the run completed and the model is saved
        from multimodal_idbn_tpu.checkpoint import remove_checkpoints
        remove_checkpoints((image_ckpt, joint_ckpt))

    if wandb_run:
        wandb_run.finish()


if __name__ == "__main__":
    main()
