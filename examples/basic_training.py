"""Basic end-to-end iMDBN walkthrough.

Mirror of reference examples/basic_training.py:17-143 with the stale API
calls fixed (the reference passes ``warmup_epochs`` / ``log_every_metrics``
/ ``log_every_cross`` kwargs that ``train_joint`` never accepted, and
``path2data``/``val_size`` loader kwargs — SURVEY.md §2.2). This version
runs self-contained on synthetic data:

1. Create dataloaders
2. Train the image iDBN + joint RBM
3. Cross-modal reconstruction (IMG→TXT, TXT→IMG)
4. Save and reload the model
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_idbn_tpu.data import create_dataloaders_uniform
from multimodal_idbn_tpu.models import iMDBN


def main():
    print("Loading data (synthetic numerosity stimuli)...")
    train_loader, val_loader, test_loader = create_dataloaders_uniform(
        data_path=None,          # point at a stimuli_dataset.npz directory
        batch_size=64,
        n_samples=512, num_classes=8, side=28, seed=0)
    print(f"Train size: {len(train_loader.dataset)}")
    print(f"Val size: {len(val_loader.dataset)}")

    params = {
        # Image DBN
        "LEARNING_RATE": 0.1,
        "WEIGHT_PENALTY": 1e-4,
        "INIT_MOMENTUM": 0.5,
        "FINAL_MOMENTUM": 0.95,
        "LEARNING_RATE_DYNAMIC": True,
        "CD": 1,
        "EPOCHS_IMG": 20,
        # Joint RBM
        "EPOCHS_JOINT": 12,
        "JOINT_LEARNING_RATE": 0.04,
        "JOINT_CD": 1,
        "CROSS_GIBBS_STEPS": 10,
        # Auxiliary training
        "USE_AUX": True,
        "JOINT_AUX_COND_STEPS": 5,
    }

    print("Building iMDBN (784-256-64 image DBN, joint hidden 48)...")
    model = iMDBN(
        layer_sizes_img=[784, 256, 64],
        joint_layer_size=48,
        params=params,
        dataloader=train_loader,
        val_loader=val_loader,
        num_labels=8,
        seed=0,
    )

    print("Training image iDBN...")
    model.image_idbn.train(epochs=params["EPOCHS_IMG"])
    print(f"  final idbn loss: {model.image_idbn.loss_history[-1]:.4f}")

    print("Training joint RBM (8 warmup y-clamp epochs + free CD)...")
    model.train_joint(epochs=params["EPOCHS_JOINT"])
    print(f"  cross-modal metrics: {model.last_metrics}")

    # Cross-modal inference
    imgs, labels = next(iter(val_loader))
    z_img = model.image_idbn.represent(imgs)
    recon_imgs, p_y = model._cross_reconstruct(z_img, labels, steps=10)
    pred = np.asarray(p_y).argmax(1)
    gt = np.asarray(labels).argmax(1)
    print(f"IMG->TXT top-1 on one val batch: {(pred == gt).mean():.3f}")
    mse = float(np.mean((np.asarray(recon_imgs)
                         - imgs.reshape(len(imgs), -1)) ** 2))
    print(f"TXT->IMG reconstruction MSE: {mse:.4f}")

    # Save + reload
    out = Path("/tmp/imdbn_example.pkl")
    model.save_model(str(out))
    payload = iMDBN.load_model(str(out))
    z2 = payload["image_idbn"].represent(imgs)
    assert np.allclose(np.asarray(z2), np.asarray(z_img), atol=1e-5)
    print("Reloaded model reproduces representations. Done.")


if __name__ == "__main__":
    main()
