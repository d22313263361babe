"""Multi-chip training walkthrough: 1-D data-parallel and 2-D
(data x model) tensor-parallel fused epochs.

The reference is strictly single-device (SURVEY.md §2 rows 20-21); this
example shows the TPU-native scaling story. It runs anywhere: on a TPU
slice it uses the real chips; elsewhere pass --virtual to provision an
8-device virtual CPU mesh (what the test suite uses).

Usage:
    python examples/multichip_training.py [--virtual] [--epochs 5]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--epochs", type=int, default=5)
    args = ap.parse_args()

    import jax
    if args.virtual:
        # Must happen before backend init (see __graft_entry__ for the
        # subprocess fallback when a backend already exists).
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp
    import numpy as np

    from multimodal_idbn_tpu.ops import rbm_ops
    from multimodal_idbn_tpu.parallel import (
        dp_idbn_epoch, make_mesh, make_mesh_2d, tp_idbn_epoch)

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")

    # Toy 2-layer DBN on synthetic bars
    V, H1, H2, N, BS = 256, 64, 32, 512, 64
    rng = np.random.RandomState(0)
    data = (rng.rand(N, V) > 0.85).astype(np.float32)
    states = (rbm_ops.init_rbm_state(jax.random.key(0), V, H1),
              rbm_ops.init_rbm_state(jax.random.key(1), H1, H2))

    # --- 1-D data parallelism: batch sharded, parameters replicated.
    mesh = make_mesh()
    for e in range(args.epochs):
        states, losses = dp_idbn_epoch(
            mesh, states, jax.random.fold_in(jax.random.key(2), e), data,
            0.1, 0.5, 1e-4, 0.05, cd=1, sparsity_flags=(False, True),
            batch_size=BS)
    print(f"DP   mesh {dict(mesh.shape)}: "
          f"final loss {float(losses.mean()):.4f}")

    # --- 2-D (data x model): batch sharded over 'data', every layer's
    # hidden dimension megatron-split over 'model'.
    states = (rbm_ops.init_rbm_state(jax.random.key(0), V, H1),
              rbm_ops.init_rbm_state(jax.random.key(1), H1, H2))
    mp = 2 if n_dev % 2 == 0 else 1
    mesh2 = make_mesh_2d(dp=n_dev // mp, mp=mp)
    for e in range(args.epochs):
        states, losses = tp_idbn_epoch(
            mesh2, states, jax.random.fold_in(jax.random.key(2), e), data,
            0.1, 0.5, 1e-4, 0.05, cd=1, sparsity_flags=(False, True),
            batch_size=BS)
    print(f"DPxTP mesh {dict(mesh2.shape)}: "
          f"final loss {float(losses.mean()):.4f} "
          f"(same RNG draws as 1 chip — losses match the DP run to "
          f"reduction order)")
    # each device holds only H/mp columns of every W
    shard = states[0].w.addressable_shards[0].data.shape
    print(f"W[0] global {tuple(states[0].w.shape)}, per-device {shard}")

    # --- Shell-level: the same DP path from the user-facing model API
    # (params["DP_DEVICES"], or a `training: dp_devices:` config key for
    # scripts/train_multimodal.py).
    from multimodal_idbn_tpu.models import iDBN

    class Loader:
        batch_size = BS

        def materialize(self):
            return data, np.zeros(N, np.int64)

    params = {"LEARNING_RATE": 0.1, "WEIGHT_PENALTY": 1e-4,
              "INIT_MOMENTUM": 0.5, "FINAL_MOMENTUM": 0.95,
              "LEARNING_RATE_DYNAMIC": True, "CD": 1, "SEED": 0,
              "DP_DEVICES": "all"}
    model = iDBN([V, H1, H2], params=params, dataloader=Loader(),
                 val_loader=None, seed=0)
    model.train(args.epochs, log_every_pca=10**9, log_every_probe=10**9)
    print(f"iDBN(DP_DEVICES=all) over {model.mesh.devices.size} devices: "
          f"final loss {model.loss_history[-1]:.4f}")


if __name__ == "__main__":
    main()
