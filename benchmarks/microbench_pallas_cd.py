"""Flagship fused-epoch A/B: exact jnp CD path vs the opt-in Pallas
sampled-CD path (``config.enable_pallas_cd`` / ``fast_sampler``).

Reproduces the RESULTS.md "fused Pallas sampled-CD kernel" table
(measured 0.43-0.44x — the kernel LOSES to XLA at these shapes; kept as
a measured-negative opt-in). Needs the real TPU (the Mosaic PRNG has no
CPU interpret mode).

Usage: python benchmarks/microbench_pallas_cd.py [--cd 1 10] [--per 10]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_idbn_tpu.ops import dbn_train, rbm_ops

LAYERS, BATCH, N = (10000, 1500, 500), 128, 2048


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cd", type=int, nargs="+", default=[1, 10])
    ap.add_argument("--per", type=int, default=10,
                    help="epochs per timing group (3 groups, median)")
    args = ap.parse_args()

    from multimodal_idbn_tpu.ops.pallas_kernels import sampled_cd_supported
    if not sampled_cd_supported():
        print("needs a TPU backend (Mosaic PRNG); current backend:",
              jax.default_backend(), file=sys.stderr)
        sys.exit(1)

    rng = np.random.RandomState(0)
    data = jnp.asarray((rng.rand(N, LAYERS[0]) < 0.12).astype(np.float32))
    keys = jax.random.split(jax.random.key(0), 3)

    def run(cd, fast, groups=3):
        states = tuple(
            rbm_ops.init_rbm_state(keys[i], LAYERS[i], LAYERS[i + 1])
            for i in range(2))

        def epoch(states, e):
            return dbn_train.idbn_epoch(
                states, jax.random.fold_in(keys[-1], e), data, 0.1, 0.5,
                1e-4, 0.1, cd=cd, sparsity_flags=(False, True),
                batch_size=BATCH, fast_sampler=fast)

        t0 = time.perf_counter()
        states, l = epoch(states, 0)
        float(l[-1, -1])
        print(f"  compile {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        times = []
        e = 1
        for _ in range(groups):
            t0 = time.perf_counter()
            for _ in range(args.per):
                states, l = epoch(states, e)
                e += 1
            loss = float(l[-1, -1])  # value fetch = sync barrier
            times.append((time.perf_counter() - t0) / args.per)
        return sorted(times)[len(times) // 2], loss

    for cd in args.cd:
        t_jnp, l_jnp = run(cd, False)
        t_pal, l_pal = run(cd, True)
        print(f"cd={cd}: jnp {t_jnp*1e3:.2f} ms (loss {l_jnp:.5f}) | "
              f"pallas-cd {t_pal*1e3:.2f} ms (loss {l_pal:.5f}) -> "
              f"{t_jnp/t_pal:.2f}x")


if __name__ == "__main__":
    main()
