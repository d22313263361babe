"""Cold-compile study: where the flagship blocked-epoch compile time goes
and whether the persistent compilation cache works across processes on
each backend (VERDICT r3 item 3).

Each invocation measures ONE jitted path in a fresh process:
    python benchmarks/compile_study.py --path img|joint_main|joint_warmup
        [--cache DIR] [--backend axon|cpu] [--epochs E] [--steps S]
Prints one JSON line: {"path", "backend", "lower_s", "compile_s",
"cache_hit": bool-ish, ...}. Run twice with the same --cache DIR to
measure cross-process caching (second run's compile_s ≈ 0 on a hit).

Driver mode aggregates the standard matrix:
    python benchmarks/compile_study.py --matrix [--backend axon]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(args):
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.cache:
        jax.config.update("jax_compilation_cache_dir", args.cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        jax.config.update("jax_explain_cache_misses", True)
    logging.getLogger("jax._src.compilation_cache").setLevel(
        logging.DEBUG)
    logging.basicConfig(stream=sys.stderr, level=logging.INFO)

    import jax.numpy as jnp

    from multimodal_idbn_tpu.ops import dbn_train, imdbn_ops, rbm_ops

    # Flagship shapes (configs/multimodal_training_config.yaml:9-34)
    N, V, H1, Dz, K, Hj, B = 1434, 10000, 1500, 500, 32, 500, 128
    E = args.epochs
    f32 = jnp.float32

    def sd(*shape):
        return jax.ShapeDtypeStruct(shape, f32)

    key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
    states = tuple(rbm_ops.RBMState(*(sd(v, h), sd(h), sd(v),
                                      sd(v, h), sd(h), sd(v)))
                   for v, h in ((V, H1), (H1, Dz)))
    joint = rbm_ops.RBMState(sd(Dz + K, Hj), sd(Hj), sd(Dz + K),
                             sd(Dz + K, Hj), sd(Hj), sd(Dz + K))
    groups = ((Dz, Dz + K),)

    if args.path == "img":
        fn = dbn_train.idbn_epoch_block
        lowargs = (states, key, sd(N, V),
                   jax.ShapeDtypeStruct((E,), jnp.int32), sd(E), sd(E),
                   1e-4, 0.1)
        lowkw = dict(cd=10, sparsity_flags=(False, True), batch_size=B,
                     n_epochs=E)
    elif args.path in ("joint_main", "joint_warmup"):
        fn = imdbn_ops.joint_epoch_block
        warm = args.path == "joint_warmup"
        lowargs = (joint, states, key, sd(N, Dz), sd(N, K), sd(N, V),
                   jax.ShapeDtypeStruct((E,), jnp.int32), sd(E), sd(E),
                   1e-4, sd(K, Dz))
        lowkw = dict(warmup=warm, joint_cd=5,
                     aux_cond_steps=args.aux_steps, Dz=Dz,
                     steps=args.steps, groups=groups, batch_size=B,
                     n_epochs=E)
    else:
        raise SystemExit(f"unknown path {args.path}")

    t0 = time.time()
    lowered = fn.lower(*lowargs, **lowkw)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    cost = {}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        cost = {k: ca.get(k) for k in ("flops", "bytes accessed")
                if ca and k in ca}
    except Exception:
        pass
    out = {"path": args.path, "backend": args.backend, "epochs": E,
           "steps": args.steps, "lower_s": round(t_lower, 2),
           "compile_s": round(t_compile, 2), "cache": bool(args.cache),
           "cost": cost}
    print(json.dumps(out))
    return out


def run_child(path, backend, cache, epochs, steps, aux):
    env = dict(os.environ)
    if backend == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, __file__, "--path", path, "--backend", backend,
           "--epochs", str(epochs), "--steps", str(steps),
           "--aux-steps", str(aux)]
    if cache:
        cmd += ["--cache", cache]
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=str(REPO), timeout=3600)
    if p.returncode != 0:
        log(f"[matrix] {path} FAILED:\n{p.stderr[-2000:]}")
        return None
    # surface cache-miss explanations / cache logs
    for line in p.stderr.splitlines():
        if "cache" in line.lower() and "WARNING" not in line:
            log("   ", line[:200])
    return json.loads(p.stdout.splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default=None,
                    choices=["img", "joint_main", "joint_warmup"])
    ap.add_argument("--backend", default="axon",
                    choices=["axon", "cpu"])
    ap.add_argument("--cache", default=None)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--aux-steps", type=int, default=30)
    ap.add_argument("--matrix", action="store_true")
    args = ap.parse_args()

    if not args.matrix:
        measure(args)
        return

    import tempfile
    cache = tempfile.mkdtemp(prefix="jaxcache_study_")
    results = []
    plan = [
        # (label, path, epochs, steps, cache)
        ("img_E100_cold", "img", 100, 50, cache),
        ("img_E100_proc2", "img", 100, 50, cache),  # cross-process rerun
        ("joint_main_E142_cold", "joint_main", 142, 50, cache),
        ("joint_main_E142_proc2", "joint_main", 142, 50, cache),
        ("joint_warmup_E8_cold", "joint_warmup", 8, 50, cache),
        ("joint_main_E2_cold", "joint_main", 2, 50, None),  # E-scaling
        ("joint_main_E142_steps5", "joint_main", 142, 5, None),
    ]
    for label, path, epochs, steps, c in plan:
        log(f"[matrix] {label} ...")
        t0 = time.time()
        r = run_child(path, args.backend, c, epochs, steps, 30)
        if r:
            r["label"] = label
            r["wall_s"] = round(time.time() - t0, 1)
            results.append(r)
            log(f"[matrix] {label}: lower {r['lower_s']}s, "
                f"compile {r['compile_s']}s (wall {r['wall_s']}s)")
    ncache = len(list(Path(cache).iterdir())) if Path(cache).exists() else 0
    print(json.dumps({"backend": args.backend, "cache_dir": cache,
                      "cache_entries": ncache, "results": results}))


if __name__ == "__main__":
    main()
