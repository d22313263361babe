"""Framework-level feature flags.

The Pallas VMEM-chain kernels (`ops/pallas_chain.py`) measured at parity
with XLA's scan on the flagship joint shapes (benchmarks/RESULTS.md), so
the jnp path stays the default. This off-by-default knob keeps them wired
into production (RBM shell conditional-inference methods) rather than as
dead code, for shapes/backends where they win.

Usage:
    from multimodal_idbn_tpu import config
    config.enable_pallas_chain(True)    # or YAML `use_pallas_chain: true`
"""

from __future__ import annotations

_FLAGS = {"pallas_chain": False, "pallas_cd": False}


def enable_pallas_chain(enabled: bool = True) -> None:
    """Route mean-field conditional inference (``RBM.conditional_gibbs``
    with sample_h=sample_v=False, and ``RBM.noisy_meanfield_annealed``)
    through the Pallas VMEM-chain kernels when the shape fits VMEM and the
    backend is a TPU (``ops.pallas_chain.chain_kernel_supported``);
    everything else falls back to the jnp path."""
    _FLAGS["pallas_chain"] = bool(enabled)


def pallas_chain_enabled() -> bool:
    return _FLAGS["pallas_chain"]


def enable_pallas_cd(enabled: bool = True) -> None:
    """Route the image-iDBN CD trainer through the fused Pallas
    sampled-CD path (``ops/pallas_cd.py``: GEMM + sigmoid + Bernoulli in
    one kernel with on-core PRNG). Targets the sampling-bound CD-10
    flagship epoch (benchmarks/RESULTS.md round-2 RNG study). Different
    random stream than threefry (distributionally equal, deterministic
    per key, NOT bitwise oracle-reproducible); needs a TPU backend —
    everywhere else the exact jnp path runs regardless of this flag."""
    _FLAGS["pallas_cd"] = bool(enabled)


def pallas_cd_enabled() -> bool:
    return _FLAGS["pallas_cd"]


def set_matmul_precision(precision: str = "highest") -> None:
    """Pin the XLA default matmul precision for f32 operands.

    TPUs execute f32 matmuls at bfloat16 input precision by default
    ("default"); the torch reference computes true f32 everywhere
    (reference rbm.py:181-227 — plain f32 ``@``). CD training of these
    models is measurably precision-sensitive (benchmarks/RESULTS.md:
    bf16 chain GEMMs collapse flagship top1 to ~0.3), so training entry
    points pin "highest" (6-pass f32 emulation on the MXU) to match the
    reference's numerics. Must run before the first compile.

    precision: "default" | "high" | "highest".
    """
    import jax

    jax.config.update("jax_default_matmul_precision", precision)


def enable_persistent_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``$JAX_COMPILATION_CACHE_DIR`` or ``/tmp/jax_cache``) so fused-epoch
    compiles are paid once per machine instead of once per process.

    Measured on the axon TPU backend (benchmarks/compile_study.py,
    round 3): flagship blocked-epoch compiles drop 5.5 s → 1.3 s (image
    CD-10 block) and 10.9 s → 2.6 s (joint main block) in a second
    process with a warm cache. Called by every CLI/benchmark entry point;
    safe to call repeatedly, must run before the first compile to help.
    """
    import os

    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:  # pragma: no cover - config renamed upstream
        import sys
        # stderr: several callers guarantee JSON-only stdout (bench.py)
        print(f"[config] persistent compilation cache unavailable: {e}",
              file=sys.stderr)
    return path
