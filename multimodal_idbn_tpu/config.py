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

_FLAGS = {"pallas_chain": False}


def enable_pallas_chain(enabled: bool = True) -> None:
    """Route mean-field conditional inference (``RBM.conditional_gibbs``
    with sample_h=sample_v=False, and ``RBM.noisy_meanfield_annealed``)
    through the Pallas VMEM-chain kernels when the shape fits VMEM and the
    backend is a TPU (``ops.pallas_chain.chain_kernel_supported``);
    everything else falls back to the jnp path."""
    _FLAGS["pallas_chain"] = bool(enabled)


def pallas_chain_enabled() -> bool:
    return _FLAGS["pallas_chain"]
