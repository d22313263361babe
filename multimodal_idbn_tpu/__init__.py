"""multimodal_idbn_tpu — TPU-native multimodal iDBN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`francesco-cal98/multimodal-idbn` reference (PyTorch, single device):
Restricted Boltzmann Machines with softmax groups, iterative Deep Belief
Networks, and multimodal joint DBNs with cross-modal inference — built
TPU-first:

- all training/inference math is pure jitted functions over pytrees
  (`multimodal_idbn_tpu.ops`),
- Gibbs / mean-field chains run on-device via ``lax.scan``/``fori_loop``
  (the reference runs them as per-step Python loops, rbm.py:275-297),
- randomness is counter-based threefry keyed on logical coordinates so
  runs reproduce across chip counts,
- the batch axis shards over a 1-D ``jax.sharding.Mesh`` with XLA
  collectives for the CD statistics (`multimodal_idbn_tpu.parallel`),
- the hot fused half-step (GEMM + bias + temperature + noise + sigmoid +
  Bernoulli) has a Pallas TPU kernel (`multimodal_idbn_tpu.ops.pallas_kernels`).

A thin object shell (`multimodal_idbn_tpu.models`) mirrors the reference's
public API surface (``RBM``, ``iDBN``, ``iMDBN``, ``iMDBN_BiModal`` with the
same method and attribute names) because downstream adapters poke those
attributes (reference INTEGRATION_PROMPT.md:90-247).
"""

__version__ = "0.1.0"

__all__ = ["RBM", "iDBN", "iMDBN", "iMDBN_BiModal", "set_global_seed",
           "__version__"]

_MODEL_EXPORTS = {"RBM", "iDBN", "iMDBN", "iMDBN_BiModal", "set_global_seed"}


def __getattr__(name):
    # Lazy so that `multimodal_idbn_tpu.ops` imports without pulling in the
    # model shells (keeps the functional core dependency-light).
    if name in _MODEL_EXPORTS:
        import multimodal_idbn_tpu.models as _models
        return getattr(_models, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
