"""Data-parallel RBM/DBN training over a 1-D device mesh.

Design (SURVEY.md §5.8): parameters are replicated, the batch axis is
sharded over the ``data`` mesh axis, and every batch-contraction in the CD
update (``dataᵀ @ pos_h``, ``vᵀ @ h_prob``, bias sums — reference
rbm.py:200,:209,:216,:223) reduces over the sharded axis, so XLA's SPMD
partitioner emits exactly the all-reduce a hand-written DP gradient sync
would — over ICI, no custom comm layer.

Randomness: ``jax_threefry_partitionable`` (enabled at import) makes every
``jax.random`` draw a pure function of (key, logical index), so a run on N
chips draws the same random numbers as on 1 chip; results agree to
floating-point reduction order — the reproducibility north star
(BASELINE.json).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_idbn_tpu.ops import rbm_ops

# Counter-based PRNG must assign per-element streams so results are
# invariant to device count (SURVEY.md §5.8). Default in new JAX, pinned
# here explicitly because it is a correctness contract of this module.
jax.config.update("jax_threefry_partitionable", True)

Array = jax.Array

# Jitted CD update used by the DP path. Jitted here (not borrowed from the
# models/ shells) so the dependency direction stays ops ← parallel.
_cd_update_jit = jax.jit(rbm_ops.cd_update,
                         static_argnames=("cd", "sparsity", "groups"))


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all).

    ICI-only for single-slice TPUs; the model sizes here (largest tensor
    10000×1500 fp32 ≈ 60 MB) never need DCN (SURVEY.md §5.8).
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have "
                             f"{len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def resolve_mesh(spec) -> Optional[Mesh]:
    """Normalize a user-facing mesh spec into a ``Mesh`` (or ``None``).

    Accepts: ``None`` (no DP), a ``Mesh`` (used as-is), an int device
    count, or ``"all"`` (every visible device). This is what the model
    shells' ``set_mesh`` / ``params["DP_DEVICES"]`` accept.
    """
    if spec is None:
        return None
    if isinstance(spec, Mesh):
        return spec
    if isinstance(spec, str):
        if spec.lower() == "all":
            return make_mesh()
        spec = int(spec)
    return make_mesh(int(spec))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard axis 0 (batch) over the mesh; other axes replicated."""
    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """Pad axis 0 up to a multiple (repeating the last row); returns
    (padded, original_n). Needed because sharded batch axes must divide
    evenly across devices."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = np.repeat(x[-1:], rem, axis=0)
    return np.concatenate([x, pad], axis=0), n


def shard_batch(mesh: Mesh, *arrays, dtype=None, trim: bool = False):
    """Place arrays with the batch axis sharded over the mesh.

    ``device_put`` of a NamedSharding requires the batch axis to divide
    evenly across the mesh. With ``trim=True`` the arrays are truncated to
    the largest divisible length (the fused epoch paths drop the remainder
    anyway); otherwise a clear error names the fix.
    """
    n_dev = int(np.prod(mesh.devices.shape))
    out = []
    for a in arrays:
        a = jnp.asarray(a, dtype) if dtype is not None else jnp.asarray(a)
        n = a.shape[0]
        if n % n_dev:
            if trim:
                a = a[:(n // n_dev) * n_dev]
            else:
                raise ValueError(
                    f"batch axis ({n}) must divide evenly across "
                    f"{n_dev} devices; use pad_to_multiple() or "
                    f"shard_batch(trim=True)")
        out.append(jax.device_put(a, batch_sharding(mesh, a.ndim)))
    return out[0] if len(out) == 1 else tuple(out)


def replicate(mesh: Mesh, tree):
    """Replicate a parameter pytree across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def dp_cd_update(mesh: Mesh, state: rbm_ops.RBMState, key: Array,
                 data, *, lr, mom, weight_decay, cd: int,
                 sparsity: bool = False, sparsity_factor: float = 0.05,
                 groups=()):
    """Data-parallel CD-k update: batch sharded over the mesh, parameters
    replicated. Returns (new replicated state, loss).

    The exact same jitted computation as the single-chip
    ``rbm_ops.cd_update`` — GSPMD partitions it; the batch contractions
    become local matmuls + ICI all-reduce.
    """
    data = shard_batch(mesh, data, dtype=jnp.float32)
    state = replicate(mesh, state)
    return _cd_update_jit(state, key, data, lr=lr, mom=mom,
                          weight_decay=weight_decay, cd=cd,
                          sparsity=sparsity,
                          sparsity_factor=sparsity_factor, groups=groups)


def _shard_or_replicate(mesh: Mesh, data):
    """Place the dataset with its batch axis sharded over the mesh while
    PRESERVING N (trimming would silently change the batch/remainder
    split vs the single-device path). When N does not divide across the
    mesh the array is replicated instead — correct but n_dev× the HBM
    footprint; XLA normalizes uneven shardings to replicated on this
    backend, so there is no layout that both preserves N and shards.
    The per-step ``with_sharding_constraint`` inside the fused epochs
    still distributes the compute. In practice the shells pre-slice to
    ``nb*batch_size`` with device-divisible batch sizes, so the sharded
    branch is the one that runs."""
    n_dev = int(np.prod(mesh.devices.shape))
    data = jnp.asarray(data, jnp.float32)
    if data.shape[0] % n_dev == 0:
        return jax.device_put(data, batch_sharding(mesh, data.ndim))
    return jax.device_put(data, replicated(mesh))


def dp_idbn_epoch(mesh: Mesh, states, key: Array, data, lr, mom,
                  weight_decay, sparsity_factor, *, cd: int,
                  sparsity_flags, batch_size: int, shuffle: bool = False,
                  sr=None):
    """Data-parallel fused iDBN epoch.

    The dataset lives sharded in HBM across the mesh; each scan step's
    [B, V] batch keeps its batch dim sharded (explicit
    ``with_sharding_constraint`` so the gather/reshape doesn't re-layout),
    and the per-layer CD statistics all-reduce over ICI. Delegates to the
    SAME jitted computation as the single-chip ``dbn_train.idbn_epoch``
    (with the mesh statics set), so key derivation matches by
    construction.
    """
    from multimodal_idbn_tpu.ops import dbn_train

    axis = mesh.axis_names[0]
    data = _shard_or_replicate(mesh, data)
    states = replicate(mesh, states)
    return dbn_train.idbn_epoch(states, key, data, lr, mom, weight_decay,
                                sparsity_factor, cd=cd,
                                sparsity_flags=tuple(sparsity_flags),
                                batch_size=batch_size, shuffle=shuffle,
                                mesh=mesh, shard_axis=axis, sr=sr)


def dp_idbn_epoch_block(mesh: Mesh, states, epoch_key: Array, data,
                        epoch_idx, lr_arr, mom_arr, weight_decay,
                        sparsity_factor, *, cd: int, sparsity_flags,
                        batch_size: int, n_epochs: int, sr=None):
    """Data-parallel epoch-blocked training: ``n_epochs`` full epochs in
    ONE dispatch with the batch axis sharded over the mesh
    (``dbn_train.idbn_epoch_block`` with the mesh statics set — identical
    key derivation to blocked single-chip and per-epoch DP paths)."""
    from multimodal_idbn_tpu.ops import dbn_train

    axis = mesh.axis_names[0]
    data = _shard_or_replicate(mesh, data)
    states = replicate(mesh, states)
    return dbn_train.idbn_epoch_block(
        states, epoch_key, data, epoch_idx, lr_arr, mom_arr,
        weight_decay, sparsity_factor, cd=cd,
        sparsity_flags=tuple(sparsity_flags), batch_size=batch_size,
        n_epochs=n_epochs, mesh=mesh, shard_axis=axis, sr=sr)


def dp_joint_epoch(mesh: Mesh, joint, idbn_states, key, Z, Y, IMG, lr, mom,
                   weight_decay, z_class_mean, **static):
    """Data-parallel fused joint-training epoch: latents/labels/images
    sharded over the batch axis, joint + iDBN parameters replicated.
    Accepts the same static kwargs as ``imdbn_ops.joint_epoch``."""
    from multimodal_idbn_tpu.ops import imdbn_ops

    axis = mesh.axis_names[0]
    Z = _shard_or_replicate(mesh, Z)
    Y = _shard_or_replicate(mesh, Y)
    IMG = _shard_or_replicate(mesh, IMG)
    joint = replicate(mesh, joint)
    idbn_states = replicate(mesh, idbn_states)
    if z_class_mean is not None:
        z_class_mean = jax.device_put(jnp.asarray(z_class_mean),
                                      replicated(mesh))
    return imdbn_ops.joint_epoch(joint, idbn_states, key, Z, Y, IMG, lr,
                                 mom, weight_decay, z_class_mean,
                                 mesh=mesh, shard_axis=axis, **static)


def dp_joint_epoch_block(mesh: Mesh, joint, idbn_states, epoch_key, Z, Y,
                         IMG, epoch_idx, lr_arr, mom_arr, weight_decay,
                         z_class_mean, **static):
    """Data-parallel epoch-blocked joint training: ``n_epochs`` joint
    epochs in ONE dispatch with the batch axis sharded over the mesh
    (``imdbn_ops.joint_epoch_block`` with the mesh statics — identical
    key derivation to blocked single-chip / per-epoch DP paths)."""
    from multimodal_idbn_tpu.ops import imdbn_ops

    axis = mesh.axis_names[0]
    Z = _shard_or_replicate(mesh, Z)
    Y = _shard_or_replicate(mesh, Y)
    IMG = _shard_or_replicate(mesh, IMG)
    joint = replicate(mesh, joint)
    idbn_states = replicate(mesh, idbn_states)
    if z_class_mean is not None:
        z_class_mean = jax.device_put(jnp.asarray(z_class_mean),
                                      replicated(mesh))
    return imdbn_ops.joint_epoch_block(
        joint, idbn_states, epoch_key, Z, Y, IMG, epoch_idx, lr_arr,
        mom_arr, weight_decay, z_class_mean, mesh=mesh, shard_axis=axis,
        **static)


def dp_bimodal_joint_epoch(mesh: Mesh, joint, mod1_states, mod2_states,
                           key, Z1, Z2, V1, V2, lr, mom, weight_decay,
                           **static):
    """Data-parallel fused bimodal joint epoch: latents + raw modalities
    batch-sharded, joint/mod DBN parameters replicated
    (``bimodal_ops.bimodal_joint_epoch`` with the mesh statics)."""
    from multimodal_idbn_tpu.ops import bimodal_ops

    axis = mesh.axis_names[0]
    Z1, Z2, V1, V2 = (_shard_or_replicate(mesh, a)
                      for a in (Z1, Z2, V1, V2))
    joint = replicate(mesh, joint)
    mod1_states = replicate(mesh, mod1_states)
    mod2_states = replicate(mesh, mod2_states)
    return bimodal_ops.bimodal_joint_epoch(
        joint, mod1_states, mod2_states, key, Z1, Z2, V1, V2, lr, mom,
        weight_decay, mesh=mesh, shard_axis=axis, **static)


def dp_bimodal_epoch_block(mesh: Mesh, joint, mod1_states, mod2_states,
                           epoch_key, Z1, Z2, V1, V2, epoch_idx, lr_arr,
                           mom_arr, weight_decay, **static):
    """Data-parallel epoch-blocked bimodal joint training
    (``bimodal_ops.bimodal_epoch_block`` with the mesh statics)."""
    from multimodal_idbn_tpu.ops import bimodal_ops

    axis = mesh.axis_names[0]
    Z1, Z2, V1, V2 = (_shard_or_replicate(mesh, a)
                      for a in (Z1, Z2, V1, V2))
    joint = replicate(mesh, joint)
    mod1_states = replicate(mesh, mod1_states)
    mod2_states = replicate(mesh, mod2_states)
    return bimodal_ops.bimodal_epoch_block(
        joint, mod1_states, mod2_states, epoch_key, Z1, Z2, V1, V2,
        epoch_idx, lr_arr, mom_arr, weight_decay, mesh=mesh,
        shard_axis=axis, **static)


