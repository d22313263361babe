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


def dp_idbn_epoch(mesh: Mesh, states, key: Array, data, lr, mom,
                  weight_decay, sparsity_factor, *, cd: int,
                  sparsity_flags, batch_size: int, shuffle: bool = False):
    """Data-parallel fused iDBN epoch.

    The dataset lives sharded in HBM across the mesh; each scan step's
    [B, V] batch keeps its batch dim sharded (explicit
    ``with_sharding_constraint`` so the gather/reshape doesn't re-layout),
    and the per-layer CD statistics all-reduce over ICI.
    """
    axis = mesh.axis_names[0]
    # The fused epoch drops the remainder beyond nb*batch_size, so
    # trimming to a device-divisible length preserves semantics.
    data = shard_batch(mesh, data, dtype=jnp.float32, trim=True)
    states = replicate(mesh, states)
    return _dp_idbn_epoch_jit(states, key, data, lr, mom, weight_decay,
                              sparsity_factor, cd=cd,
                              sparsity_flags=tuple(sparsity_flags),
                              batch_size=batch_size, shuffle=shuffle,
                              mesh=mesh, axis=axis)


def dp_joint_epoch(mesh: Mesh, joint, idbn_states, key, Z, Y, IMG, lr, mom,
                   weight_decay, z_class_mean, **static):
    """Data-parallel fused joint-training epoch: latents/labels/images
    sharded over the batch axis, joint + iDBN parameters replicated.
    Accepts the same static kwargs as ``imdbn_ops.joint_epoch``."""
    from multimodal_idbn_tpu.ops import imdbn_ops

    axis = mesh.axis_names[0]
    # joint_epoch drops samples beyond nb*batch_size itself, so trimming
    # to a device-divisible length preserves semantics.
    Z, Y, IMG = shard_batch(mesh, Z, Y, IMG, dtype=jnp.float32, trim=True)
    joint = replicate(mesh, joint)
    idbn_states = replicate(mesh, idbn_states)
    if z_class_mean is not None:
        z_class_mean = jax.device_put(jnp.asarray(z_class_mean),
                                      replicated(mesh))
    return imdbn_ops.joint_epoch(joint, idbn_states, key, Z, Y, IMG, lr,
                                 mom, weight_decay, z_class_mean,
                                 mesh=mesh, shard_axis=axis, **static)


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("cd", "sparsity_flags", "batch_size",
                                   "shuffle", "mesh", "axis"))
def _dp_idbn_epoch_jit(states, key, data, lr, mom, weight_decay,
                       sparsity_factor, *, cd, sparsity_flags, batch_size,
                       shuffle, mesh, axis):
    n = data.shape[0]
    nb = n // batch_size
    if nb == 0:  # dataset smaller than one batch
        return states, jnp.zeros((0, len(states)), jnp.float32)
    kperm, kscan = jax.random.split(key)
    if shuffle:
        order = jax.random.permutation(kperm, n)
        batches = data[order[:nb * batch_size]].reshape(
            nb, batch_size, data.shape[1])
    else:
        batches = data[:nb * batch_size].reshape(nb, batch_size,
                                                 data.shape[1])
    # Keep the per-step batch axis sharded over the mesh.
    batches = jax.lax.with_sharding_constraint(
        batches, NamedSharding(mesh, P(None, axis, None)))
    step_keys = jax.random.split(kscan, nb)

    def body(states, xs):
        batch, bkey = xs
        v = batch
        new_states = []
        losses = []
        for i, st in enumerate(states):
            st, loss = rbm_ops.cd_update(
                st, jax.random.fold_in(bkey, i), v, lr=lr, mom=mom,
                weight_decay=weight_decay, cd=cd,
                sparsity=sparsity_flags[i],
                sparsity_factor=sparsity_factor, groups=())
            v = rbm_ops.hidden_probs(st, v)
            new_states.append(st)
            losses.append(loss)
        return tuple(new_states), jnp.stack(losses)

    states, losses = jax.lax.scan(body, states, (batches, step_keys))
    return states, losses
