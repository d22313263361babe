"""2-D (data × model) mesh training: batch sharding + hidden-dim tensor
parallelism for the wide RBM layers.

The reference is strictly single-device (SURVEY.md §2 rows 20-21), so
this module has no reference counterpart; it is the TPU-native scaling
story beyond pure DP (`parallel/data_parallel.py`). Layout follows the
standard megatron-style column split, expressed purely through
``jax.sharding`` — XLA's SPMD partitioner inserts every collective:

- ``W [V, H]`` and ``hb [H]`` (and their momentum buffers) are sharded
  along the hidden axis over the ``model`` mesh axis; ``vb [V]`` is
  replicated.
- the batch axis of activations is sharded over ``data``.
- ``p(h|v) = σ(vW + hb)``: a local matmul per model shard — activations
  come out sharded ``("data", "model")`` with **no** collective.
- ``p(v|h) = σ(hWᵀ + vb)``: contraction over the sharded hidden axis →
  one ``psum`` over ``model`` (ICI all-reduce), exactly the Megatron
  row-parallel backward.
- CD statistics (``dataᵀ@pos_h``, bias sums) contract over the sharded
  batch axis → ``psum`` over ``data``; the resulting ``dW [V, H]`` is
  already sharded like ``W``, so the momentum/weight update is local.

Randomness: counter-based partitionable threefry (pinned in
``data_parallel``) means every Bernoulli/Gumbel draw is a function of the
logical element index, so a (dp × mp) run draws the same random numbers
as a single device and results agree to reduction order (~1 ulp) — the
device-count-invariance contract tested in tests/test_parallel.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_idbn_tpu.ops import rbm_ops
from multimodal_idbn_tpu.parallel import data_parallel as _dp  # noqa: F401
# (importing data_parallel pins jax_threefry_partitionable)

Array = jax.Array

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh_2d(dp: Optional[int] = None, mp: int = 2,
                 devices=None) -> Mesh:
    """A ``(dp, mp)`` mesh with axes ``("data", "model")``.

    Defaults: use all devices, ``mp=2``, ``dp = n_devices // mp``. On a
    real slice, lay ``model`` on the innermost (fastest-ICI) axis by
    passing an explicitly ordered ``devices`` array.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        if n % mp:
            raise ValueError(f"{n} devices not divisible by mp={mp}")
        dp = n // mp
    if dp * mp > n:
        raise ValueError(f"requested dp*mp={dp * mp} devices, have {n}")
    grid = np.array(devices[:dp * mp]).reshape(dp, mp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def state_pspecs() -> rbm_ops.RBMState:
    """PartitionSpecs for an RBMState under hidden-dim model parallelism."""
    return rbm_ops.RBMState(
        w=P(None, MODEL_AXIS), hb=P(MODEL_AXIS), vb=P(),
        w_m=P(None, MODEL_AXIS), hb_m=P(MODEL_AXIS), vb_m=P())


def shard_state(mesh: Mesh, state: rbm_ops.RBMState) -> rbm_ops.RBMState:
    """Place an RBMState with W/hb (+ momenta) sharded over ``model``."""
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        state, state_pspecs())


def shard_batch_2d(mesh: Mesh, *arrays, dtype=jnp.float32, trim: bool = False):
    """Shard axis 0 over the ``data`` axis; feature axes replicated."""
    dp = mesh.shape[DATA_AXIS]
    sh = NamedSharding(mesh, P(DATA_AXIS, None))
    out = []
    for a in arrays:
        a = jnp.asarray(a, dtype)
        if a.shape[0] % dp:
            if not trim:
                raise ValueError(
                    f"batch axis ({a.shape[0]}) must divide dp={dp}; "
                    f"pass trim=True or pad")
            a = a[:(a.shape[0] // dp) * dp]
        out.append(jax.device_put(a, sh))
    return out[0] if len(out) == 1 else tuple(out)


_cd_update_jit = jax.jit(rbm_ops.cd_update,
                         static_argnames=("cd", "sparsity", "groups"))


def tp_cd_update(mesh: Mesh, state: rbm_ops.RBMState, key: Array, data, *,
                 lr, mom, weight_decay, cd: int, sparsity: bool = False,
                 sparsity_factor: float = 0.05, groups=()):
    """CD-k update with the batch sharded over ``data`` and the layer
    sharded over ``model``. Same jitted computation as the single-chip
    ``rbm_ops.cd_update``; GSPMD partitions it according to the input
    placements (module docstring has the collective-by-collective map).
    Returns (new sharded state, loss)."""
    data = shard_batch_2d(mesh, data)
    state = shard_state(mesh, state)
    return _cd_update_jit(state, key, data, lr=lr, mom=mom,
                          weight_decay=weight_decay, cd=cd,
                          sparsity=sparsity,
                          sparsity_factor=sparsity_factor, groups=groups)


def tp_idbn_epoch(mesh: Mesh, states: Sequence[rbm_ops.RBMState], key: Array,
                  data, lr, mom, weight_decay, sparsity_factor, *, cd: int,
                  sparsity_flags, batch_size: int, shuffle: bool = False
                  ) -> Tuple[tuple, Array]:
    """Fused iDBN epoch (one dispatch) on the 2-D mesh: dataset sharded
    over ``data``, every layer's parameters sharded over ``model``.

    Bit-compatible with the single-device fused epoch (same
    per-(batch, layer) key derivation as ``dbn_train.idbn_epoch``'s loop,
    the shared key-derivation source of truth) up to reduction order —
    including when ``N % dp != 0``: like
    ``data_parallel._shard_or_replicate``, an uneven batch axis is
    replicated rather than trimmed, preserving N (and so the permutation
    length and batch count) at the cost of dp× dataset HBM.
    """
    dp = mesh.shape[DATA_AXIS]
    n = data.shape[0] if hasattr(data, "shape") else len(data)
    if n % dp == 0:
        data = shard_batch_2d(mesh, data)
    else:
        data = jax.device_put(jnp.asarray(data, jnp.float32),
                              NamedSharding(mesh, P()))
    states = tuple(shard_state(mesh, st) for st in states)
    return _tp_idbn_epoch_jit(states, key, data, lr, mom, weight_decay,
                              sparsity_factor, cd=cd,
                              sparsity_flags=tuple(sparsity_flags),
                              batch_size=batch_size, shuffle=shuffle,
                              mesh=mesh)


@partial(jax.jit, static_argnames=("cd", "sparsity_flags", "batch_size",
                                   "shuffle", "mesh"))
def _tp_idbn_epoch_jit(states, key, data, lr, mom, weight_decay,
                       sparsity_factor, *, cd, sparsity_flags, batch_size,
                       shuffle, mesh):
    n = data.shape[0]
    nb = n // batch_size
    if nb == 0:
        return states, jnp.zeros((0, len(states)), jnp.float32)
    kperm, kscan = jax.random.split(key)
    if shuffle:
        order = jax.random.permutation(kperm, n)
        batches = data[order[:nb * batch_size]].reshape(
            nb, batch_size, data.shape[1])
    else:
        batches = data[:nb * batch_size].reshape(nb, batch_size,
                                                 data.shape[1])
    batches = jax.lax.with_sharding_constraint(
        batches, NamedSharding(mesh, P(None, DATA_AXIS, None)))
    step_keys = jax.random.split(kscan, nb)
    state_shardings = tuple(
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                               state_pspecs())
        for _ in states)

    def body(states, xs):
        batch, bkey = xs
        v = batch
        new_states, losses = [], []
        for i, st in enumerate(states):
            st, loss = rbm_ops.cd_update(
                st, jax.random.fold_in(bkey, i), v, lr=lr, mom=mom,
                weight_decay=weight_decay, cd=cd,
                sparsity=sparsity_flags[i],
                sparsity_factor=sparsity_factor, groups=())
            # pin the carry layout so every scan step keeps the
            # megatron split (stops GSPMD from re-gathering mid-scan)
            st = jax.lax.with_sharding_constraint(st, state_shardings[i])
            v = rbm_ops.hidden_probs(st, v)
            new_states.append(st)
            losses.append(loss)
        return tuple(new_states), jnp.stack(losses)

    return jax.lax.scan(body, states, (batches, step_keys))


def gather_state(state: rbm_ops.RBMState) -> rbm_ops.RBMState:
    """Fetch a (possibly sharded) state fully replicated on the host."""
    return jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)),
                                  state)
