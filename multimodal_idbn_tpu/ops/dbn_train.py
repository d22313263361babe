"""Fused on-device DBN training: whole epochs as single XLA computations.

The reference trains with a per-batch Python loop — every batch does a
host→device copy and L sequential kernel launches (reference
idbn.py:199-204). Here the dataset lives in HBM and an entire epoch runs
as ONE jitted ``lax.scan`` over batches, with the per-batch all-layers
"iterative" update (every layer updated on every batch, layer i+1 fed the
post-update activations of layer i — the "i" in iDBN, SURVEY.md §2.1(8))
unrolled inside the scan body. One dispatch per epoch instead of
``batches × layers`` dispatches.

Shuffling happens on-device too (``jax.random.permutation`` + gather), so
the only host↔device traffic per epoch is the scalar schedule values and
the returned losses.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from multimodal_idbn_tpu.ops import rbm_ops

Array = jax.Array
States = Tuple[rbm_ops.RBMState, ...]


def _layer_update(st, key, v, *, lr, mom, weight_decay, cd, sparsity,
                  sparsity_factor, compute_dtype, fast_sampler,
                  sr=None):
    """One groupless CD update: the exact jnp path, or the opt-in Pallas
    sampled-CD path (``ops/pallas_cd.py`` — fused GEMM+sigmoid+sample
    with on-core PRNG; different random stream, reference update order).
    ``fast_sampler`` is static so the jnp path stays untouched when off.
    ``sr`` (static) overrides the stochastic-rounding auto rule of
    ``rbm_ops.cd_update`` (the Pallas path has no SR epilogue and is
    already disabled for bf16 storage at the model layer).
    """
    if fast_sampler:
        from multimodal_idbn_tpu.ops import pallas_cd
        return pallas_cd.fast_sampled_cd_update(
            st, key, v, lr=lr, mom=mom, weight_decay=weight_decay, cd=cd,
            sparsity=sparsity, sparsity_factor=sparsity_factor)
    return rbm_ops.cd_update(
        st, key, v, lr=lr, mom=mom, weight_decay=weight_decay, cd=cd,
        sparsity=sparsity, sparsity_factor=sparsity_factor, groups=(),
        compute_dtype=compute_dtype, sr=sr)


def _constrain_batches(batches, mesh, shard_axis):
    """Pin the per-step batch axis of [nb, bs, V] sharded over the mesh
    (no-op without a mesh)."""
    if mesh is None or shard_axis is None:
        return batches
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.lax.with_sharding_constraint(
        batches, NamedSharding(mesh, P(None, shard_axis, None)))


@partial(jax.jit, static_argnames=("cd", "sparsity_flags", "batch_size",
                                   "shuffle", "compute_dtype",
                                   "fast_sampler", "mesh", "shard_axis",
                                   "sr"))
def idbn_epoch(states: States, key: Array, data: Array, lr, mom,
               weight_decay, sparsity_factor, *, cd: int,
               sparsity_flags: Tuple[bool, ...], batch_size: int,
               shuffle: bool = False, compute_dtype=None,
               fast_sampler: bool = False, mesh=None, shard_axis=None,
               sr=None):
    """One full iDBN epoch on-device.

    Args:
        states: per-layer RBMState tuple (widths differ per layer).
        data: [N, V] training data resident in HBM.
        lr, mom: traced scalars (epoch schedule computed host-side so one
            compile serves all epochs, reference rbm.py:194-195).
        cd / sparsity_flags / batch_size: static.

    Returns (new_states, losses[nb, L]) with the same per-(batch, layer)
    loss layout the reference averages for its ``idbn/loss`` metric
    (idbn.py:204-208). Batches beyond ``nb*batch_size`` are left to the
    caller (reference DataLoaders don't drop the remainder).

    ``shuffle`` defaults to False: callers should permute the dataset
    BEFORE the epoch so the remainder is exactly the unselected tail
    (with the internal shuffle, the fixed tail would be over/under-
    sampled — each sample must train exactly once per epoch).

    With ``mesh``/``shard_axis`` set (data parallelism, see
    ``parallel.dp_idbn_epoch``), each scan step's batch axis is pinned
    sharded over the mesh; GSPMD turns the CD batch-contractions into
    local matmuls + ICI all-reduce.
    """
    n = data.shape[0]
    nb = n // batch_size
    if nb == 0:  # dataset smaller than one batch: caller's remainder
        return states, jnp.zeros((0, len(states)), jnp.float32)
    # Run the whole epoch in the compute dtype: the state storage dtype,
    # or the mixed-precision override (f32 master weights, bf16 chain —
    # rbm_ops.compute_cast). bf16 anywhere halves the HBM traffic the
    # epoch is bound on.
    data = data.astype(compute_dtype or states[0].w.dtype)
    kperm, kscan = jax.random.split(key)
    if shuffle:
        order = jax.random.permutation(kperm, n)
        batches = data[order[:nb * batch_size]].reshape(
            nb, batch_size, data.shape[1])
    else:  # static slice: no gather, no index buffer
        batches = data[:nb * batch_size].reshape(nb, batch_size,
                                                 data.shape[1])
    batches = _constrain_batches(batches, mesh, shard_axis)
    step_keys = jax.random.split(kscan, nb)

    def body(states, xs):
        batch, bkey = xs
        v = batch
        new_states = []
        losses = []
        for i, st in enumerate(states):
            st, loss = _layer_update(
                st, jax.random.fold_in(bkey, i), v, lr=lr, mom=mom,
                weight_decay=weight_decay, cd=cd,
                sparsity=sparsity_flags[i],
                sparsity_factor=sparsity_factor,
                compute_dtype=compute_dtype, fast_sampler=fast_sampler,
                sr=sr)
            # post-update activations feed the next layer (same compute
            # dtype so the whole chain streams bf16 under mixed precision)
            v = rbm_ops.hidden_probs(
                rbm_ops.compute_cast(st, compute_dtype), v)
            new_states.append(st)
            losses.append(loss)
        return tuple(new_states), jnp.stack(losses)

    states, losses = jax.lax.scan(body, states, (batches, step_keys))
    return states, losses


@partial(jax.jit, static_argnames=("cd", "sparsity_flags", "batch_size",
                                   "n_epochs", "compute_dtype",
                                   "fast_sampler", "mesh", "shard_axis",
                                   "sr"))
def idbn_epoch_block(states: States, epoch_key: Array, data: Array,
                     epoch_idx: Array, lr_arr: Array, mom_arr: Array,
                     weight_decay, sparsity_factor, *, cd: int,
                     sparsity_flags: Tuple[bool, ...], batch_size: int,
                     n_epochs: int, compute_dtype=None,
                     fast_sampler: bool = False, mesh=None,
                     shard_axis=None, sr=None):
    """Run ``n_epochs`` full epochs in ONE dispatch (nested scan).

    Each epoch permutes the dataset on-device (exactly-once semantics,
    remainder included) with the SAME key derivation as the per-epoch
    path — ``fold_in(epoch_key, epoch_idx)`` — so blocked and unblocked
    training produce identical results. The win is dispatch amortization:
    through high-latency links (the axon tunnel costs ~0.2-0.3 s per
    call) a 100-epoch run becomes a handful of dispatches.

    Returns (states, loss_sum[E], loss_count[E]) so the caller can
    average per-(batch, layer) entries like the reference.
    """
    n = data.shape[0]
    nb = n // batch_size
    rem = n - nb * batch_size
    L = len(states)
    data = data.astype(compute_dtype or states[0].w.dtype)

    def epoch_body(states, xs):
        e_idx, lr, mom = xs
        key = jax.random.fold_in(epoch_key, e_idx)
        perm = jax.random.permutation(jax.random.fold_in(key, 0), n)
        data_p = data[perm]
        kscan = jax.random.split(key)[1]
        step_keys = jax.random.split(kscan, max(1, nb))

        def body(states, bxs):
            batch, bkey = bxs
            v = batch
            new_states = []
            losses = []
            for i, st in enumerate(states):
                st, loss = _layer_update(
                    st, jax.random.fold_in(bkey, i), v, lr=lr, mom=mom,
                    weight_decay=weight_decay, cd=cd,
                    sparsity=sparsity_flags[i],
                    sparsity_factor=sparsity_factor,
                    compute_dtype=compute_dtype,
                    fast_sampler=fast_sampler, sr=sr)
                v = rbm_ops.hidden_probs(
                    rbm_ops.compute_cast(st, compute_dtype), v)
                new_states.append(st)
                losses.append(loss)
            return tuple(new_states), jnp.stack(losses)

        loss_sum = jnp.zeros((), jnp.float32)
        count = jnp.zeros((), jnp.float32)
        if nb > 0:
            batches = _constrain_batches(
                data_p[:nb * batch_size].reshape(nb, batch_size,
                                                 data.shape[1]),
                mesh, shard_axis)
            states, losses = jax.lax.scan(body, states,
                                          (batches, step_keys))
            loss_sum = losses.sum()
            count = jnp.asarray(nb * L, jnp.float32)
        if rem:
            rkey = jax.random.fold_in(key, 987)
            v = data_p[nb * batch_size:]
            new_states = []
            for i, st in enumerate(states):
                st, loss = rbm_ops.cd_update(
                    st, jax.random.fold_in(rkey, i), v, lr=lr, mom=mom,
                    weight_decay=weight_decay, cd=cd,
                    sparsity=sparsity_flags[i],
                    sparsity_factor=sparsity_factor, groups=(),
                    compute_dtype=compute_dtype, sr=sr)
                v = rbm_ops.hidden_probs(
                    rbm_ops.compute_cast(st, compute_dtype), v)
                new_states.append(st)
                loss_sum = loss_sum + loss
                count = count + 1.0
            states = tuple(new_states)
        return states, (loss_sum, count)

    states, (sums, counts) = jax.lax.scan(
        epoch_body, states, (epoch_idx, lr_arr, mom_arr))
    return states, sums, counts


@partial(jax.jit, static_argnames=("cd", "sparsity_flags", "batch_size",
                                   "shuffle", "compute_dtype", "sr"))
def idbn_epoch_pcd(states: States, chains: Tuple[Array, ...], key: Array,
                   data: Array, lr, mom, weight_decay, sparsity_factor, *,
                   cd: int, sparsity_flags: Tuple[bool, ...],
                   batch_size: int, shuffle: bool = False,
                   compute_dtype=None, sr=None):
    """Persistent-CD fused epoch: like ``idbn_epoch`` but each layer
    carries fantasy particles (``rbm_ops.pcd_update``) through the scan.
    Returns (states, chains, losses[nb, L]). Framework extension — the
    reference has no PCD trainer."""
    n = data.shape[0]
    nb = n // batch_size
    if nb == 0:
        return states, chains, jnp.zeros((0, len(states)), jnp.float32)
    data = data.astype(compute_dtype or states[0].w.dtype)
    kperm, kscan = jax.random.split(key)
    if shuffle:
        order = jax.random.permutation(kperm, n)
        batches = data[order[:nb * batch_size]].reshape(
            nb, batch_size, data.shape[1])
    else:
        batches = data[:nb * batch_size].reshape(nb, batch_size,
                                                 data.shape[1])
    step_keys = jax.random.split(kscan, nb)

    def body(carry, xs):
        states, chains = carry
        batch, bkey = xs
        v = batch
        new_states, new_chains, losses = [], [], []
        for i, (st, ch) in enumerate(zip(states, chains)):
            st, ch, loss = rbm_ops.pcd_update(
                st, ch, jax.random.fold_in(bkey, i), v, lr=lr, mom=mom,
                weight_decay=weight_decay, cd=cd,
                sparsity=sparsity_flags[i],
                sparsity_factor=sparsity_factor, groups=(),
                compute_dtype=compute_dtype, sr=sr)
            v = rbm_ops.hidden_probs(
                rbm_ops.compute_cast(st, compute_dtype), v)
            new_states.append(st)
            new_chains.append(ch)
            losses.append(loss)
        return (tuple(new_states), tuple(new_chains)), jnp.stack(losses)

    (states, chains), losses = jax.lax.scan(
        body, (states, chains), (batches, step_keys))
    return states, chains, losses


@partial(jax.jit, static_argnames=("cd", "sparsity_flags", "batch_size",
                                   "n_epochs", "compute_dtype", "sr"))
def idbn_epoch_block_pcd(states: States, chains: Tuple[Array, ...],
                         epoch_key: Array, data: Array, epoch_idx: Array,
                         lr_arr: Array, mom_arr: Array, weight_decay,
                         sparsity_factor, *, cd: int,
                         sparsity_flags: Tuple[bool, ...], batch_size: int,
                         n_epochs: int, compute_dtype=None, sr=None):
    """``n_epochs`` persistent-CD epochs in one dispatch; the fantasy
    particles persist ACROSS epochs (the point of PCD). Same key
    derivation as ``idbn_epoch_block``; the remainder beyond
    ``nb*batch_size`` is trained with plain CD (chain shapes are pinned
    to ``batch_size``; callers document the fallback)."""
    n = data.shape[0]
    nb = n // batch_size
    rem = n - nb * batch_size
    L = len(states)
    data = data.astype(compute_dtype or states[0].w.dtype)

    def epoch_body(carry, xs):
        states, chains = carry
        e_idx, lr, mom = xs
        key = jax.random.fold_in(epoch_key, e_idx)
        perm = jax.random.permutation(jax.random.fold_in(key, 0), n)
        data_p = data[perm]
        kscan = jax.random.split(key)[1]
        step_keys = jax.random.split(kscan, max(1, nb))

        def body(carry, bxs):
            states, chains = carry
            batch, bkey = bxs
            v = batch
            new_states, new_chains, losses = [], [], []
            for i, (st, ch) in enumerate(zip(states, chains)):
                st, ch, loss = rbm_ops.pcd_update(
                    st, ch, jax.random.fold_in(bkey, i), v, lr=lr,
                    mom=mom, weight_decay=weight_decay, cd=cd,
                    sparsity=sparsity_flags[i],
                    sparsity_factor=sparsity_factor, groups=(),
                    compute_dtype=compute_dtype, sr=sr)
                v = rbm_ops.hidden_probs(
                    rbm_ops.compute_cast(st, compute_dtype), v)
                new_states.append(st)
                new_chains.append(ch)
                losses.append(loss)
            return ((tuple(new_states), tuple(new_chains)),
                    jnp.stack(losses))

        loss_sum = jnp.zeros((), jnp.float32)
        count = jnp.zeros((), jnp.float32)
        if nb > 0:
            batches = data_p[:nb * batch_size].reshape(
                nb, batch_size, data.shape[1])
            (states, chains), losses = jax.lax.scan(
                body, (states, chains), (batches, step_keys))
            loss_sum = losses.sum()
            count = jnp.asarray(nb * L, jnp.float32)
        if rem:
            rkey = jax.random.fold_in(key, 987)
            v = data_p[nb * batch_size:]
            new_states = []
            for i, st in enumerate(states):
                st, loss = rbm_ops.cd_update(
                    st, jax.random.fold_in(rkey, i), v, lr=lr, mom=mom,
                    weight_decay=weight_decay, cd=cd,
                    sparsity=sparsity_flags[i],
                    sparsity_factor=sparsity_factor, groups=(),
                    compute_dtype=compute_dtype, sr=sr)
                v = rbm_ops.hidden_probs(
                    rbm_ops.compute_cast(st, compute_dtype), v)
                new_states.append(st)
                loss_sum = loss_sum + loss
                count = count + 1.0
            states = tuple(new_states)
        return (states, chains), (loss_sum, count)

    (states, chains), (sums, counts) = jax.lax.scan(
        epoch_body, (states, chains), (epoch_idx, lr_arr, mom_arr))
    return states, chains, sums, counts


@partial(jax.jit, static_argnames=("cd", "sparsity_flags",
                                   "compute_dtype", "sr"))
def idbn_batch_step(states: States, key: Array, batch: Array, lr, mom,
                    weight_decay, sparsity_factor, *, cd: int,
                    sparsity_flags: Tuple[bool, ...], compute_dtype=None,
                    sr=None):
    """Per-batch all-layers update (used for the epoch remainder and by
    the reference-style per-batch path)."""
    v = batch.astype(compute_dtype or states[0].w.dtype)
    new_states = []
    losses = []
    for i, st in enumerate(states):
        st, loss = rbm_ops.cd_update(
            st, jax.random.fold_in(key, i), v, lr=lr, mom=mom,
            weight_decay=weight_decay, cd=cd, sparsity=sparsity_flags[i],
            sparsity_factor=sparsity_factor, groups=(),
            compute_dtype=compute_dtype, sr=sr)
        v = rbm_ops.hidden_probs(
            rbm_ops.compute_cast(st, compute_dtype), v)
        new_states.append(st)
        losses.append(loss)
    return tuple(new_states), jnp.stack(losses)


@partial(jax.jit, static_argnames=("upto",))
def dbn_represent(states: States, v: Array, upto: int) -> Array:
    """Mean-field encode through the first ``upto`` layers
    (reference idbn.py:308-323)."""
    for i in range(upto):
        v = rbm_ops.hidden_probs(states[i], v)
    return v


@jax.jit
def dbn_decode(states: States, top: Array) -> Array:
    """Decode from top activations back to input space
    (reference idbn.py:346-359). Image DBNs have no softmax groups."""
    cur = top
    for st in reversed(states):
        cur = rbm_ops.visible_probs(st, cur)
    return cur


@jax.jit
def dbn_decode_sampled(states: States, top: Array, key: Array) -> Array:
    """Ancestral-sampled decode: Bernoulli-sample each intermediate layer
    on the way down, return PROBABILITIES at the bottom (pixel means of
    the sampled configuration). Framework extension — the reference's
    ``decode`` (idbn.py:346-359) is the mean-field special case; sampling
    the descent generates sharp draws from p(v | top) instead of the
    blurred-together mean, which is what class-conditional generation
    needs (benchmarks/RESULTS.md: the L2-optimal mean is information-
    bounded near blank on numerosity)."""
    cur = top
    for i, st in enumerate(reversed(states)):
        cur = rbm_ops.visible_probs(st, cur)
        if i < len(states) - 1:
            from multimodal_idbn_tpu.ops.sampling import sample_bernoulli
            cur = sample_bernoulli(jax.random.fold_in(key, i), cur)
    return cur


@jax.jit
def dbn_reconstruct(states: States, v: Array) -> Array:
    """Encode through all layers then decode back (idbn.py:326-344)."""
    cur = v
    for st in states:
        cur = rbm_ops.hidden_probs(st, cur)
    for st in reversed(states):
        cur = rbm_ops.visible_probs(st, cur)
    return cur
