"""Functional bimodal joint-DBN training (iMDBN_BiModal core).

Reference semantics (imdbn/models/imdbn_bimodal.py:543-850, SURVEY.md
§2.1(12)): the joint is a *stack* of RBMs with no softmax groups; warmup
epochs alternate mod1/mod2 clamped CD (CD=3, stochastic h, 2× each) on
layer 0; main epochs run per-layer free CD down the joint stack plus two
aux clamps on layer 0; cross-modal reconstruction uses plain
``conditional_gibbs`` with ``sample_h=True`` in both directions through
layer 0 only.

As with the unimodal joint (imdbn_ops), an entire epoch over precomputed
modality latents runs as one jitted ``lax.scan``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from multimodal_idbn_tpu.ops import dbn_train, rbm_ops

Array = jax.Array
States = Tuple[rbm_ops.RBMState, ...]


class BimodalMetrics(NamedTuple):
    n: Array
    mse_mod1: Array  # summed
    mse_mod2: Array


def zeros_metrics() -> BimodalMetrics:
    z = jnp.zeros((), jnp.float32)
    return BimodalMetrics(z, z, z)


def bimodal_cross_reconstruct(joint0: rbm_ops.RBMState, mod1_states,
                              mod2_states, key: Array, z1: Array, z2: Array,
                              *, steps: int, Dz1: int,
                              direction: str = "both"):
    """MOD1→MOD2 and MOD2→MOD1 through joint layer 0
    (reference imdbn_bimodal.py:648-693): conditional Gibbs with
    stochastic h, mean-field v, then decode through each modality DBN.
    Returns (mod1_from_mod2, mod2_from_mod1); ``direction``
    ("both" | "1to2" | "2to1") statically skips the unused chain for
    one-direction wrappers (shared key split — the kept direction is
    bit-identical to "both"; the skipped output is None)."""
    if direction not in ("both", "1to2", "2to1"):
        raise ValueError(f"unknown direction {direction!r}")
    B = z1.shape[0]
    Dz2 = z2.shape[1]
    k1, k2 = jax.random.split(key)
    km = jnp.concatenate([jnp.ones((B, Dz1), z1.dtype),
                          jnp.zeros((B, Dz2), z1.dtype)], axis=1)

    mod2_from_mod1 = None
    if direction in ("both", "1to2"):
        v_known = jnp.concatenate([z1, jnp.zeros((B, Dz2), z1.dtype)],
                                  axis=1)
        v_1to2 = rbm_ops.conditional_gibbs(joint0, k1, v_known, km,
                                           n_steps=steps, sample_h=True,
                                           sample_v=False, groups=())
        mod2_from_mod1 = dbn_train.dbn_decode(mod2_states, v_1to2[:, Dz1:])

    mod1_from_mod2 = None
    if direction in ("both", "2to1"):
        v_known2 = jnp.concatenate([jnp.zeros((B, Dz1), z1.dtype), z2],
                                   axis=1)
        v_2to1 = rbm_ops.conditional_gibbs(joint0, k2, v_known2, 1.0 - km,
                                           n_steps=steps, sample_h=True,
                                           sample_v=False, groups=())
        mod1_from_mod2 = dbn_train.dbn_decode(mod1_states, v_2to1[:, :Dz1])

    return mod1_from_mod2, mod2_from_mod1


def _bimodal_train_batch(joint: States, mod1_states, mod2_states, key, z1,
                         z2, v1, v2, lr, mom, weight_decay, *, warmup: bool,
                         joint_cd: int, aux_cond_steps: int, Dz1: int,
                         steps: int, compute_metrics: bool, sr=None):
    """One bimodal joint batch (reference imdbn_bimodal.py:743-831)."""
    B = z1.shape[0]
    Dz2 = z2.shape[1]
    v_plus = jnp.concatenate([z1, z2], axis=1)
    km1 = jnp.concatenate([jnp.ones((B, Dz1), z1.dtype),
                           jnp.zeros((B, Dz2), z1.dtype)], axis=1)
    vk1 = jnp.concatenate([z1, jnp.zeros((B, Dz2), z1.dtype)], axis=1)
    vk2 = jnp.concatenate([jnp.zeros((B, Dz1), z1.dtype), z2], axis=1)
    keys = jax.random.split(key, 8)
    layers = list(joint)

    cd_loss = jnp.zeros((), jnp.float32)
    if warmup:
        # Alternating modality clamps, 2× each, CD=3, stochastic h
        # (imdbn_bimodal.py:753-780). First layer only.
        for i in range(2):
            layers[0], _ = rbm_ops.clamped_cd_update(
                layers[0], keys[2 * i], vk1, km1, lr=lr, mom=mom,
                weight_decay=weight_decay, cd=3,
                cond_init_steps=aux_cond_steps, sample_h=True,
                sample_v=False, reclamp_negative=True, aux_lr_mult=0.3,
                use_noisy_init=True, groups=(), sr=sr)
            layers[0], _ = rbm_ops.clamped_cd_update(
                layers[0], keys[2 * i + 1], vk2, 1.0 - km1, lr=lr, mom=mom,
                weight_decay=weight_decay, cd=3,
                cond_init_steps=aux_cond_steps, sample_h=True,
                sample_v=False, reclamp_negative=True, aux_lr_mult=0.3,
                use_noisy_init=True, groups=(), sr=sr)
    else:
        # Per-layer free CD down the joint stack (:783-792).
        current = v_plus
        for li in range(len(layers)):
            layers[li], loss = rbm_ops.cd_update(
                layers[li], jax.random.fold_in(keys[4], li), current,
                lr=lr, mom=mom, weight_decay=weight_decay, cd=joint_cd,
                groups=(), sr=sr)
            if li == 0:
                cd_loss = loss
            current = rbm_ops.hidden_probs(layers[li], current)

        # Two aux clamps on layer 0, no negative re-clamp (:794-820).
        layers[0], _ = rbm_ops.clamped_cd_update(
            layers[0], keys[5], vk1, km1, lr=lr, mom=mom,
            weight_decay=weight_decay, cd=3, cond_init_steps=aux_cond_steps,
            sample_h=True, sample_v=False, reclamp_negative=False,
            aux_lr_mult=0.3, use_noisy_init=True, groups=(), sr=sr)
        layers[0], _ = rbm_ops.clamped_cd_update(
            layers[0], keys[6], vk2, 1.0 - km1, lr=lr, mom=mom,
            weight_decay=weight_decay, cd=3, cond_init_steps=aux_cond_steps,
            sample_h=True, sample_v=False, reclamp_negative=False,
            aux_lr_mult=0.3, use_noisy_init=True, groups=(), sr=sr)

    if compute_metrics:
        rec1, rec2 = bimodal_cross_reconstruct(
            layers[0], mod1_states, mod2_states, keys[7], z1, z2,
            steps=steps, Dz1=Dz1)
        m = BimodalMetrics(
            jnp.asarray(B, jnp.float32),
            ((rec1 - v1) ** 2).sum(),
            ((rec2 - v2) ** 2).sum())
    else:
        m = zeros_metrics()
    return tuple(layers), cd_loss, m


# Shared DP batch-pinning helper (see parallel.dp_bimodal_epoch*).
from multimodal_idbn_tpu.ops.dbn_train import (  # noqa: E402
    _constrain_batches as _constrain)


@partial(jax.jit,
         static_argnames=("warmup", "joint_cd", "aux_cond_steps", "Dz1",
                          "steps", "batch_size", "metrics_every", "shuffle",
                          "mesh", "shard_axis", "sr"))
def bimodal_joint_epoch(joint: States, mod1_states, mod2_states, key,
                        Z1: Array, Z2: Array, V1: Array, V2: Array, lr, mom,
                        weight_decay, *, warmup: bool, joint_cd: int,
                        aux_cond_steps: int, Dz1: int, steps: int,
                        batch_size: int, metrics_every: int = 1,
                        shuffle: bool = False, mesh=None, shard_axis=None,
                        sr=None):
    """One fused bimodal joint epoch over precomputed latents."""
    n = Z1.shape[0]
    nb = n // batch_size
    if nb == 0:  # dataset smaller than one batch: caller's remainder
        return joint, jnp.zeros((), jnp.float32), zeros_metrics()
    kperm, kscan = jax.random.split(key)
    if shuffle:
        sel = jax.random.permutation(kperm, n)[:nb * batch_size]

        def reshape(X):
            return X[sel].reshape(nb, batch_size, -1)
    else:  # static slices: callers permute beforehand (exactly-once)
        def reshape(X):
            return X[:nb * batch_size].reshape(nb, batch_size, -1)

    xs = (_constrain(reshape(Z1), mesh, shard_axis),
          _constrain(reshape(Z2), mesh, shard_axis),
          _constrain(reshape(V1), mesh, shard_axis),
          _constrain(reshape(V2), mesh, shard_axis),
          jax.random.split(kscan, nb), jnp.arange(nb, dtype=jnp.int32))

    def body(carry, x):
        joint, totals, loss_sum = carry
        z1, z2, v1, v2, skey, b_idx = x
        joint, cd_loss, m = _bimodal_train_batch(
            joint, mod1_states, mod2_states, skey, z1, z2, v1, v2, lr, mom,
            weight_decay, warmup=warmup, joint_cd=joint_cd,
            aux_cond_steps=aux_cond_steps, Dz1=Dz1, steps=steps,
            compute_metrics=(metrics_every == 1), sr=sr)
        if metrics_every > 1:
            def compute(_):
                rec1, rec2 = bimodal_cross_reconstruct(
                    joint[0], mod1_states, mod2_states,
                    jax.random.fold_in(skey, 7), z1, z2, steps=steps,
                    Dz1=Dz1)
                return BimodalMetrics(
                    jnp.asarray(z1.shape[0], jnp.float32),
                    ((rec1 - v1) ** 2).sum(), ((rec2 - v2) ** 2).sum())

            m = jax.lax.cond(b_idx % metrics_every == 0, compute,
                             lambda _: zeros_metrics(), None)
        totals = BimodalMetrics(*(a + b for a, b in zip(totals, m)))
        return (joint, totals, loss_sum + cd_loss), None

    init = (joint, zeros_metrics(), jnp.zeros((), jnp.float32))
    (joint, totals, loss_sum), _ = jax.lax.scan(body, init, xs)
    return joint, loss_sum / jnp.maximum(1, nb), totals


@partial(jax.jit,
         static_argnames=("warmup", "joint_cd", "aux_cond_steps", "Dz1",
                          "steps", "batch_size", "metrics_every",
                          "n_epochs", "mesh", "shard_axis", "sr"))
def bimodal_epoch_block(joint: States, mod1_states, mod2_states,
                        epoch_key: Array, Z1: Array, Z2: Array, V1: Array,
                        V2: Array, epoch_idx: Array, lr_arr: Array,
                        mom_arr: Array, weight_decay, *, warmup: bool,
                        joint_cd: int, aux_cond_steps: int, Dz1: int,
                        steps: int, batch_size: int,
                        metrics_every: int = 1, n_epochs: int = 1,
                        mesh=None, shard_axis=None, sr=None):
    """Run ``n_epochs`` bimodal joint epochs in ONE dispatch (nested scan)
    with the per-epoch key derivation of the unblocked path — blocked and
    per-epoch training are bit-identical. Returns
    (joint', cd_sum[E], cd_count[E], BimodalMetrics-of-arrays[E])."""
    n = Z1.shape[0]
    nb = n // batch_size
    rem = n - nb * batch_size

    def epoch_body(joint, xs):
        e_idx, lr, mom = xs
        key = jax.random.fold_in(epoch_key, e_idx)
        perm = jax.random.permutation(jax.random.fold_in(key, 0), n)
        Z1p, Z2p, V1p, V2p = (a[perm] for a in (Z1, Z2, V1, V2))
        kscan = jax.random.split(key)[1]

        totals = zeros_metrics()
        cd_sum = jnp.zeros((), jnp.float32)
        cd_count = jnp.zeros((), jnp.float32)

        if nb > 0:
            def cut(X):
                return _constrain(
                    X[:nb * batch_size].reshape(nb, batch_size, -1),
                    mesh, shard_axis)

            step_keys = jax.random.split(kscan, nb)

            def body(carry, bxs):
                joint, totals, loss_sum = carry
                z1, z2, v1, v2, skey, b_idx = bxs
                joint, cd_loss, m = _bimodal_train_batch(
                    joint, mod1_states, mod2_states, skey, z1, z2, v1, v2,
                    lr, mom, weight_decay, warmup=warmup,
                    joint_cd=joint_cd, aux_cond_steps=aux_cond_steps,
                    Dz1=Dz1, steps=steps,
                    compute_metrics=(metrics_every == 1), sr=sr)
                if metrics_every > 1:
                    def compute(_):
                        rec1, rec2 = bimodal_cross_reconstruct(
                            joint[0], mod1_states, mod2_states,
                            jax.random.fold_in(skey, 7), z1, z2,
                            steps=steps, Dz1=Dz1)
                        return BimodalMetrics(
                            jnp.asarray(z1.shape[0], jnp.float32),
                            ((rec1 - v1) ** 2).sum(),
                            ((rec2 - v2) ** 2).sum())

                    m = jax.lax.cond(b_idx % metrics_every == 0, compute,
                                     lambda _: zeros_metrics(), None)
                totals = BimodalMetrics(
                    *(a + b for a, b in zip(totals, m)))
                return (joint, totals, loss_sum + cd_loss), None

            (joint, totals, cd_sum), _ = jax.lax.scan(
                body, (joint, totals, cd_sum),
                (cut(Z1p), cut(Z2p), cut(V1p), cut(V2p), step_keys,
                 jnp.arange(nb, dtype=jnp.int32)))
            cd_count = jnp.asarray(nb, jnp.float32)

        if rem:
            joint, cd_rem, m_rem = _bimodal_train_batch(
                joint, mod1_states, mod2_states,
                jax.random.fold_in(key, 991), Z1p[nb * batch_size:],
                Z2p[nb * batch_size:], V1p[nb * batch_size:],
                V2p[nb * batch_size:], lr, mom, weight_decay,
                warmup=warmup, joint_cd=joint_cd,
                aux_cond_steps=aux_cond_steps, Dz1=Dz1, steps=steps,
                compute_metrics=(metrics_every == 1), sr=sr)
            totals = BimodalMetrics(*(a + b for a, b in zip(totals, m_rem)))
            cd_sum = cd_sum + cd_rem
            cd_count = cd_count + 1.0
        return joint, (cd_sum, cd_count, totals)

    joint, (cd_sums, cd_counts, totals) = jax.lax.scan(
        epoch_body, joint, (epoch_idx, lr_arr, mom_arr))
    return joint, cd_sums, cd_counts, totals


@partial(jax.jit,
         static_argnames=("warmup", "joint_cd", "aux_cond_steps", "Dz1",
                          "steps", "compute_metrics", "sr"))
def bimodal_batch_step(joint: States, mod1_states, mod2_states, key, z1, z2,
                       v1, v2, lr, mom, weight_decay, *, warmup: bool,
                       joint_cd: int, aux_cond_steps: int, Dz1: int,
                       steps: int, compute_metrics: bool = True, sr=None):
    """Single-batch jitted variant (remainder / per-batch path)."""
    return _bimodal_train_batch(
        joint, mod1_states, mod2_states, key, z1, z2, v1, v2, lr, mom,
        weight_decay, warmup=warmup, joint_cd=joint_cd,
        aux_cond_steps=aux_cond_steps, Dz1=Dz1, steps=steps,
        compute_metrics=compute_metrics, sr=sr)


_bimodal_cross_jit = jax.jit(bimodal_cross_reconstruct,
                             static_argnames=("steps", "Dz1", "direction"))


# ---------------------------------------------------------------------------
# Cross-modal generative sampling (framework extension; see
# imdbn_ops.sample_txt2img for the label-conditioned analogue)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("steps", "Dz1", "direction"))
def sample_cross(joint0: rbm_ops.RBMState, mod1_states, mod2_states,
                 key: Array, z1: Array, z2: Array, *, steps: int,
                 Dz1: int, direction: str):
    """Draw the OTHER modality from p(x_other | x_known): fully sampled
    conditional Gibbs on joint layer 0
    (``rbm_ops.sampled_conditional_chain`` — known z block clamped, h AND
    v sampled each step), then ancestral-sampled decode through the
    target modality DBN (``dbn_train.dbn_decode_sampled``).

    Framework extension over ``bimodal_cross_reconstruct`` (the
    reference-semantics mean-field path, imdbn_bimodal.py:648-693):
    sampling draws individual plausible cross-modal images instead of
    the blurred conditional mean. Returns the generated images for the
    requested ``direction`` ("1to2" → mod2 images, "2to1" → mod1).
    """
    if direction not in ("1to2", "2to1"):
        raise ValueError(f"unknown direction {direction!r}")
    B = z1.shape[0]
    Dz2 = z2.shape[1]
    if direction == "1to2":
        v_known = jnp.concatenate([z1, jnp.zeros((B, Dz2), z1.dtype)], 1)
        km = jnp.concatenate([jnp.ones((Dz1,), jnp.float32),
                              jnp.zeros((Dz2,), jnp.float32)])
    else:
        v_known = jnp.concatenate([jnp.zeros((B, Dz1), z2.dtype), z2], 1)
        km = jnp.concatenate([jnp.zeros((Dz1,), jnp.float32),
                              jnp.ones((Dz2,), jnp.float32)])
    kchain, kdec = jax.random.split(key)
    v = rbm_ops.sampled_conditional_chain(joint0, kchain, v_known, km,
                                          n_steps=steps, groups=())
    if direction == "1to2":
        return dbn_train.dbn_decode_sampled(mod2_states, v[:, Dz1:], kdec)
    return dbn_train.dbn_decode_sampled(mod1_states, v[:, :Dz1], kdec)
