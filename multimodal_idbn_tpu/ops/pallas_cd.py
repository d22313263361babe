"""Opt-in Pallas sampled-CD trainer for the image iDBN stack.

Motivation (benchmarks/RESULTS.md round-2 RNG study): the flagship CD-10
epoch is SAMPLING-bound — 21 threefry draws per update on [128, 10000] /
[128, 1500] operands dominate, which is why neither bf16 nor mixed
precision moves it. This path fuses every half-step's GEMM + sigmoid +
Bernoulli draw into one Pallas kernel whose uniforms come from the
on-core PRNG (``pallas_kernels.half_step_sample_aligned`` — the
pad-once-per-update entry point; ``half_step_sample_big`` is the
standalone pad-per-call wrapper), eliminating the threefry kernels and
their HBM-materialized uniform tensors.

Semantics: the EXACT reference update order (positive stats from
probabilities, chain start sampled, ``neg_assoc = v_sampledᵀ·h_prob``,
momentum-then-apply — reference rbm.py:181-227, SURVEY.md §2.1(3)), but a
DIFFERENT random stream than threefry — distributionally equal,
deterministic per key, NOT bitwise reproducible against the oracle. Off
by default (``config.enable_pallas_cd``); quality at flagship scale is
measured in benchmarks/RESULTS.md. Softmax groups are not supported
(image stacks never have them); callers must route group-RBMs to
``rbm_ops.cd_update``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from multimodal_idbn_tpu.ops import pallas_kernels
from multimodal_idbn_tpu.ops.rbm_ops import RBMState

Array = jax.Array

_I32_MIN = -2147483648
_I32_MAX = 2147483647


def _seeds_from_key(key: Array, n: int) -> Array:
    """Derive ``n`` 64-bit kernel keys (as [n, 2] int32 words) from a
    threefry key — wide enough that cross-half-step uniform-block reuse
    needs a 2^64 collision; the kernel folds the tile id in as a third
    seed word (``pallas_kernels._make_half_step_sample_acc_kernel``)."""
    return jax.random.randint(key, (n, 2), _I32_MIN, _I32_MAX,
                              dtype=jnp.int32)


def fast_sampled_cd_update(state: RBMState, key: Array, data: Array, *,
                           lr, mom, weight_decay, cd: int,
                           sparsity: bool = False,
                           sparsity_factor: float = 0.05
                           ) -> Tuple[RBMState, Array]:
    """CD-k update with every sampled half-step as one fused Pallas
    kernel. Same signature/return as ``rbm_ops.cd_update`` (groupless).

    W is padded to the kernel block multiples ONCE and reused by all
    2·cd+1 half-steps in BOTH directions (the visible direction
    transposes W tiles on the MXU, ``transpose_w=True``) — per-call
    padding/transposition was measured to swamp the sampling savings
    (65 ms vs 28 ms CD-10 epochs). The whole chain runs in padded space:
    padded W rows/cols are zero, so padded activations (which sample
    coin flips at p=sigmoid(0)=0.5) contribute nothing to real units,
    and statistics are taken on the sliced blocks.
    """
    if int(cd) < 1:
        raise ValueError("fast_sampled_cd_update requires CD >= 1")
    BM, BN, BK = 128, 256, 512
    # Vp/Hp serve as contraction AND output dims across the two
    # directions, so both are padded to lcm(BN, BK) = BK multiples.
    B, V = data.shape
    H = state.w.shape[1]
    Bp = pallas_kernels._ceil_to(B, BM)
    Vp = pallas_kernels._ceil_to(V, BK)
    Hp = pallas_kernels._ceil_to(H, BK)
    bsz = B
    data32 = data.astype(jnp.float32)
    datap = jnp.pad(data32, ((0, Bp - B), (0, Vp - V)))
    wp = jnp.pad(state.w.astype(jnp.float32),
                 ((0, Vp - V), (0, Hp - H)))
    hbp = jnp.pad(state.hb.astype(jnp.float32), (0, Hp - H))
    vbp = jnp.pad(state.vb.astype(jnp.float32), (0, Vp - V))
    seeds = _seeds_from_key(key, 1 + 2 * int(cd))

    # positive phase: probs + sampled chain start in ONE kernel
    pos_h_p, h = pallas_kernels.half_step_sample_aligned(
        datap, wp, hbp, seeds[0], block_m=BM, block_n=BN, block_k=BK)
    pos_h = pos_h_p[:B, :H]
    pos_assoc = data32.T @ pos_h

    # negative chain: v_prob -> v=sample -> h_prob -> h=sample per step
    v_p = v_prob_p = h_prob_p = None
    for st in range(int(cd)):
        v_prob_p, v_p = pallas_kernels.half_step_sample_aligned(
            h, wp, vbp, seeds[1 + 2 * st], transpose_w=True,
            block_m=BM, block_n=BN, block_k=BK)
        h_prob_p, h = pallas_kernels.half_step_sample_aligned(
            v_p, wp, hbp, seeds[2 + 2 * st],
            block_m=BM, block_n=BN, block_k=BK)
    v = v_p[:B, :V]
    v_prob = v_prob_p[:B, :V]
    h_prob = h_prob_p[:B, :H]
    neg_assoc = v.T @ h_prob

    dt = state.w.dtype
    w_m = (mom * state.w_m + lr * ((pos_assoc - neg_assoc) / bsz
                                   - weight_decay * state.w)).astype(dt)
    w = (state.w + w_m).astype(dt)

    hb_m = mom * state.hb_m + lr * (pos_h.sum(0) - h_prob.sum(0)) / bsz
    if sparsity:
        hb_m = hb_m + (-lr * (pos_h.mean(0) - sparsity_factor))
    hb_m = hb_m.astype(dt)
    hb = (state.hb + hb_m).astype(dt)

    vb_m = (mom * state.vb_m
            + lr * (data32.sum(0) - v.sum(0)) / bsz).astype(dt)
    vb = (state.vb + vb_m).astype(dt)

    loss = jnp.mean(jnp.square(data32 - v_prob))
    return RBMState(w, hb, vb, w_m, hb_m, vb_m), loss
