"""Pure functional RBM operations (the TPU compute path).

Every training / inference step of the framework is expressed here as a
pure function ``(state, key, inputs, schedule) -> (state', outputs)`` over
an :class:`RBMState` pytree. Callers (the object shells in
``multimodal_idbn_tpu.models`` and the fused training loops) jit these;
Gibbs / mean-field chains run as ``lax.scan`` over precomputed schedule
arrays so the whole chain stays on-device — the reference runs the same
chains as per-step Python loops on the host (reference rbm.py:275-297,
:337-365, :393-399).

Semantics reproduce the reference bit-for-bit in structure (which tensors
are probabilities vs. samples, update order, momentum handling) per
SURVEY.md §2.1; each function cites the reference lines it mirrors.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_idbn_tpu.ops import schedules
from multimodal_idbn_tpu.ops.sampling import (
    SoftmaxGroups,
    apply_softmax_groups,
    clamp_mask,
    sample_bernoulli,
    sample_visible,
)

Array = jax.Array


class RBMState(NamedTuple):
    """Learnable parameters + momentum buffers of one RBM (rbm.py:70-79)."""

    w: Array     # [V, H]
    hb: Array    # [H]  hidden bias
    vb: Array    # [V]  visible bias
    w_m: Array   # momentum buffers, same shapes
    hb_m: Array
    vb_m: Array


def init_rbm_state(key: Array, num_visible: int, num_hidden: int,
                   dtype=jnp.float32) -> RBMState:
    """W ~ N(0,1)/sqrt(max(1,V)); biases and momentum buffers zero
    (reference rbm.py:70-79)."""
    w = jax.random.normal(key, (num_visible, num_hidden), dtype) / jnp.sqrt(
        jnp.asarray(max(1, num_visible), dtype))
    z_h = jnp.zeros((num_hidden,), dtype)
    z_v = jnp.zeros((num_visible,), dtype)
    return RBMState(w=w, hb=z_h, vb=z_v,
                    w_m=jnp.zeros_like(w), hb_m=z_h, vb_m=z_v)


# ---------------------------------------------------------------------------
# Conditionals p(h|v), p(v|h)
# ---------------------------------------------------------------------------

def hidden_logits(state: RBMState, v: Array, T=1.0) -> Array:
    return (v @ state.w + state.hb) / jnp.maximum(1e-6, T)


def hidden_probs(state: RBMState, v: Array, T=1.0) -> Array:
    """p(h|v) = sigmoid((vW + b_h)/max(1e-6,T)) (rbm.py:81-92)."""
    return jax.nn.sigmoid(hidden_logits(state, v, T))


def visible_logits(state: RBMState, h: Array, T=1.0) -> Array:
    """(h Wᵀ + b_v)/max(1e-6,T) (rbm.py:94-96)."""
    return (h @ state.w.T + state.vb) / jnp.maximum(1e-6, T)


def visible_probs(state: RBMState, h: Array, T=1.0,
                  groups: SoftmaxGroups = ()) -> Array:
    """p(v|h): sigmoid of logits with softmax groups on the *logits*
    (rbm.py:98-116)."""
    logits = visible_logits(state, h, T)
    return apply_softmax_groups(jax.nn.sigmoid(logits), logits, groups)


def free_energy(state: RBMState, v: Array) -> Array:
    """F(v) = −v·b_v − Σ_j softplus(b_h + vW)_j.

    The reference keeps this as a free function (energy_utils.py:19-28) and
    never attaches it to RBM; we expose it here and on the shell so the
    best-of-K selector can optionally use it (SURVEY.md §2.1(10)).
    """
    return -(v @ state.vb) - jnp.sum(jax.nn.softplus(state.hb + v @ state.w), axis=1)


def gibbs_step(state: RBMState, key: Array, v: Array,
               sample_h: bool = True, sample_v: bool = True,
               groups: SoftmaxGroups = ()):
    """One v -> h -> v' Gibbs step; returns (v_next, v_prob, h, h_prob)
    (rbm.py:159-178)."""
    kh, kv = jax.random.split(key)
    h_prob = hidden_probs(state, v)
    h = sample_bernoulli(kh, h_prob) if sample_h else h_prob
    v_prob = visible_probs(state, h, groups=groups)
    v_next = sample_visible(kv, v_prob, groups) if sample_v else v_prob
    return v_next, v_prob, h, h_prob


# ---------------------------------------------------------------------------
# CD-k training update (rbm.py:181-227)
# ---------------------------------------------------------------------------

def _negative_chain(state: RBMState, key: Array, h0: Array, cd: int,
                    groups: SoftmaxGroups):
    """Run the CD negative chain h0 -> (v, v_prob, h_prob) for ``cd`` steps.

    Per step (rbm.py:204-208): v_prob -> v=sample(v_prob) -> h_prob ->
    h=sample(h_prob). Runs as a scan over per-step keys.

    The per-step (kv, kh) derivation is hoisted out of the scan and
    vectorized (vmapped split over the cd step keys) — bit-identical key
    VALUES (pinned by tests/test_rbm_oracle.py goldens), but the serial
    fold/split kernel chain inside the scan body goes away; the round-1
    CD microbench attributed 30-40% of sampling cost to exactly that
    in-scan key handling (benchmarks/RESULTS.md).
    """
    keys = jax.random.split(key, cd)
    kv_kh = jax.vmap(lambda k: jax.random.split(k, 2))(keys)  # [cd, 2]

    def body(carry, step_keys):
        h, _, _, _ = carry
        kv, kh = step_keys[0], step_keys[1]
        v_prob = visible_probs(state, h, groups=groups)
        v = sample_visible(kv, v_prob, groups)
        h_prob = hidden_probs(state, v)
        h = sample_bernoulli(kh, h_prob)
        return (h, v, v_prob, h_prob), None

    B = h0.shape[0]
    v0 = jnp.zeros((B, state.vb.shape[0]), h0.dtype)
    (h, v, v_prob, h_prob), _ = jax.lax.scan(
        body, (h0, v0, v0, h0), kv_kh)
    return v, v_prob, h_prob


def stochastic_round(key: Array, x: Array, dtype) -> Array:
    """Unbiased rounding of f32 values into ``dtype`` (bfloat16).

    Adds uniform random bits below the bf16 mantissa cutoff and
    truncates, so ``E[stochastic_round(x)] == x`` exactly for finite x.
    Nearest-rounding bf16 updates silently drop any increment below
    ~0.4% of the parameter's magnitude — the measured failure mode of
    pure-bf16 storage training (benchmarks/RESULTS.md round-2 study:
    flagship top1 collapses to ~0.3); stochastic rounding keeps the
    EXPECTED update exact at any increment/parameter magnitude ratio
    (Gupta et al. 2015, "Deep Learning with Limited Numerical
    Precision"). Plain XLA ops (bitcast + uint32 adds), fuses into the
    update epilogue; no reference counterpart (the reference is f32-only,
    rbm.py:181-227).
    """
    if jnp.dtype(dtype) == jnp.float32:
        return x.astype(jnp.float32)
    if jnp.dtype(dtype) != jnp.dtype(jnp.bfloat16):
        raise ValueError(f"stochastic_round supports bfloat16/float32 "
                         f"targets, got {dtype}")
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    r = jax.random.bits(key, bits.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    out = (bits + r) & jnp.uint32(0xFFFF0000)
    # the truncated f32 is exactly representable in bf16: cast is exact
    return jax.lax.bitcast_convert_type(out, jnp.float32).astype(
        jnp.bfloat16)


def compute_cast(state: RBMState, compute_dtype=None) -> RBMState:
    """Weights/biases cast once to a reduced compute dtype (mixed
    precision); momentum buffers are update-only and left untouched.

    This is the mixed-precision contract: parameters stay in f32 master
    storage (small CD increments survive), while the Gibbs-chain GEMMs
    stream a bf16 copy of W — one cast per update amortized over the
    2·CD+2 weight-sized GEMM reads the epoch is HBM-bound on. Pure-bf16
    *storage* (init_rbm_state(dtype=bfloat16)) is faster still but loses
    the updates themselves (measured collapse: benchmarks/RESULTS.md
    round-2 bf16 study).
    """
    if compute_dtype is None or state.w.dtype == jnp.dtype(compute_dtype):
        return state
    return state._replace(w=state.w.astype(compute_dtype),
                          hb=state.hb.astype(compute_dtype),
                          vb=state.vb.astype(compute_dtype))


def cd_update(state: RBMState, key: Array, data: Array, *,
              lr, mom, weight_decay, cd: int,
              sparsity: bool = False, sparsity_factor: float = 0.05,
              groups: SoftmaxGroups = (),
              compute_dtype=None,
              sr: Optional[bool] = None) -> Tuple[RBMState, Array]:
    """One CD-k parameter update on a batch; returns (new_state, mse loss).

    Exact update order of reference rbm.py:181-227 (SURVEY.md §2.1(3)):
    positive statistics from probabilities, negative association from the
    *sampled* v and *probabilistic* h, momentum-buffer-then-apply updates,
    sparsity added to the hidden momentum buffer before applying.
    ``lr``/``mom`` arrive as traced scalars so one compile serves all epochs.

    ``compute_dtype`` (static, default None = bit-exact reference path):
    mixed precision — the Gibbs chain runs on a bf16 copy of the weights
    while statistics accumulate in f32 and the parameter update applies to
    the f32 master state (see ``compute_cast``).

    ``sr`` (static): stochastic-rounding parameter updates. ``None``
    (default) = auto: ON whenever the STORAGE dtype is bfloat16 —
    nearest-rounded bf16 updates are the documented quality collapse of
    that mode (see :func:`stochastic_round`), so unbiased rounding is
    the only sensible default there; a no-op for f32 storage. ``False``
    forces the legacy biased bf16 epilogue (ablation only). The chain
    RNG (k_pos/k_neg) is untouched, so SR and non-SR runs sample
    identical Gibbs chains until the weights diverge.
    """
    if int(cd) < 1:
        raise ValueError(f"cd_update requires CD >= 1, got {cd}")
    k_pos, k_neg = jax.random.split(key)
    bsz = data.shape[0]
    mixed = compute_dtype is not None
    sr_on = (state.w.dtype == jnp.bfloat16) if sr is None else bool(sr)
    # Opt-in reduced-precision storage (init_rbm_state(dtype=bfloat16)):
    # the whole update then runs in the state dtype, halving the HBM
    # traffic the flagship epoch is bound on (benchmarks/RESULTS.md).
    cstate = compute_cast(state, compute_dtype) if mixed else state
    data = data.astype(cstate.w.dtype)

    pos_h = hidden_probs(cstate, data)             # probabilities (:199)

    h0 = sample_bernoulli(k_pos, pos_h)            # chain start sampled (:203)
    v, v_prob, h_prob = _negative_chain(cstate, k_neg, h0, cd, groups)

    if mixed or sr_on:
        # bf16 GEMM operands, f32 accumulation/output (the MXU
        # accumulates f32 anyway; preferred_element_type skips the
        # output rounding), elementwise sums in f32. The SR epilogue
        # needs f32 statistics too (the whole point is an f32-exact
        # update before the single unbiased rounding).
        f32 = jnp.float32
        pos_assoc = jnp.matmul(data.T, pos_h, preferred_element_type=f32)
        neg_assoc = jnp.matmul(v.T, h_prob, preferred_element_type=f32)
        pos_h_sum = pos_h.astype(f32).sum(0)
        neg_h_sum = h_prob.astype(f32).sum(0)
        pos_h_mean = pos_h.astype(f32).mean(0)
        data_sum = data.astype(f32).sum(0)
        v_sum = v.astype(f32).sum(0)
    else:
        pos_assoc = data.T @ pos_h                 # (:200)
        neg_assoc = v.T @ h_prob                   # sampled v, prob h (:209)
        pos_h_sum, neg_h_sum = pos_h.sum(0), h_prob.sum(0)
        pos_h_mean = pos_h.mean(0)
        data_sum, v_sum = data.sum(0), v.sum(0)

    # Loss reported in f32 regardless of storage dtype.
    loss = jnp.mean(jnp.square((data - v_prob).astype(jnp.float32)))  # (:226)

    new_state = _apply_update(
        state, key, pos_assoc, neg_assoc, pos_h_sum, neg_h_sum,
        pos_h_mean, data_sum, v_sum, lr=lr, mom=mom,
        weight_decay=weight_decay, bsz=bsz, sparsity=sparsity,
        sparsity_factor=sparsity_factor, sr_on=sr_on)
    return new_state, loss


def _apply_update(state: RBMState, key: Array, pos_assoc, neg_assoc,
                  pos_h_sum, neg_h_sum, pos_h_mean, data_sum, v_sum, *,
                  lr, mom, weight_decay, bsz, sparsity, sparsity_factor,
                  sr_on: bool) -> RBMState:
    """Momentum-buffer-then-apply parameter update (rbm.py:212-224),
    shared by the CD and PCD trainers.

    ``sr_on``: f32-exact update then ONE unbiased stochastic rounding
    per stored array (see :func:`stochastic_round`); the SR keys come
    from ``fold_in(key, 13)`` so the chain keys (split(key)) are
    untouched. Off: the update runs in the storage dtype exactly as the
    reference does in f32.
    """
    dt = state.w.dtype
    if sr_on:
        f32 = jnp.float32
        ks = jax.random.split(jax.random.fold_in(key, 13), 6)
        w_m_f = (mom * state.w_m.astype(f32)
                 + lr * ((pos_assoc - neg_assoc) / bsz
                         - weight_decay * state.w.astype(f32)))
        w_f = state.w.astype(f32) + w_m_f
        hb_m_f = (mom * state.hb_m.astype(f32)
                  + lr * (pos_h_sum - neg_h_sum) / bsz)
        if sparsity:
            hb_m_f = hb_m_f + (-lr * (pos_h_mean - sparsity_factor))
        hb_f = state.hb.astype(f32) + hb_m_f
        vb_m_f = (mom * state.vb_m.astype(f32)
                  + lr * (data_sum - v_sum) / bsz)
        vb_f = state.vb.astype(f32) + vb_m_f
        return RBMState(
            stochastic_round(ks[0], w_f, dt),
            stochastic_round(ks[1], hb_f, dt),
            stochastic_round(ks[2], vb_f, dt),
            stochastic_round(ks[3], w_m_f, dt),
            stochastic_round(ks[4], hb_m_f, dt),
            stochastic_round(ks[5], vb_m_f, dt))

    # Updates cast back to the storage dtype (identity for f32; pins the
    # scan carry dtype when lr/mom arrive as f32 schedule arrays while
    # the state is stored bf16).
    w_m = (mom * state.w_m + lr * ((pos_assoc - neg_assoc) / bsz
                                   - weight_decay * state.w)).astype(dt)  # (:212)
    w = (state.w + w_m).astype(dt)                                # (:213)

    hb_m = mom * state.hb_m + lr * (pos_h_sum - neg_h_sum) / bsz  # (:216)
    if sparsity:                                                  # (:217-219)
        hb_m = hb_m + (-lr * (pos_h_mean - sparsity_factor))
    hb_m = hb_m.astype(dt)
    hb = (state.hb + hb_m).astype(dt)                             # (:220)

    vb_m = (mom * state.vb_m
            + lr * (data_sum - v_sum) / bsz).astype(dt)           # (:223)
    vb = (state.vb + vb_m).astype(dt)                             # (:224)

    return RBMState(w, hb, vb, w_m, hb_m, vb_m)


def pcd_update(state: RBMState, chain_v: Array, key: Array, data: Array, *,
               lr, mom, weight_decay, cd: int,
               sparsity: bool = False, sparsity_factor: float = 0.05,
               groups: SoftmaxGroups = (),
               compute_dtype=None,
               sr: Optional[bool] = None) -> Tuple[RBMState, Array, Array]:
    """Persistent-CD update (Tieleman 2008): the negative chain continues
    from persistent fantasy particles ``chain_v`` instead of restarting at
    the data. Returns (new_state, new_chain_v, loss).

    Framework extension — NO reference counterpart (the reference trains
    plain CD-k only, rbm.py:181-227); opt-in via ``params["PCD"]=True``.
    Positive statistics, update order, momentum handling, and the
    monitoring loss (one-step reconstruction MSE, same quantity CD-1
    reports) all match ``cd_update`` so the two trainers are directly
    comparable. The persistent chain is sampled state in [0, 1]^V and is
    part of the training carry (fused epochs thread it through the scan;
    epoch blocks persist it across epochs — the point of PCD).
    """
    if int(cd) < 1:
        raise ValueError(f"pcd_update requires CD >= 1, got {cd}")
    k_pos, k_chain, k_neg = jax.random.split(key, 3)
    bsz = data.shape[0]
    mixed = compute_dtype is not None
    # same auto-SR rule as cd_update (see stochastic_round)
    sr_on = (state.w.dtype == jnp.bfloat16) if sr is None else bool(sr)
    cstate = compute_cast(state, compute_dtype) if mixed else state
    data = data.astype(cstate.w.dtype)
    chain_v = chain_v.astype(cstate.w.dtype)

    pos_h = hidden_probs(cstate, data)             # probabilities
    h0 = sample_bernoulli(k_pos, pos_h)            # for the recon monitor

    # negative phase: lift the persistent particles to h, run cd steps
    h_chain = sample_bernoulli(k_chain, hidden_probs(cstate, chain_v))
    v, v_prob, h_prob = _negative_chain(cstate, k_neg, h_chain, cd, groups)

    if mixed or sr_on:
        f32 = jnp.float32
        pos_assoc = jnp.matmul(data.T, pos_h, preferred_element_type=f32)
        neg_assoc = jnp.matmul(v.T, h_prob, preferred_element_type=f32)
        pos_h_sum = pos_h.astype(f32).sum(0)
        neg_h_sum = h_prob.astype(f32).sum(0)
        pos_h_mean = pos_h.astype(f32).mean(0)
        data_sum = data.astype(f32).sum(0)
        v_sum = v.astype(f32).sum(0)
    else:
        pos_assoc = data.T @ pos_h
        neg_assoc = v.T @ h_prob
        pos_h_sum, neg_h_sum = pos_h.sum(0), h_prob.sum(0)
        pos_h_mean = pos_h.mean(0)
        data_sum, v_sum = data.sum(0), v.sum(0)

    # Monitoring loss: one-step reconstruction from the data-anchored h0
    # (the quantity cd_update's loss reduces to at CD-1).
    v_recon = visible_probs(cstate, h0, groups=groups)
    loss = jnp.mean(jnp.square((data - v_recon).astype(jnp.float32)))
    new_state = _apply_update(
        state, key, pos_assoc, neg_assoc, pos_h_sum, neg_h_sum,
        pos_h_mean, data_sum, v_sum, lr=lr, mom=mom,
        weight_decay=weight_decay, bsz=bsz, sparsity=sparsity,
        sparsity_factor=sparsity_factor, sr_on=sr_on)
    return new_state, v.astype(state.w.dtype), loss


def init_pcd_chains(key: Array, batch_size: int, num_visible: int,
                    dtype=jnp.float32) -> Array:
    """Fantasy particles initialized U(0,1)-thresholded at 0.5 (fair
    coin), the standard PCD start."""
    return (jax.random.uniform(key, (batch_size, num_visible)) >
            0.5).astype(dtype)


# ---------------------------------------------------------------------------
# Conditional samplers (rbm.py:240-400)
# ---------------------------------------------------------------------------

def conditional_gibbs(state: RBMState, key: Array, v_known: Array,
                      known_mask: Array, *, n_steps: int = 30,
                      sample_h: bool = False, sample_v: bool = False,
                      groups: SoftmaxGroups = ()) -> Array:
    """Plain conditional Gibbs / mean-field chain (rbm.py:369-400).

    Unknown coordinates start U(0,1); known ones are re-clamped each step.
    Returns ``visible_probs(hidden_probs(v))`` — the reference's extra
    final mean-field pass whose output is NOT re-clamped (rbm.py:400).
    """
    k0, kloop = jax.random.split(key)
    km = known_mask
    v = v_known * km + (1.0 - km) * jax.random.uniform(k0, v_known.shape,
                                                       v_known.dtype)
    keys = jax.random.split(kloop, max(1, int(n_steps)))
    # (kh, kv) hoisted+vmapped out of the scan: bit-identical key values,
    # no serial in-scan split kernels (see _negative_chain).
    kv_kh = jax.vmap(lambda k: jax.random.split(k, 2))(keys)

    def body(v, step_keys):
        kh, kv = step_keys[0], step_keys[1]
        h_prob = hidden_probs(state, v)
        h = sample_bernoulli(kh, h_prob) if sample_h else h_prob
        v_prob = visible_probs(state, h, groups=groups)
        v = clamp_mask(v_prob, v_known, km)
        if sample_v:
            v = clamp_mask(sample_visible(kv, v, groups), v_known, km)
        return v, None

    if int(n_steps) > 0:
        v, _ = jax.lax.scan(body, v, kv_kh)
    return visible_probs(state, hidden_probs(state, v), groups=groups)


def sampled_conditional_chain(state: RBMState, key: Array, v_known: Array,
                              known_mask: Array, *, n_steps: int,
                              groups: SoftmaxGroups = ()) -> Array:
    """FULLY sampled clamped Gibbs chain: h AND v Bernoulli-sampled every
    step (softmax groups re-sampled categorically), known coordinates
    re-clamped, final SAMPLED v returned (no mean-field pass).

    Framework extension (no reference counterpart — ``conditional_gibbs``
    rbm.py:369-400 is the mean-field family): this is the generative
    chain behind ``imdbn_ops.sample_txt2img`` / ``bimodal_ops
    .sample_cross``, which draw individual configurations from
    p(v_unknown | v_known) instead of conditional means. Unknown
    coordinates start U(0,1). Oracle-pinned in tests/test_rbm_oracle.py.
    """
    if int(n_steps) < 1:
        raise ValueError("sampled_conditional_chain needs n_steps >= 1 "
                         "(with 0 steps the output would be decoded "
                         "uniform noise, independent of the clamp)")
    from multimodal_idbn_tpu.ops.sampling import clamp_mask, sample_visible

    k0, kloop = jax.random.split(key)
    km = known_mask
    v = clamp_mask(jax.random.uniform(k0, v_known.shape, v_known.dtype),
                   v_known, km)
    keys = jax.random.split(kloop, int(n_steps))
    kv_kh = jax.vmap(lambda k: jax.random.split(k, 2))(keys)

    def body(v, ks):
        kh, kv = ks[0], ks[1]
        h = sample_bernoulli(kh, hidden_probs(state, v))
        v_prob = visible_probs(state, h, groups=groups)
        v_new = sample_visible(kv, v_prob, groups)
        return clamp_mask(v_new, v_known, km), None

    v, _ = jax.lax.scan(body, v, kv_kh)
    return v


def conditional_gibbs_annealed(state: RBMState, key: Array, v_known: Array,
                               known_mask: Array, *, n_steps: int = 40,
                               T0: float = 2.5, T1: float = 1.0,
                               sample_h_until: int = 20,
                               sample_v_every: int = 0,
                               final_meanfield: bool = True,
                               groups: SoftmaxGroups = ()) -> Array:
    """Annealed conditional Gibbs (rbm.py:240-298).

    Linear T0→T1 with the last 3 steps sharpened to min(0.9, T); h sampled
    stochastically while ``t < sample_h_until``; optional periodic v
    sampling; optional final T=1 mean-field pass (re-clamped, rbm.py:294-296).
    """
    n_steps = int(n_steps)
    k0, kloop = jax.random.split(key)
    km = known_mask
    v = v_known * km + (1.0 - km) * jax.random.uniform(k0, v_known.shape,
                                                       v_known.dtype)
    hot = int(max(0, min(n_steps, sample_h_until)))
    T_arr = schedules.gibbs_annealed_temperature(n_steps, T0, T1)
    # Static per-step masks (rbm.py:282, :285).
    hot_mask = jnp.arange(n_steps) < hot
    if sample_v_every > 0:
        sv_mask = hot_mask & (jnp.arange(n_steps) % sample_v_every == 0)
    else:
        sv_mask = jnp.zeros((n_steps,), bool)
    keys = jax.random.split(kloop, max(1, n_steps))
    kv_kh = jax.vmap(lambda k: jax.random.split(k, 2))(keys)

    def body(v, xs):
        Tt, is_hot, do_sv, step_keys = xs
        kh, kv = step_keys[0], step_keys[1]
        h_prob = hidden_probs(state, v, T=Tt)
        h = jnp.where(is_hot, sample_bernoulli(kh, h_prob), h_prob)
        v_prob = visible_probs(state, h, T=Tt, groups=groups)
        v_new = jnp.where(do_sv, sample_visible(kv, v_prob, groups), v_prob)
        return clamp_mask(v_new, v_known, km), None

    if n_steps > 0:
        v, _ = jax.lax.scan(body, v, (T_arr, hot_mask, sv_mask, kv_kh))
    if final_meanfield:
        h_prob = hidden_probs(state, v, T=1.0)
        v = clamp_mask(visible_probs(state, h_prob, T=1.0, groups=groups),
                       v_known, km)
    return v


def noisy_meanfield_annealed(state: RBMState, key: Array, v_known: Array,
                             known_mask: Array, *, n_steps: int = 72,
                             T0: float = 3.0, T1: float = 1.0,
                             sigma0: float = 0.9, hot_frac: float = 0.7,
                             sharpen_last: int = 3, T_cold_plus: float = 0.9,
                             mu_k: Optional[Array] = None, eta0: float = 0.15,
                             groups: SoftmaxGroups = ()) -> Array:
    """Noisy mean-field annealing with optional μ-pull (rbm.py:300-367).

    Gaussian noise σ_t = σ0·(1 − t/(n−1)) is added to BOTH h- and v-logits;
    softmax groups apply to the *noisy* v-logits; μ-pull (if ``mu_k`` given)
    blends the first Dz coordinates toward per-class means with decaying
    η_t. ``hot_frac`` is accepted but unused inside, reproducing the
    reference's dead parameter (rbm.py:335, SURVEY.md §2.1(6)).

    Unlike the reference (which smuggles μ-pull through a mutated
    ``self._mu_pull`` attribute, rbm.py:359-363), ``mu_k``/``eta0`` are
    explicit arguments; the object shell keeps the attribute for API compat.
    """
    del hot_frac  # computed but never used in the reference (rbm.py:335)
    n_steps = int(n_steps)
    k0, kloop = jax.random.split(key)
    km = known_mask
    v = v_known * km + (1.0 - km) * jax.random.uniform(k0, v_known.shape,
                                                       v_known.dtype)
    T_arr = schedules.annealed_temperature(n_steps, T0, T1, sharpen_last,
                                           T_cold_plus)
    sig_arr = schedules.noise_sigma(n_steps, sigma0)
    eta_arr = schedules.mu_pull_eta(n_steps, eta0)
    keys = jax.random.split(kloop, max(1, n_steps))
    kv_kh = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
    noisy = bool(sigma0 > 0)  # static: skip RNG entirely when σ0 == 0

    def body(v, xs):
        Tt, sig_t, eta_t, step_keys = xs
        kh, kv = step_keys[0], step_keys[1]
        h_logits = hidden_logits(state, v, T=Tt)
        if noisy:
            h_logits = h_logits + jax.random.normal(kh, h_logits.shape,
                                                    h_logits.dtype) * sig_t
        h_prob = jax.nn.sigmoid(h_logits)
        v_logits = visible_logits(state, h_prob, T=Tt)
        if noisy:
            v_logits = v_logits + jax.random.normal(kv, v_logits.shape,
                                                    v_logits.dtype) * sig_t
        v_prob = apply_softmax_groups(jax.nn.sigmoid(v_logits), v_logits,
                                      groups)
        if mu_k is not None:
            Dz = mu_k.shape[1]
            v_prob = v_prob.at[:, :Dz].set(
                (1.0 - eta_t) * v_prob[:, :Dz] + eta_t * mu_k)
        return clamp_mask(v_prob, v_known, km), None

    if n_steps > 0:
        v, _ = jax.lax.scan(body, v, (T_arr, sig_arr, eta_arr, kv_kh))
    return v


# ---------------------------------------------------------------------------
# Auxiliary clamped CD (rbm.py:402-483)
# ---------------------------------------------------------------------------

def clamped_cd_update(state: RBMState, key: Array, v_known: Array,
                      known_mask: Array, *, lr, mom, weight_decay,
                      cd: int = 1, cond_init_steps: int = 50,
                      sample_h: bool = True, sample_v: bool = False,
                      reclamp_negative: bool = True,
                      aux_lr_mult: float = 0.3, use_noisy_init: bool = True,
                      mu_k: Optional[Array] = None, eta0: float = 0.15,
                      groups: SoftmaxGroups = (),
                      sr: Optional[bool] = None) -> Tuple[RBMState, Array]:
    """Auxiliary clamped-CD update (rbm.py:402-483, SURVEY.md §2.1(7)).

    Positive state from conditional inference (noisy mean-field by default,
    with the reference's hardcoded annealing constants rbm.py:443-448);
    negative chain clones it; all three updates scaled by ``aux_lr_mult``
    (weight decay inside the scaled bracket, rbm.py:476).
    """
    k_init, k_neg = jax.random.split(key)
    bsz = v_known.shape[0]

    if use_noisy_init:
        v_plus = noisy_meanfield_annealed(
            state, k_init, v_known, known_mask,
            n_steps=max(10, int(cond_init_steps)),
            T0=3.0, T1=1.0, sigma0=0.9, hot_frac=0.7, sharpen_last=2,
            T_cold_plus=0.9, mu_k=mu_k, eta0=eta0, groups=groups)
    else:
        v_plus = conditional_gibbs(
            state, k_init, v_known, known_mask, n_steps=int(cond_init_steps),
            sample_h=sample_h, sample_v=sample_v, groups=groups)

    # same auto-SR rule as cd_update (see stochastic_round)
    sr_on = (state.w.dtype == jnp.bfloat16) if sr is None else bool(sr)

    h_plus = hidden_probs(state, v_plus)
    if sr_on:  # f32-exact statistics ahead of the unbiased rounding
        pos_assoc = jnp.matmul(v_plus.T, h_plus,
                               preferred_element_type=jnp.float32)
    else:
        pos_assoc = v_plus.T @ h_plus

    keys = jax.random.split(k_neg, max(1, int(cd)))
    kv_kh = jax.vmap(lambda k: jax.random.split(k, 2))(keys)

    def body(v_neg, step_keys):
        kh, kv = step_keys[0], step_keys[1]
        h_prob = hidden_probs(state, v_neg)
        h = sample_bernoulli(kh, h_prob) if sample_h else h_prob
        v_prob = visible_probs(state, h, groups=groups)
        if reclamp_negative:
            v_neg = clamp_mask(v_prob, v_known, known_mask)
        else:
            v_neg = v_prob
        if sample_v:
            v_neg = sample_visible(kv, v_neg, groups)  # NOT re-clamped (:469)
        return v_neg, None

    v_neg = v_plus
    if int(cd) > 0:
        v_neg, _ = jax.lax.scan(body, v_neg, kv_kh)

    h_neg = hidden_probs(state, v_neg)
    if sr_on:
        f32 = jnp.float32
        neg_assoc = jnp.matmul(v_neg.T, h_neg, preferred_element_type=f32)
        h_plus_sum, h_neg_sum = h_plus.astype(f32).sum(0), \
            h_neg.astype(f32).sum(0)
        v_plus_sum, v_neg_sum = v_plus.astype(f32).sum(0), \
            v_neg.astype(f32).sum(0)
    else:
        neg_assoc = v_neg.T @ h_neg
        h_plus_sum, h_neg_sum = h_plus.sum(0), h_neg.sum(0)
        v_plus_sum, v_neg_sum = v_plus.sum(0), v_neg.sum(0)

    loss = jnp.mean(jnp.square((v_plus - v_neg).astype(jnp.float32)))
    # aux update = the standard momentum-then-apply epilogue with the
    # scaled lr and no sparsity term (rbm.py:474-481)
    new_state = _apply_update(
        state, key, pos_assoc, neg_assoc, h_plus_sum, h_neg_sum,
        None, v_plus_sum, v_neg_sum, lr=aux_lr_mult * lr, mom=mom,
        weight_decay=weight_decay, bsz=bsz, sparsity=False,
        sparsity_factor=0.0, sr_on=sr_on)
    return new_state, loss
