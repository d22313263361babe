"""Pallas TPU kernel: full RBM mean-field chains with VMEM-resident state.

Hot loops B and C (SURVEY.md §3.3) are sequential chains of tiny
matmuls — the flagship joint RBM is only 532×500 (~1 MB). This kernel
pins W (and its transpose), the biases, the clamp mask, and the chain
state in VMEM and runs ALL ``n_steps`` iterations inside one kernel.

MEASURED RESULT (v5e, flagship joint shapes, 50-step chain, batch 128,
compute-only): this kernel runs at 0.64 ms/chain vs 0.62 ms/chain for the
XLA ``lax.scan`` path — i.e. XLA already keeps the scan state and weights
hot and is at the ~12.5 µs/iteration latency floor of a serial
dependent-matmul chain at these sizes. The kernel is therefore kept as a
numerically-verified alternative (max |diff| 2e-8 vs the jnp path on
deterministic chains), NOT wired in as the default: it documents the
speed-of-light measurement and provides the scaffold for fusing future
per-step work (e.g. in-kernel sampling) that XLA cannot fuse across scan
steps. Earlier apparent scan slowness (~60 µs/step) was per-dispatch
tunnel latency, not compute.

Covers the two mean-field chain families of the cross-modal path:

- ``conditional_gibbs(sample_h=False, sample_v=False)`` (IMG→TXT,
  reference rbm.py:369-400) — deterministic given the init, so the kernel
  output is numerically parity-checked against the jnp path;
- ``noisy_meanfield_annealed`` (TXT→IMG, rbm.py:300-367) — per-step
  Gaussian logit noise from the on-core PRNG (Box–Muller), so
  distributionally equal to the threefry path, deterministic per seed.

The chain *init* (unknowns ~ U(0,1)) is drawn OUTSIDE the kernel with the
ordinary threefry key, keeping the deterministic family bit-comparable.
Stochastic-h/v chain variants keep the jnp path. This kernel is an
opt-in accelerator; the jnp path remains the semantic reference.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_idbn_tpu.ops import rbm_ops, schedules
from multimodal_idbn_tpu.ops.sampling import SoftmaxGroups, clamp_mask

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

# VMEM budget: W + W-transpose working set + state. The flagship joint
# (532×500) uses ~2 MB; guard well below the ~16 MB VMEM.
_MAX_VH_ELEMS = 1_500_000
_MAX_B = 512


def chain_kernel_supported(B: int, V: int, H: int) -> bool:
    if not HAS_PALLAS or jax.default_backend() not in ("tpu", "axon"):
        return False
    if B > _MAX_B:
        return False
    # Joint VMEM working set: W + W^T, six B×V buffers (v_known, km,
    # v_init, mu, out + temp) and two B×H activations, f32.
    working_set_bytes = 4 * (2 * V * H + 6 * B * V + 2 * B * H)
    return working_set_bytes <= 12 * 1024 * 1024


def _normal_from_bits(shape):
    """N(0,1) draws from the on-core PRNG via Box–Muller."""
    def unif():
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
            1.0 / (1 << 24))
        return u

    u1 = jnp.maximum(unif(), 1e-7)
    u2 = unif()
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)


def _make_chain_kernel(n_steps: int, groups: SoftmaxGroups, noisy: bool,
                       use_mu: bool, final_unclamped: bool, Dz: int):
    """Build the kernel body for a static chain configuration.

    All group/μ-pull arithmetic is full-width masked math (no slicing or
    concatenation): lane-misaligned slice boundaries (e.g. column 500 of a
    532-wide visible vector) force expensive per-iteration relayouts on
    the VPU. Schedules live in SMEM as precomputed reciprocals.
    """

    def kernel(seed_ref, sched_ref, w_ref, wt_ref, hb_ref, vb_ref,
               v_known_ref, km_ref, v_init_ref, mu_ref, gmask_ref,
               dzmask_ref, out_ref):
        if noisy:
            pltpu.prng_seed(seed_ref[0])
        w = w_ref[:]
        wt = wt_ref[:]
        hb = hb_ref[0, :]
        vb = vb_ref[0, :]
        v_known = v_known_ref[:]
        km = km_ref[:]
        one_minus_km = 1.0 - km
        neg_inf = jnp.float32(-1e30)

        def group_softmax(v_prob, v_logits):
            # Per-group masked softmax, full width (no slicing): each
            # group normalizes independently like apply_softmax_groups.
            for gi in range(len(groups)):
                gm = gmask_ref[gi, :]
                glog = jnp.where(gm > 0, v_logits, neg_inf)
                gmax = jnp.max(glog, axis=1, keepdims=True)
                eg = jnp.exp(glog - gmax) * gm
                sm = eg / jnp.sum(eg, axis=1, keepdims=True)
                v_prob = jnp.where(gm > 0, sm, v_prob)
            return v_prob

        def body(t, v):
            inv_T = sched_ref[t, 0]      # 1/max(1e-6, T_t)
            h_logits = (jnp.dot(v, w, preferred_element_type=jnp.float32)
                        + hb) * inv_T
            if noisy:
                sig_t = sched_ref[t, 1]
                h_logits = h_logits + _normal_from_bits(h_logits.shape) \
                    * sig_t
            h = jax.nn.sigmoid(h_logits)
            v_logits = (jnp.dot(h, wt,
                                preferred_element_type=jnp.float32)
                        + vb) * inv_T
            if noisy:
                sig_t = sched_ref[t, 1]
                v_logits = v_logits + _normal_from_bits(v_logits.shape) \
                    * sig_t
            v_prob = group_softmax(jax.nn.sigmoid(v_logits), v_logits)
            if use_mu:
                eta_t = sched_ref[t, 2]
                dzm = dzmask_ref[0, :]
                v_prob = jnp.where(
                    dzm > 0,
                    (1.0 - eta_t) * v_prob + eta_t * mu_ref[:], v_prob)
            return v_prob * one_minus_km + v_known * km

        v = jax.lax.fori_loop(0, n_steps, body, v_init_ref[:])

        if final_unclamped:
            # conditional_gibbs's extra mean-field pass, NOT re-clamped
            # (reference rbm.py:400)
            h = jax.nn.sigmoid(
                jnp.dot(v, w, preferred_element_type=jnp.float32) + hb)
            v_logits = jnp.dot(h, wt,
                               preferred_element_type=jnp.float32) + vb
            v = group_softmax(jax.nn.sigmoid(v_logits), v_logits)
        out_ref[:] = v

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "groups", "noisy", "use_mu",
                     "final_unclamped", "Dz"))
def _chain_call(seed, sched, w, hb, vb, v_known, km, v_init, mu, *,
                n_steps: int, groups: SoftmaxGroups, noisy: bool,
                use_mu: bool, final_unclamped: bool, Dz: int):
    B, V = v_known.shape
    kernel = _make_chain_kernel(n_steps, groups, noisy, use_mu,
                                final_unclamped, Dz)
    n_groups = max(1, len(groups))
    gmask = jnp.zeros((n_groups, V), jnp.float32)
    for gi, (s, e) in enumerate(groups):
        gmask = gmask.at[gi, s:e].set(1.0)
    dzmask = jnp.zeros((1, V), jnp.float32).at[0, :Dz].set(1.0)
    # μ-pull values broadcast to full width (zeros beyond Dz)
    mu_full = jnp.zeros((B, V), jnp.float32).at[:, :Dz].set(mu)
    # schedule columns: [1/T, sigma, eta, unused] (SMEM scalars)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),          # sched [n,4]
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w_t
            pl.BlockSpec(memory_space=pltpu.VMEM),          # hb (1,H)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # vb (1,V)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # v_known
            pl.BlockSpec(memory_space=pltpu.VMEM),          # km
            pl.BlockSpec(memory_space=pltpu.VMEM),          # v_init
            pl.BlockSpec(memory_space=pltpu.VMEM),          # mu (B,V)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # gmask
            pl.BlockSpec(memory_space=pltpu.VMEM),          # dzmask
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, V), jnp.float32),
    )(seed, sched, w, jnp.transpose(w), hb, vb, v_known, km, v_init,
      mu_full, gmask, dzmask)


def conditional_gibbs_fast(state: rbm_ops.RBMState, key, v_known, km, *,
                           n_steps: int, groups: SoftmaxGroups = ()):
    """VMEM-chain version of mean-field ``conditional_gibbs``
    (sample_h=sample_v=False). Bit-comparable semantics to the jnp path:
    the init draw uses the same threefry stream split; the chain itself is
    deterministic."""
    k0, _ = jax.random.split(key)
    v_init = v_known * km + (1.0 - km) * jax.random.uniform(
        k0, v_known.shape, v_known.dtype)
    B, V = v_known.shape
    Dz = groups[0][0] if groups else V
    sched = jnp.ones((max(1, n_steps), 4), jnp.float32)  # 1/T=1, rest unused
    mu = jnp.zeros((B, Dz), jnp.float32)
    return _chain_call(
        jnp.asarray([0], jnp.int32), sched, state.w,
        state.hb.reshape(1, -1), state.vb.reshape(1, -1), v_known, km,
        v_init, mu, n_steps=int(n_steps), groups=groups, noisy=False,
        use_mu=False, final_unclamped=True, Dz=Dz)


def noisy_meanfield_fast(state: rbm_ops.RBMState, key, v_known, km, *,
                         n_steps: int, T0=3.0, T1=1.0, sigma0=0.9,
                         sharpen_last=3, T_cold_plus=0.9,
                         mu_k: Optional[jax.Array] = None, eta0=0.15,
                         groups: SoftmaxGroups = (), seed: int = 0):
    """VMEM-chain version of ``noisy_meanfield_annealed`` (same schedules;
    Gaussian logit noise from the on-core PRNG — distributional parity)."""
    k0, _ = jax.random.split(key)
    v_init = v_known * km + (1.0 - km) * jax.random.uniform(
        k0, v_known.shape, v_known.dtype)
    B, V = v_known.shape
    Dz = groups[0][0] if groups else V
    if int(n_steps) <= 0:  # jnp-path parity: clamped init, no update
        return v_init
    n = int(n_steps)
    T_arr = jnp.maximum(
        schedules.annealed_temperature(n, T0, T1, sharpen_last,
                                       T_cold_plus), 1e-6)
    sig_arr = schedules.noise_sigma(n, sigma0)
    eta_arr = schedules.mu_pull_eta(n, eta0)
    sched = jnp.stack([1.0 / T_arr, sig_arr, eta_arr,
                       jnp.zeros_like(T_arr)], axis=1)
    use_mu = mu_k is not None
    mu = mu_k if use_mu else jnp.zeros((B, Dz), jnp.float32)
    # Noise stream follows the threefry key (like the jnp path); the
    # explicit ``seed`` only offsets it.
    kd = jax.random.key_data(jax.random.fold_in(key, 13)).ravel()
    seed_arr = (kd[0].astype(jnp.int32) + jnp.int32(seed)).reshape(1)
    return _chain_call(
        seed_arr, sched, state.w,
        state.hb.reshape(1, -1), state.vb.reshape(1, -1), v_known, km,
        v_init, mu, n_steps=n, groups=groups, noisy=bool(sigma0 > 0),
        use_mu=use_mu, final_unclamped=False, Dz=Dz)


# jnp references for parity tests / benchmarking
def conditional_gibbs_reference(state, key, v_known, km, *, n_steps,
                                groups=()):
    return rbm_ops.conditional_gibbs(state, key, v_known, km,
                                     n_steps=n_steps, sample_h=False,
                                     sample_v=False, groups=groups)
