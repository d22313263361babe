"""Pallas TPU kernels for the fused RBM half-step.

The RBM hot loop is chains of half-steps: GEMM + bias + temperature +
sigmoid (+ Bernoulli sampling) (reference rbm.py:81-135; SURVEY.md §3.2
hot loop A). XLA already fuses the elementwise epilogue into the matmul,
so the marginal win of a custom kernel is fusing the *random sampling*:
the uniform draw happens in-register from the on-core PRNG instead of a
separate threefry kernel materializing a [B, H] uniform tensor in HBM.

These kernels are an optimization, not a correctness dependency
(SURVEY.md §7 step 2): the jnp path is the reference semantics, is kept
permanently, and is what the golden tests pin. ``half_step_probs`` is
bit-compatible with the jnp path; ``half_step_sample`` draws from the
Mosaic on-core PRNG, so its samples are distributionally — not bitwise —
equal to the threefry path (seeded per (kernel-call, tile), deterministic
for a fixed seed and grid).

Grid layout: (B/bm, H/bn) tiles with the full contraction dimension V
resident in VMEM per tile. With pipeline double-buffering the practical
ceiling is V ≲ 4000 at the default blocks (``pallas_supported`` computes
the budget); larger shapes — including the flagship V=10000 first layer —
fall back to the jnp path, which XLA already runs at near-roofline for
those large matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas TPU lowering is only available on TPU backends.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

Array = jax.Array

def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pallas_supported(B: int, V: int, H: int, block_m: int = 128,
                     block_n: int = 256) -> bool:
    if not HAS_PALLAS:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # Per-tile VMEM: v-tile [bm, V] + w-tile [V, bn] + out tiles, f32,
    # double-buffered by the pipeline. Stay under ~12 MB of the ~16 MB.
    tile_bytes = 4 * (block_m * V + V * block_n + 2 * block_m * block_n)
    return 2 * tile_bytes <= 12 * 1024 * 1024


def _half_step_kernel(t_ref, v_ref, w_ref, b_ref, out_ref):
    """probs = sigmoid((v @ w + b) / max(1e-6, T)) for one (bm, bn) tile."""
    acc = jnp.dot(v_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    logits = (acc + b_ref[0, :]) / jnp.maximum(1e-6, t_ref[0])
    out_ref[:] = jax.nn.sigmoid(logits)


def _half_step_sample_kernel(seed_ref, t_ref, v_ref, w_ref, b_ref,
                             probs_ref, sample_ref):
    """Fused probs + Bernoulli sample with in-kernel PRNG.

    Seeded per tile so every grid cell draws an independent stream
    deterministically (seed + linearized program id).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    # Golden-ratio mix so nearby seeds do not alias across tiles between
    # calls (seed s, tile t vs seed s+1, tile t-1).
    linear_id = i * pl.num_programs(1) + j
    pltpu.prng_seed(seed_ref[0] * jnp.int32(-1640531527) + linear_id)

    acc = jnp.dot(v_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    logits = (acc + b_ref[0, :]) / jnp.maximum(1e-6, t_ref[0])
    p = jax.nn.sigmoid(logits)
    probs_ref[:] = p

    bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
    # top 24 bits → uniform in [0, 1) with full f32 mantissa coverage;
    # Mosaic has no uint32→f32 cast, so bitcast the (<2^24) value to int32
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24))
    sample_ref[:] = (p > u).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def half_step_probs(v: Array, w: Array, b: Array, T=1.0, *,
                    block_m: int = 128, block_n: int = 256) -> Array:
    """sigmoid((v @ w + b)/max(1e-6,T)) as a Pallas kernel.

    Bit-compatible with the jnp path (same matmul precision class); used
    for both directions (pass ``w.T``-shaped weights for v|h).
    """
    B, V = v.shape
    H = w.shape[1]
    Bp, Hp = _ceil_to(B, block_m), _ceil_to(H, block_n)
    vp = jnp.pad(v, ((0, Bp - B), (0, 0)))
    wp = jnp.pad(w, ((0, 0), (0, Hp - H)))
    bp = jnp.pad(b, (0, Hp - H)).reshape(1, Hp)
    t = jnp.asarray([T], jnp.float32)

    out = pl.pallas_call(
        _half_step_kernel,
        grid=(Bp // block_m, Hp // block_n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, V), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
    )(t, vp, wp, bp)
    return out[:B, :H]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def half_step_sample(v: Array, w: Array, b: Array, seed, T=1.0, *,
                     block_m: int = 128, block_n: int = 256):
    """Fused (probs, Bernoulli sample) half-step with in-kernel PRNG.

    Returns (probs [B,H], sample [B,H]). The uniform draw never touches
    HBM. ``seed`` is an int32 scalar; a fixed (seed, shape) pair is
    deterministic.
    """
    B, V = v.shape
    H = w.shape[1]
    Bp, Hp = _ceil_to(B, block_m), _ceil_to(H, block_n)
    vp = jnp.pad(v, ((0, Bp - B), (0, 0)))
    wp = jnp.pad(w, ((0, 0), (0, Hp - H)))
    bp = jnp.pad(b, (0, Hp - H)).reshape(1, Hp)
    t = jnp.asarray([T], jnp.float32)
    seed = jnp.asarray([seed], jnp.int32)

    probs, sample = pl.pallas_call(
        _half_step_sample_kernel,
        grid=(Bp // block_m, Hp // block_n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, V), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        ),
    )(seed, t, vp, wp, bp)
    return probs[:B, :H], sample[:B, :H]


def hidden_probs_pallas(state, v: Array, T=1.0) -> Array:
    """Drop-in ``rbm_ops.hidden_probs`` using the Pallas kernel when the
    shapes fit VMEM, else the jnp path."""
    from multimodal_idbn_tpu.ops import rbm_ops

    B, V = v.shape
    H = state.w.shape[1]
    if not pallas_supported(B, V, H):
        return rbm_ops.hidden_probs(state, v, T)
    return half_step_probs(v, state.w, state.hb, T)


def reference_half_step(v: Array, w: Array, b: Array, T=1.0) -> Array:
    """jnp reference for kernel parity tests."""
    return jax.nn.sigmoid((v @ w + b) / jnp.maximum(1e-6, T))
