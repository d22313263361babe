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


# ---------------------------------------------------------------------------
# K-tiled fused half-step + sample: handles arbitrary contraction dims
# (the flagship V=10000 image layer), unlike the VMEM-resident kernels
# above. Grid (B/bm, H/bn, V/bk); the accumulator lives in VMEM scratch
# and the in-kernel PRNG draw happens once, on the last k step.
# ---------------------------------------------------------------------------

def _make_half_step_sample_acc_kernel(transpose_w: bool):
    """K-tiled fused half-step kernel body. With ``transpose_w`` the w
    block arrives as the (block_n, block_k) slice of the ORIGINAL [V, H]
    weights and is transposed on the MXU — so the visible direction
    (h @ Wᵀ) reuses the same padded W buffer with no host-side
    transpose/pad per call."""

    def kernel(seed_ref, t_ref, v_ref, w_ref, b_ref, probs_ref,
               sample_ref, acc_ref):
        k = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # bf16 operands + f32 accumulation = XLA's DEFAULT f32-matmul
        # precision on this MXU (CLAUDE.md); f32×f32 dots take multiple
        # MXU passes and measured ~2x slower than the jnp path. Precision
        # must be pinned to DEFAULT explicitly: under the test suite's
        # jax_default_matmul_precision="highest" a bf16×bf16 dot lowers
        # to an fp32-contract tpu.matmul that Mosaic rejects ("Bad lhs
        # type").
        w = w_ref[:].T if transpose_w else w_ref[:]
        acc_ref[:] += jax.lax.dot_general(
            v_ref[:].astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

        @pl.when(k == nk - 1)
        def _finish():
            i = pl.program_id(0)
            j = pl.program_id(1)
            linear_id = i * pl.num_programs(1) + j
            # 64-bit per-half-step key (two threefry-derived int32 words;
            # Mosaic allows at most 2 seed words). The tile id is mixed
            # MULTIPLICATIVELY into word 2 (odd constant -> bijective,
            # adjacent tiles differ across high bits), so cross-call
            # uniform-block reuse needs a ~2^64 collision, not a 2^32
            # birthday, and tiles within a call are decorrelated.
            pltpu.prng_seed(seed_ref[0],
                            seed_ref[1]
                            ^ (linear_id * jnp.int32(-1640531527)))
            logits = (acc_ref[:] + b_ref[0, :]) / jnp.maximum(1e-6,
                                                              t_ref[0])
            p = jax.nn.sigmoid(logits)
            probs_ref[:] = p
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            u = pltpu.bitcast(bits >> 8, jnp.int32).astype(
                jnp.float32) * (1.0 / (1 << 24))
            sample_ref[:] = (p > u).astype(jnp.float32)

    return kernel


def half_step_sample_aligned(v: Array, w: Array, b: Array, seed, T=1.0, *,
                             transpose_w: bool = False,
                             block_m: int = 128, block_n: int = 256,
                             block_k: int = 512):
    """Fused (probs, sample) half-step on PRE-ALIGNED operands.

    ``v [B, K]``, ``b [N]`` and ``w`` ([K, N], or [N, K] with
    ``transpose_w``) must already be padded to the block multiples —
    the caller pads W ONCE per update and reuses it for all 2·cd+1
    half-steps in both directions (padding per call was measured to
    swamp the sampling savings). Returns padded (probs, sample) [B, N].
    """
    B, K = v.shape
    N = b.shape[0]
    assert B % block_m == 0 and K % block_k == 0 and N % block_n == 0, (
        (B, K, N))
    t = jnp.asarray([T], jnp.float32)
    # 64-bit kernel key: (2,) int32. A scalar seed is zero-extended.
    seed = jnp.atleast_1d(jnp.asarray(seed, jnp.int32)).reshape(-1)
    if seed.size == 1:
        seed = jnp.concatenate([seed, jnp.zeros(1, jnp.int32)])
    if transpose_w:
        w_spec = pl.BlockSpec((block_n, block_k), lambda i, j, k: (j, k),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                              memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_half_step_sample_acc_kernel(transpose_w),
        grid=(B // block_m, N // block_n, K // block_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )(seed, t, v, w, b.reshape(1, N))


@functools.partial(jax.jit,
                   static_argnames=("block_m", "block_n", "block_k"))
def half_step_sample_big(v: Array, w: Array, b: Array, seed, T=1.0, *,
                         block_m: int = 128, block_n: int = 256,
                         block_k: int = 512):
    """Fused (probs, Bernoulli sample) half-step with k-tiled contraction.

    Same contract as ``half_step_sample`` but streams W in (bk, bn) tiles
    with a VMEM accumulator, so any (B, V, H) works — including the
    flagship [128, 10000] x [10000, 1500] layer where the CD-10 epoch is
    sampling-bound (benchmarks/RESULTS.md round-2 RNG study). The uniform
    draw comes from the on-core PRNG (deterministic per (seed, grid
    cell), distributionally — not bitwise — equal to threefry). The GEMM
    runs at bf16-operand/f32-accumulate MXU precision — the same as
    XLA's DEFAULT f32-matmul lowering on this hardware, so probs match
    production jnp half-steps, not the "highest"-precision ones the
    numerical test suite pins.

    Standalone convenience wrapper: pads per call. The CD trainer uses
    ``half_step_sample_aligned`` + one pad per update instead
    (``ops/pallas_cd.py``) — per-call W padding measurably dominates.
    """
    B, V = v.shape
    H = w.shape[1]
    Bp = _ceil_to(B, block_m)
    Hp = _ceil_to(H, block_n)
    Vp = _ceil_to(V, block_k)
    vp = jnp.pad(v.astype(jnp.float32), ((0, Bp - B), (0, Vp - V)))
    wp = jnp.pad(w.astype(jnp.float32), ((0, Vp - V), (0, Hp - H)))
    bp = jnp.pad(b.astype(jnp.float32), (0, Hp - H))
    probs, sample = half_step_sample_aligned(
        vp, wp, bp, seed, T, transpose_w=False, block_m=block_m,
        block_n=block_n, block_k=block_k)
    return probs[:B, :H], sample[:B, :H]


def sampled_cd_supported() -> bool:
    """The k-tiled sampled-CD kernels need a TPU backend (the Mosaic
    PRNG has no CPU interpret mode)."""
    return HAS_PALLAS and jax.default_backend() in ("tpu", "axon")
