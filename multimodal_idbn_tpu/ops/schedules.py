"""Annealing / learning-rate schedules.

Vectorized counterparts of the reference's per-step Python schedule
helpers (rbm.py:229-238, :194-195). Schedules are precomputed as length
``n_steps`` arrays so chains can run as one ``lax.scan`` over the schedule,
keeping the sequential dimension on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def lin_schedule(t, t_max: int, start, end):
    """Linear schedule from start to end over t_max steps (rbm.py:229-234).

    ``t`` may be a scalar or an array of step indices.
    """
    if t_max <= 1:
        return jnp.broadcast_to(jnp.asarray(end, dtype=jnp.float32), jnp.shape(t))
    alpha = jnp.clip(jnp.asarray(t, jnp.float32) / (t_max - 1), 0.0, 1.0)
    return jnp.asarray(start, jnp.float32) + (jnp.asarray(end, jnp.float32) - start) * alpha


def hot_steps(n_steps: int, hot_frac: float) -> int:
    """Number of 'hot' (stochastic) steps (rbm.py:236-238). Static python int."""
    return int(max(0, min(n_steps, round(hot_frac * n_steps))))


def steps_iota(n_steps: int) -> Array:
    return jnp.arange(n_steps, dtype=jnp.float32)


def annealed_temperature(n_steps: int, T0, T1, sharpen_last: int, T_cold_plus) -> Array:
    """Per-step temperature for ``noisy_meanfield_annealed`` (rbm.py:338-340).

    Linear T0→T1, except the last ``max(1, sharpen_last)`` steps which are
    pinned to ``T_cold_plus``.
    """
    t = steps_iota(n_steps)
    T = lin_schedule(t, n_steps, T0, T1)
    tail = max(1, int(sharpen_last))
    return jnp.where((n_steps - t) <= tail, jnp.asarray(T_cold_plus, jnp.float32), T)


def gibbs_annealed_temperature(n_steps: int, T0, T1) -> Array:
    """Per-step temperature for ``conditional_gibbs_annealed`` (rbm.py:276-279).

    Linear T0→T1; the last 3 steps are sharpened to ``min(0.9, T)``.
    """
    t = steps_iota(n_steps)
    T = lin_schedule(t, n_steps, T0, T1)
    return jnp.where((n_steps - t) <= 3, jnp.minimum(0.9, T), T)


def noise_sigma(n_steps: int, sigma0) -> Array:
    """Per-step logit-noise std: ``sigma0 * max(0, 1 - t/(n-1))`` (rbm.py:341)."""
    t = steps_iota(n_steps)
    return jnp.asarray(sigma0, jnp.float32) * jnp.maximum(0.0, 1.0 - t / max(1, n_steps - 1))


def mu_pull_eta(n_steps: int, eta0) -> Array:
    """Per-step μ-pull strength: ``eta0 * max(0, 1 - t/(n-1))`` (rbm.py:362)."""
    t = steps_iota(n_steps)
    return jnp.asarray(eta0, jnp.float32) * jnp.maximum(0.0, 1.0 - t / max(1, n_steps - 1))


def effective_lr(base_lr: float, epoch, dynamic_lr: bool):
    """``lr/(1+0.01*epoch)`` iff dynamic (rbm.py:194). Host-side helper."""
    if dynamic_lr:
        return base_lr / (1.0 + 0.01 * epoch)
    return base_lr


def effective_momentum(momentum: float, final_momentum: float, epoch):
    """Initial momentum through epoch 5, then final (rbm.py:195)."""
    return momentum if epoch <= 5 else final_momentum
