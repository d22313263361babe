"""Sampling primitives for Bernoulli/softmax-group RBM units.

TPU-native counterparts of the reference's elementwise samplers
(reference: imdbn/models/rbm.py:118-135, :125 ``(p > rand)``), built on
JAX's counter-based threefry PRNG so every draw is keyed on logical
coordinates and is invariant to device count / sharding.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
# Static (start, end) index pairs delimiting categorical blocks in the
# visible layer (reference rbm.py:66 ``softmax_groups``).
SoftmaxGroups = Tuple[Tuple[int, int], ...]


def sample_bernoulli(key: Array, p: Array) -> Array:
    """Elementwise Bernoulli sample, matching reference ``(p > rand)``.

    Reference: rbm.py:125, :175, :203, :208 all use strict ``>`` against
    U(0,1); we reproduce that exactly (ties at p==u give 0).
    """
    u = jax.random.uniform(key, p.shape, dtype=p.dtype)
    return (p > u).astype(p.dtype)


def sample_categorical_onehot(key: Array, probs: Array) -> Array:
    """Sample one-hot rows from per-row categorical distributions.

    Matches reference rbm.py:130-133: probs are clamped to [1e-8, 1]
    before sampling, and the output block is written as a one-hot.
    Uses Gumbel-max over log-probabilities (distributionally identical).
    """
    logp = jnp.log(jnp.clip(probs, 1e-8, 1.0))
    idx = jax.random.categorical(key, logp, axis=-1)
    return jax.nn.one_hot(idx, probs.shape[-1], dtype=probs.dtype)


def apply_softmax_groups(v_prob: Array, logits: Array, groups: SoftmaxGroups) -> Array:
    """Overwrite categorical blocks of ``v_prob`` with softmax of ``logits``.

    Reference rbm.py:109-116: p(v|h) is sigmoid of the (temperature-scaled)
    logits, except inside each softmax group where it is the softmax of the
    same scaled logits. Group bounds are compile-time constants, so these
    are static slices (XLA fuses them into the surrounding elementwise op).
    """
    for s, e in groups:
        v_prob = v_prob.at[:, s:e].set(jax.nn.softmax(logits[:, s:e], axis=-1))
    return v_prob


def sample_visible(key: Array, v_prob: Array, groups: SoftmaxGroups) -> Array:
    """Sample v ~ p(v|h) respecting softmax groups (reference rbm.py:118-135).

    Bernoulli units sample elementwise; each softmax group is re-sampled
    categorically and written as a one-hot block.
    """
    v = sample_bernoulli(key, v_prob)
    for gi, (s, e) in enumerate(groups):
        gkey = jax.random.fold_in(key, gi + 1)
        v = v.at[:, s:e].set(sample_categorical_onehot(gkey, v_prob[:, s:e]))
    return v


def clamp_mask(v_new: Array, v_known: Array, known_mask: Array) -> Array:
    """Re-clamp known coordinates: ``v_new*(1-m) + v_known*m`` (rbm.py:291)."""
    return v_new * (1.0 - known_mask) + v_known * known_mask


def group_mask(num_visible: int, groups: Sequence[Tuple[int, int]], dtype=jnp.float32) -> Array:
    """1 on coordinates covered by any softmax group, else 0 (helper)."""
    m = jnp.zeros((num_visible,), dtype=dtype)
    for s, e in groups:
        m = m.at[s:e].set(1.0)
    return m
