"""RBM object shell: the reference-compatible API over the functional core.

The class mirrors the reference's ``RBM`` surface (reference
imdbn/models/rbm.py:24-483) — same constructor signature, method names,
and attribute names (``W``, ``hid_bias``, ``vis_bias``, ``W_m`` …) because
downstream adapters poke those attributes (INTEGRATION_PROMPT.md:90-247).

All math lives in :mod:`multimodal_idbn_tpu.ops.rbm_ops` as pure jitted
functions; this shell only (a) owns the :class:`RBMState` pytree and a
threefry key, (b) converts inputs, and (c) dispatches to the compiled
kernels. Unlike the reference there is no per-step host loop anywhere —
every chain is a single device computation.
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_idbn_tpu.ops import rbm_ops, sampling
from multimodal_idbn_tpu.ops.schedules import effective_lr, effective_momentum

Array = jax.Array

# ---------------------------------------------------------------------------
# Global seeding
# ---------------------------------------------------------------------------

_GLOBAL_SEED = 0
_instance_counter = itertools.count()


def set_global_seed(seed: int) -> None:
    """Set the base seed used by objects constructed without an explicit key."""
    global _GLOBAL_SEED
    _GLOBAL_SEED = int(seed)


def _fresh_key(seed: Optional[int]) -> Array:
    if seed is None:
        seed = _GLOBAL_SEED + next(_instance_counter)
    return jax.random.key(int(seed))


def param_dtype(params: dict):
    """Storage dtype from a params dict: ``DTYPE`` ∈ {"float32",
    "bfloat16"} (framework extension; default float32 = reference
    semantics)."""
    name = str((params or {}).get("DTYPE", "float32")).lower()
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float32", "f32", "fp32"):
        return jnp.float32
    raise ValueError(f"unsupported DTYPE {name!r} (float32 | bfloat16)")


def param_compute_dtype(params: dict):
    """Mixed-precision compute dtype from a params dict:
    ``COMPUTE_DTYPE`` ∈ {None/"float32", "bfloat16"}.

    Framework extension: f32 master weights with the Gibbs-chain GEMMs
    streaming a bf16 weight copy (``rbm_ops.compute_cast``). Unlike
    ``DTYPE="bfloat16"`` storage — which measurably collapses flagship
    quality because bf16 swallows the small CD increments
    (benchmarks/RESULTS.md round-2 bf16 study) — mixed precision keeps
    the update math in f32. Default None = bit-exact reference path.
    """
    name = (params or {}).get("COMPUTE_DTYPE", None)
    if name is None:
        return None
    name = str(name).lower()
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float32", "f32", "fp32", "none"):
        return None
    raise ValueError(
        f"unsupported COMPUTE_DTYPE {name!r} (float32 | bfloat16)")


def param_sr(params: dict):
    """Stochastic-rounding override from a params dict: ``SR`` ∈
    {None/"auto", True, False} (YAML ``training.stochastic_rounding``).

    ``None`` keeps the ops-layer auto rule — SR ON whenever the storage
    dtype is bfloat16 (nearest-rounded bf16 updates are the measured
    flagship-quality collapse, ops/rbm_ops.stochastic_round). ``False``
    forces the legacy biased epilogue (ablation), ``True`` forces SR on.
    """
    val = (params or {}).get("SR", None)
    if val is None or (isinstance(val, str)
                       and val.lower() in ("auto", "none", "")):
        return None
    if isinstance(val, bool):
        return val
    if isinstance(val, str):
        if val.lower() in ("true", "on", "1", "yes"):
            return True
        if val.lower() in ("false", "off", "0", "no"):
            return False
    raise ValueError(f"unsupported SR {val!r} (auto | true | false)")


def _warn_compute_dtype_joint(params: dict, family: str) -> None:
    """LOG-ONLY notice at multimodal construction when COMPUTE_DTYPE is
    set: mixed precision applies to the modality iDBN stacks only — the
    joint layers train at the storage dtype (mixed precision is a
    documented-negative opt-in, benchmarks/RESULTS.md round-2 study, so
    the joint path intentionally stays bit-exact). Without this note a
    config setting ``training.compute_dtype: bfloat16`` would silently
    apply to half the model and mis-attribute any precision effect."""
    if param_compute_dtype(params) is not None:
        print(f"[{family}] warn/compute_dtype_joint: COMPUTE_DTYPE "
              f"applies to the modality iDBN stacks only; the joint "
              f"layers train at the storage dtype "
              f"({param_dtype(params).__name__}).")


def as_array(x, dtype=jnp.float32) -> Array:
    """Convert numpy / jax / torch-CPU inputs to a 2-D float device array."""
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    x = jnp.asarray(x, dtype=dtype)
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    return x


# ---------------------------------------------------------------------------
# Jitted entry points (cached per static-argument combination)
# ---------------------------------------------------------------------------

_hidden_probs = jax.jit(rbm_ops.hidden_probs)
_visible_logits = jax.jit(rbm_ops.visible_logits)
_visible_probs = jax.jit(rbm_ops.visible_probs, static_argnames=("groups",))
_free_energy = jax.jit(rbm_ops.free_energy)
_sample_visible = jax.jit(sampling.sample_visible, static_argnames=("groups",))
_gibbs_step = jax.jit(rbm_ops.gibbs_step,
                      static_argnames=("sample_h", "sample_v", "groups"))
_cd_update = jax.jit(rbm_ops.cd_update,
                     static_argnames=("cd", "sparsity", "groups", "sr"))
_clamped_cd_update = jax.jit(
    rbm_ops.clamped_cd_update,
    static_argnames=("cd", "cond_init_steps", "sample_h", "sample_v",
                     "reclamp_negative", "use_noisy_init", "groups",
                     "sr"))
_conditional_gibbs = jax.jit(
    rbm_ops.conditional_gibbs,
    static_argnames=("n_steps", "sample_h", "sample_v", "groups"))
_conditional_gibbs_annealed = jax.jit(
    rbm_ops.conditional_gibbs_annealed,
    static_argnames=("n_steps", "sample_h_until", "sample_v_every",
                     "final_meanfield", "groups"))
_noisy_meanfield_annealed = jax.jit(
    rbm_ops.noisy_meanfield_annealed,
    static_argnames=("n_steps", "sigma0", "hot_frac", "sharpen_last",
                     "groups"))


class RBM:
    """Restricted Boltzmann Machine with Bernoulli units and softmax groups.

    TPU-native re-design of reference rbm.py:24; see module docstring.

    Args mirror the reference (rbm.py:41-53). Extra keyword ``seed`` fixes
    this instance's threefry stream (runs reproduce across chip counts).
    """

    def __init__(
        self,
        num_visible: int,
        num_hidden: int,
        learning_rate: float,
        weight_decay: float,
        momentum: float,
        dynamic_lr: bool = False,
        final_momentum: float = 0.97,
        sparsity: bool = False,
        sparsity_factor: float = 0.05,
        softmax_groups: Optional[List[Tuple[int, int]]] = None,
        seed: Optional[int] = None,
        dtype=None,
        sr=None,
    ):
        self.num_visible = int(num_visible)
        self.num_hidden = int(num_hidden)
        self.lr = float(learning_rate)
        self.weight_decay = float(weight_decay)
        self.momentum = float(momentum)
        self.dynamic_lr = bool(dynamic_lr)
        self.final_momentum = float(final_momentum)
        self.sparsity = bool(sparsity)
        self.sparsity_factor = float(sparsity_factor)
        self.softmax_groups = [tuple(g) for g in (softmax_groups or [])]
        # Stochastic-rounding override (None = auto-on for bf16 storage;
        # see param_sr). Static at trace time.
        self.sr = sr

        self._key = _fresh_key(seed)
        self._key, init_key = jax.random.split(self._key)
        # dtype: storage precision (framework extension; bfloat16 halves
        # the HBM traffic the CD epoch is bound on, see tests/test_bf16.py
        # and bench.py's bf16 variant). Default f32 = reference semantics.
        self._state = rbm_ops.init_rbm_state(
            init_key, self.num_visible, self.num_hidden,
            dtype=dtype or jnp.float32)
        # μ-pull side channel kept for reference API compat (rbm.py:359).
        self._mu_pull = None

    # -- state plumbing ----------------------------------------------------

    @property
    def state(self) -> rbm_ops.RBMState:
        return self._state

    @state.setter
    def state(self, s: rbm_ops.RBMState) -> None:
        self._state = s

    def _groups(self) -> sampling.SoftmaxGroups:
        return tuple(tuple(g) for g in getattr(self, "softmax_groups", []) or [])

    def _next_key(self) -> Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _replace(self, **kw):
        self._state = self._state._replace(**kw)

    # Reference attribute surface (INTEGRATION_PROMPT.md:90-247).
    @property
    def W(self) -> Array:
        return self._state.w

    @W.setter
    def W(self, value) -> None:
        self._replace(w=jnp.asarray(value, self._state.w.dtype))

    @property
    def hid_bias(self) -> Array:
        return self._state.hb

    @hid_bias.setter
    def hid_bias(self, value) -> None:
        self._replace(hb=jnp.asarray(value, self._state.hb.dtype))

    @property
    def vis_bias(self) -> Array:
        return self._state.vb

    @vis_bias.setter
    def vis_bias(self, value) -> None:
        self._replace(vb=jnp.asarray(value, self._state.vb.dtype))

    @property
    def W_m(self) -> Array:
        return self._state.w_m

    @W_m.setter
    def W_m(self, value) -> None:
        self._replace(w_m=jnp.asarray(value, jnp.float32))

    @property
    def hb_m(self) -> Array:
        return self._state.hb_m

    @hb_m.setter
    def hb_m(self, value) -> None:
        self._replace(hb_m=jnp.asarray(value, jnp.float32))

    @property
    def vb_m(self) -> Array:
        return self._state.vb_m

    @vb_m.setter
    def vb_m(self, value) -> None:
        self._replace(vb_m=jnp.asarray(value, jnp.float32))

    def reset_momentum(self) -> None:
        """Zero the momentum buffers (done by the reference on load,
        imdbn.py:329-331)."""
        self._replace(w_m=jnp.zeros_like(self._state.w),
                      hb_m=jnp.zeros_like(self._state.hb),
                      vb_m=jnp.zeros_like(self._state.vb))

    def to(self, device=None):  # noqa: D401 - API compat
        """No-op device move for reference API compatibility (arrays are
        already device-resident under JAX)."""
        return self

    # -- conditionals --------------------------------------------------------

    def forward(self, v, T: float = 1.0) -> Array:
        """p(h|v) with temperature (reference rbm.py:81-92)."""
        return _hidden_probs(self._state, as_array(v), T)

    def __call__(self, v, T: float = 1.0) -> Array:
        return self.forward(v, T=T)

    def _visible_logits(self, h, T: float = 1.0) -> Array:
        return _visible_logits(self._state, as_array(h), T)

    def visible_probs(self, h, T: float = 1.0) -> Array:
        """p(v|h) with softmax groups (reference rbm.py:98-116)."""
        return _visible_probs(self._state, as_array(h), T,
                              groups=self._groups())

    def sample_visible(self, v_prob) -> Array:
        """Sample v ~ p(v|h) respecting softmax groups (rbm.py:118-135)."""
        return _sample_visible(self._next_key(), as_array(v_prob),
                               groups=self._groups())

    def backward(self, h, return_logits: bool = False) -> Array:
        """Decoder-compatible p(v|h) (reference rbm.py:137-151)."""
        if return_logits:
            return self._visible_logits(h)
        return self.visible_probs(h)

    def backward_sample(self, h) -> Array:
        return self.sample_visible(self.visible_probs(h))

    def gibbs_step(self, v, sample_h: bool = True, sample_v: bool = True):
        """One v→h→v' step; returns (v_next, v_prob, h, h_prob)
        (rbm.py:159-178)."""
        return _gibbs_step(self._state, self._next_key(), as_array(v),
                           sample_h=sample_h, sample_v=sample_v,
                           groups=self._groups())

    def free_energy(self, v) -> Array:
        """F(v) = −v·b_v − Σ softplus(b_h + vW) (energy_utils.py:19-28).

        The reference never attaches this to RBM (SURVEY.md §2.1(10)); we
        provide the real implementation. Cross-modal best-of-K selection
        reproduces the reference's degenerate behavior unless explicitly
        enabled (see ``iMDBN``'s ``reference_best_of_k_bug`` flag).
        """
        return _free_energy(self._state, as_array(v))

    # -- schedules (host helpers, kept for API parity rbm.py:229-238) -------

    def _lin_schedule(self, t, t_max, start, end):
        if t_max <= 1:
            return float(end)
        alpha = min(max(t / (t_max - 1), 0.0), 1.0)
        return float(start + (end - start) * alpha)

    def _hot_steps(self, n_steps, hot_frac):
        return int(max(0, min(n_steps, round(hot_frac * n_steps))))

    # -- training ------------------------------------------------------------

    def train_epoch(self, data, epoch: int, max_epochs: int, CD: int = 1):
        """One CD-k update on a batch; returns reconstruction MSE
        (reference rbm.py:181-227; exact semantics in SURVEY.md §2.1(3))."""
        lr = effective_lr(self.lr, epoch, self.dynamic_lr)
        mom = effective_momentum(self.momentum, self.final_momentum, epoch)
        self._state, loss = _cd_update(
            self._state, self._next_key(), as_array(data),
            lr=lr, mom=mom, weight_decay=self.weight_decay, cd=int(CD),
            sparsity=self.sparsity, sparsity_factor=self.sparsity_factor,
            groups=self._groups(), sr=self.sr)
        return loss

    def train_epoch_clamped(self, v_known, known_mask, epoch: int,
                            max_epochs: int, CD: int = 1,
                            cond_init_steps: int = 50, sample_h: bool = True,
                            sample_v: bool = False,
                            reclamp_negative: bool = True,
                            aux_lr_mult: float = 0.3,
                            use_noisy_init: bool = True):
        """Auxiliary clamped-CD update (reference rbm.py:402-483)."""
        lr = effective_lr(self.lr, epoch, self.dynamic_lr)
        mom = effective_momentum(self.momentum, self.final_momentum, epoch)
        mu = self._mu_pull
        mu_k = None if mu is None else as_array(mu["mu_k"])
        eta0 = 0.15 if mu is None else float(mu.get("eta0", 0.15))
        self._state, loss = _clamped_cd_update(
            self._state, self._next_key(), as_array(v_known),
            as_array(known_mask), lr=lr, mom=mom,
            weight_decay=self.weight_decay, cd=int(CD),
            cond_init_steps=int(cond_init_steps), sample_h=sample_h,
            sample_v=sample_v, reclamp_negative=reclamp_negative,
            aux_lr_mult=aux_lr_mult, use_noisy_init=use_noisy_init,
            mu_k=mu_k, eta0=eta0, groups=self._groups(), sr=self.sr)
        return loss

    # -- conditional inference ------------------------------------------------

    def conditional_gibbs(self, v_known, known_mask, n_steps: int = 30,
                          sample_h: bool = False,
                          sample_v: bool = False) -> Array:
        """Plain conditional Gibbs chain (reference rbm.py:369-400).

        With ``config.enable_pallas_chain(True)`` the mean-field case
        (sample_h=sample_v=False) runs the VMEM-chain Pallas kernel when
        the shape fits (bit-comparable semantics: same init stream,
        deterministic chain); otherwise the jnp scan path.
        """
        v_known = as_array(v_known)
        if (not sample_h and not sample_v
                and self._pallas_chain_ok(v_known.shape[0])):
            from multimodal_idbn_tpu.ops import pallas_chain
            return pallas_chain.conditional_gibbs_fast(
                self._state, self._next_key(), v_known,
                as_array(known_mask), n_steps=int(n_steps),
                groups=self._groups())
        return _conditional_gibbs(
            self._state, self._next_key(), v_known,
            as_array(known_mask), n_steps=int(n_steps), sample_h=sample_h,
            sample_v=sample_v, groups=self._groups())

    def _pallas_chain_ok(self, batch: int) -> bool:
        from multimodal_idbn_tpu import config as _config
        if not _config.pallas_chain_enabled():
            return False
        from multimodal_idbn_tpu.ops import pallas_chain
        return pallas_chain.chain_kernel_supported(
            int(batch), self.num_visible, self.num_hidden)

    def conditional_gibbs_annealed(self, v_known, known_mask,
                                   n_steps: int = 40, T0: float = 2.5,
                                   T1: float = 1.0, sample_h_until: int = 20,
                                   sample_v_every: int = 0,
                                   final_meanfield: bool = True) -> Array:
        """Annealed conditional Gibbs (reference rbm.py:240-298)."""
        return _conditional_gibbs_annealed(
            self._state, self._next_key(), as_array(v_known),
            as_array(known_mask), n_steps=int(n_steps), T0=T0, T1=T1,
            sample_h_until=int(sample_h_until),
            sample_v_every=int(sample_v_every),
            final_meanfield=final_meanfield, groups=self._groups())

    def noisy_meanfield_annealed(self, v_known, known_mask,
                                 n_steps: int = 72, T0: float = 3.0,
                                 T1: float = 1.0, sigma0: float = 0.9,
                                 hot_frac: float = 0.7,
                                 sharpen_last: int = 3,
                                 T_cold_plus: float = 0.9) -> Array:
        """Noisy mean-field annealing with μ-pull (reference rbm.py:300-367).

        μ-pull is read from ``self._mu_pull`` ({"mu_k": [B,Dz], "eta0": η})
        to match the reference's side-channel API (rbm.py:359-363).
        """
        mu = self._mu_pull
        mu_k = None if mu is None else as_array(mu["mu_k"])
        eta0 = 0.15 if mu is None else float(mu.get("eta0", 0.15))
        v_known = as_array(v_known)
        if self._pallas_chain_ok(v_known.shape[0]):
            # Distributional parity: same schedules, Gaussian logit noise
            # from the on-core PRNG instead of the threefry stream.
            from multimodal_idbn_tpu.ops import pallas_chain
            return pallas_chain.noisy_meanfield_fast(
                self._state, self._next_key(), v_known,
                as_array(known_mask), n_steps=int(n_steps), T0=T0, T1=T1,
                sigma0=float(sigma0), sharpen_last=int(sharpen_last),
                T_cold_plus=T_cold_plus, mu_k=mu_k, eta0=eta0,
                groups=self._groups())
        return _noisy_meanfield_annealed(
            self._state, self._next_key(), v_known,
            as_array(known_mask), n_steps=int(n_steps), T0=T0, T1=T1,
            sigma0=float(sigma0), hot_frac=float(hot_frac),
            sharpen_last=int(sharpen_last), T_cold_plus=T_cold_plus,
            mu_k=mu_k, eta0=eta0, groups=self._groups())

    # -- pickling (numpy-backed so checkpoints are framework-portable) -------

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_state"] = tuple(np.asarray(x) for x in self._state)
        d["_key"] = np.asarray(jax.random.key_data(self._key))
        d["_mu_pull"] = None
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self._state = rbm_ops.RBMState(*(jnp.asarray(x, jnp.float32)
                                         for x in d["_state"]))
        self._key = jax.random.wrap_key_data(jnp.asarray(d["_key"]))

    def __repr__(self):
        return (f"RBM(num_visible={self.num_visible}, "
                f"num_hidden={self.num_hidden}, "
                f"softmax_groups={self.softmax_groups})")
