"""Free-energy diagnostics and IMG→TXT convergence tracing.

Mirror of reference imdbn/utils/energy_utils.py: free energy, vectorized
per-class free energies F_k(z), the deterministic "mean-field lite"
IMG→TXT step, fixed-validation-case caching, and the W&B logging helpers.

TPU-native redesign of the trace: the reference steps the chain in a
Python loop with an early ``break`` (energy_utils.py:144-167); here the
full fixed-length chain runs as one on-device ``lax.scan`` and the
convergence criterion is evaluated post-hoc on the recorded trajectory —
identical prefixes, one dispatch (SURVEY.md §5.7).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_idbn_tpu.utils.wandb_compat import wandb

from multimodal_idbn_tpu.models.rbm import as_array
from multimodal_idbn_tpu.ops import rbm_ops


def _state_of(rbm) -> rbm_ops.RBMState:
    return rbm.state if hasattr(rbm, "state") else rbm


def rbm_free_energy(rbm, v) -> jax.Array:
    """F(v) = −v·b_v − Σ_j softplus(b_h + vW)_j (reference
    energy_utils.py:19-28). Accepts an RBM shell or an RBMState."""
    return rbm_ops.free_energy(_state_of(rbm), as_array(v))


@partial(jax.jit, static_argnames=("K", "Dz"))
def _class_free_energies(state: rbm_ops.RBMState, z: jax.Array, *, K: int,
                         Dz: int) -> jax.Array:
    Wz = state.w[:Dz, :]                       # [Dz, H]
    Wy = state.w[Dz:Dz + K, :]                 # [K, H]
    bz = state.vb[:Dz]
    by = state.vb[Dz:Dz + K]
    z_bz = (z * bz[None, :]).sum(axis=1, keepdims=True)        # [B, 1]
    pre_h_base = z @ Wz + state.hb[None, :]                    # [B, H]
    pre_h_all = pre_h_base[:, None, :] + Wy[None, :, :]        # [B, K, H]
    term_hidden = jax.nn.softplus(pre_h_all).sum(axis=2)       # [B, K]
    return -(z_bz + by[None, :]) - term_hidden


def class_free_energies(joint_rbm, z_img_top, K: int, Dz: int) -> jax.Array:
    """F_k(z) = F([z, e_k]) for all classes, broadcast over K without a
    B×K visible blowup (reference energy_utils.py:32-53)."""
    return _class_free_energies(_state_of(joint_rbm), as_array(z_img_top),
                                K=K, Dz=Dz)


# ============================================================
# Deterministic IMG→TXT "mean-field lite" step (energy_utils.py:61-88)
# ============================================================

def _deterministic_img2txt_step_fn(state: rbm_ops.RBMState, v: jax.Array,
                                   Dz: int, K: int,
                                   softmax_y: bool = True) -> jax.Array:
    h_prob = jax.nn.sigmoid(v @ state.w + state.hb)
    v_prob = jax.nn.sigmoid(h_prob @ state.w.T + state.vb)
    v_next = v_prob.at[:, :Dz].set(v[:, :Dz])            # re-clamp z
    y = v_next[:, Dz:Dz + K]
    if softmax_y:
        # NOTE: the reference softmaxes the sigmoid *probabilities*, not
        # logits (energy_utils.py:77-79) — deliberate "lite" step.
        y = jax.nn.softmax(y, axis=1)
    else:
        y = jnp.clip(y, 1e-6, 1 - 1e-6)
    return v_next.at[:, Dz:Dz + K].set(y)


def _deterministic_img2txt_step(joint_rbm, v, Dz: int, K: int,
                                softmax_y: bool = True, sample_h: bool = False,
                                sample_v: bool = False,
                                key=None) -> jax.Array:
    """Public mirror of reference energy_utils.py:61-88. The stochastic
    branches (Bernoulli h, categorical y resampling) are implemented;
    they default off like the reference's callers."""
    import jax as _jax

    from multimodal_idbn_tpu.ops.sampling import (
        sample_bernoulli, sample_categorical_onehot)

    state = _state_of(joint_rbm)
    v = as_array(v)
    if not sample_h and not sample_v:
        return _deterministic_img2txt_step_fn(state, v, Dz, K, softmax_y)

    if key is None:
        key = (joint_rbm._next_key() if hasattr(joint_rbm, "_next_key")
               else _jax.random.key(0))
    kh, kv = _jax.random.split(key)
    h_prob = _jax.nn.sigmoid(v @ state.w + state.hb)
    h = sample_bernoulli(kh, h_prob) if sample_h else h_prob
    v_prob = _jax.nn.sigmoid(h @ state.w.T + state.vb)
    v_next = v_prob.at[:, :Dz].set(v[:, :Dz])
    y = v_next[:, Dz:Dz + K]
    if softmax_y:
        y = _jax.nn.softmax(y, axis=1)
    else:
        y = jnp.clip(y, 1e-6, 1 - 1e-6)
    if sample_v:  # categorical resampling of y (reference :83-85)
        y = sample_categorical_onehot(kv, y)
    return v_next.at[:, Dz:Dz + K].set(y)


@partial(jax.jit, static_argnames=("Dz", "K", "steps"))
def _img2txt_chain(state: rbm_ops.RBMState, z: jax.Array, *, Dz: int,
                   K: int, steps: int) -> jax.Array:
    """Full fixed-length y-trajectory [steps, B, K] as one scan."""
    B = z.shape[0]
    y0 = jnp.full((B, K), 1.0 / K, z.dtype)
    v0 = jnp.concatenate([z, y0], axis=1)

    def body(v, _):
        v = _deterministic_img2txt_step_fn(state, v, Dz, K, True)
        return v, v[:, Dz:Dz + K]

    _, ys = jax.lax.scan(body, v0, None, length=steps)
    return ys


def trace_single_img2txt(model, img, lbl_onehot=None, steps: int = 30,
                         eps_l1: float = 1e-3, stable_steps: int = 3,
                         gap_thresh: float = 0.25) -> dict:
    """Energy-based IMG→TXT convergence trace on one sample
    (reference energy_utils.py:96-195): how many mean-field steps until
    the label distribution stabilizes, with per-class free energies
    precomputed once (z is clamped so F_k(z) is constant).

    Returns the same dict schema as the reference, with trajectories
    truncated at the convergence step like the reference's early break.
    """
    joint = model.joint_rbm
    x = as_array(img)
    z = jnp.clip(model.image_idbn.represent(x), 1e-6, 1 - 1e-6)

    Dz = getattr(model, "Dz_img", z.shape[1])
    K = getattr(model, "num_labels",
                lbl_onehot.shape[1] if lbl_onehot is not None else 32)

    Fk = np.asarray(class_free_energies(joint, z, K, Dz))[0]   # [K]
    kstar = int(Fk.argmin())
    Fmin = float(Fk.min())
    top2 = np.sort(Fk)[:2]
    margin_energy = float(top2[1] - top2[0])

    ys = np.asarray(_img2txt_chain(_state_of(joint), z, Dz=Dz, K=K,
                                   steps=int(steps)))[:, 0, :]  # [steps, K]

    gt = (int(np.argmax(np.asarray(lbl_onehot), axis=1)[0])
          if lbl_onehot is not None else None)

    # Post-hoc convergence scan (identical to the reference's in-loop
    # criterion, energy_utils.py:144-167).
    p_top1, p_top2, p_gap, p_gt, deltaF = [], [], [], [], []
    y_prev = np.full(K, 1.0 / K, np.float32)
    pred_cur = int(y_prev.argmax())
    streak = 0
    steps_to_conv = steps + 1
    t_stop = steps
    for t in range(1, steps + 1):
        y = ys[t - 1]
        srt = np.sort(y)[::-1]
        p1, p2 = float(srt[0]), float(srt[1]) if K > 1 else 0.0
        gap = p1 - p2
        p_top1.append(p1)
        p_top2.append(p2)
        p_gap.append(gap)
        if gt is not None:
            p_gt.append(float(y[gt]))
        pred_new = int(y.argmax())
        streak = streak + 1 if pred_new == pred_cur else 1
        pred_cur = pred_new
        deltaF.append(float(Fk[pred_cur] - Fmin))
        l1 = float(np.abs(y - y_prev).sum())
        if (l1 < eps_l1) and (streak >= stable_steps) and (
                pred_cur == kstar or gap >= gap_thresh):
            steps_to_conv = t
            t_stop = t
            break
        y_prev = y

    p_top1, p_top2, p_gap = p_top1[:t_stop], p_top2[:t_stop], p_gap[:t_stop]
    deltaF = deltaF[:t_stop]
    fe_probs = np.exp(-Fk - np.max(-Fk))
    fe_probs = fe_probs / fe_probs.sum()
    fe_sorted = np.sort(fe_probs)[::-1]

    return {
        "deltaF_pred_traj": deltaF,
        "deltaF_pred_final": deltaF[-1] if deltaF else None,
        "p_top1": p_top1,
        "p_top2": p_top2,
        "p_gap": p_gap,
        "p_gt": p_gt if gt is not None else None,
        "p_top1_final": p_top1[-1] if p_top1 else float(1.0 / K),
        "p_gap_final": p_gap[-1] if p_gap else 0.0,
        "fe_top1_final": float(fe_sorted[0]),
        "fe_gap_final": float(fe_sorted[0] - fe_sorted[1]) if K > 1 else 0.0,
        "steps_to_converge": steps_to_conv,
        "kstar": kstar,
        "predT": pred_cur,
        "margin_energy": margin_energy,
        "gt": gt,
    }


# ============================================================
# Fixed validation case (energy_utils.py:203-245)
# ============================================================

def pick_fixed_val_case(model, target_label: Optional[int] = None,
                        within_batch_index: int = 0):
    """Pick one val (img, onehot) pair and cache it on
    ``model._fixed_val_case`` so every epoch traces the same sample
    (reference energy_utils.py:203-236)."""
    if getattr(model, "_fixed_val_case", None) is not None:
        return model._fixed_val_case
    if model.val_loader is None:
        raise RuntimeError("model.val_loader is None")

    chosen_img, chosen_lbl = None, None
    if target_label is None:
        for imgs, lbls in model.val_loader:
            chosen_img = np.asarray(imgs)[within_batch_index:
                                          within_batch_index + 1]
            chosen_lbl = np.asarray(lbls)[within_batch_index:
                                          within_batch_index + 1]
            break
    else:
        for imgs, lbls in model.val_loader:
            idx = np.nonzero(np.asarray(lbls).argmax(axis=1)
                             == target_label)[0]
            if idx.size > 0:
                i0 = int(idx[0])
                chosen_img = np.asarray(imgs)[i0:i0 + 1]
                chosen_lbl = np.asarray(lbls)[i0:i0 + 1]
                break
        if chosen_img is None:
            imgs, lbls = next(iter(model.val_loader))
            chosen_img = np.asarray(imgs)[:1]
            chosen_lbl = np.asarray(lbls)[:1]

    model._fixed_val_case = (chosen_img, chosen_lbl)
    return chosen_img, chosen_lbl


def pick_val_case(model, target_label: Optional[int] = None,
                  batch_idx: int = 0, within_batch_index: int = 0):
    """Backwards-compatible alias (reference energy_utils.py:240-245)."""
    del batch_idx
    return pick_fixed_val_case(model, target_label=target_label,
                               within_batch_index=within_batch_index)


# ============================================================
# W&B logging (energy_utils.py:253-324)
# ============================================================

def log_single_case_energy(model, case_dict: dict, epoch: int,
                           tag: str = "fixed_case"):
    """ΔF_pred(t) + confidence curves + summary (reference
    energy_utils.py:253-304)."""
    if getattr(model, "wandb_run", None) is None or wandb is None:
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if case_dict.get("deltaF_pred_traj"):
        fig1, ax1 = plt.subplots(figsize=(5, 3))
        xs = range(1, 1 + len(case_dict["deltaF_pred_traj"]))
        ax1.plot(xs, case_dict["deltaF_pred_traj"])
        ax1.set_xlabel("step")
        ax1.set_ylabel("dF_pred = F_yhat - F_min")
        ax1.set_title("Label energy (IMG->TXT)")
        model.wandb_run.log({f"case/{tag}/deltaF_pred_vs_steps":
                             wandb.Image(fig1), "epoch": epoch})
        plt.close(fig1)

    if case_dict.get("p_top1") and case_dict.get("p_top2"):
        fig2, ax2 = plt.subplots(figsize=(5, 3))
        ax2.plot(range(1, 1 + len(case_dict["p_top1"])),
                 case_dict["p_top1"], label="p_top1")
        ax2.plot(range(1, 1 + len(case_dict["p_top2"])),
                 case_dict["p_top2"], label="p_top2")
        if case_dict.get("p_gt"):
            ax2.plot(range(1, 1 + len(case_dict["p_gt"])),
                     case_dict["p_gt"], label="p(y_true)", linestyle="--")
        ax2.set_ylim(0, 1)
        ax2.set_xlabel("step")
        ax2.set_ylabel("probability")
        ax2.set_title("Confidence over time (IMG->TXT)")
        ax2.legend()
        model.wandb_run.log({f"case/{tag}/p_curves": wandb.Image(fig2),
                             "epoch": epoch})
        plt.close(fig2)

    txt = {k: case_dict.get(k) for k in
           ("gt", "kstar", "predT", "steps_to_converge", "p_top1_final",
            "p_gap_final", "fe_top1_final", "fe_gap_final",
            "deltaF_pred_final", "margin_energy")}
    model.wandb_run.log({f"case/{tag}/summary": txt, "epoch": epoch})


def run_and_log_fixed_case(model, epoch: int,
                           target_label: Optional[int] = None,
                           within_batch_index: int = 0, steps: int = 30,
                           tag: str = "fixed") -> dict:
    """Trace the fixed case and log (reference energy_utils.py:312-324)."""
    img, lbl = pick_fixed_val_case(model, target_label=target_label,
                                   within_batch_index=within_batch_index)
    case = trace_single_img2txt(model, img, lbl, steps=steps)
    log_single_case_energy(model, case, epoch=epoch, tag=tag)
    return case
