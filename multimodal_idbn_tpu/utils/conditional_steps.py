"""Cross-modal convergence tracing (steps-to-converge, no free energy).

Mirror of reference imdbn/utils/conditional_steps.py: same public
functions, convergence criteria (``eps_l1=1e-3, stable_steps=3,
gap_thresh=0.25`` for IMG→TXT, reference :46-49,:107; Δz-L2 + MSE patience
for TXT→IMG, :217-230), W&B keys, and panel statistics (p50/p95 + "NC"
histogram bin).

TPU-native redesign: the reference steps each chain one Python iteration
at a time, per sample (conditional_steps.py:83-111, :497-517 loops over a
~128-sample panel serially). Here chains are batched over the whole panel
and run as ONE fixed-length on-device scan; convergence criteria are then
evaluated post-hoc on the recorded trajectories — identical statistics,
two dispatches per panel instead of thousands.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_idbn_tpu.utils.wandb_compat import wandb

from multimodal_idbn_tpu.models.rbm import as_array
from multimodal_idbn_tpu.ops import dbn_train, rbm_ops
from multimodal_idbn_tpu.ops.sampling import clamp_mask, sample_bernoulli, sample_visible


def _gibbs_conditional_step(rbm, v, v_known, known_mask, sample_h=False,
                            sample_v=False):
    """One conditional Gibbs step aligned with ``conditional_gibbs``'s body,
    re-clamping to the ORIGINAL known values (reference
    conditional_steps.py:16-34). Returns (v_next, v_prob).

    Kept as a public mirror of the reference helper for API parity; the
    batched panel chains (_img2txt_panel_chain / _txt2img_panel_chain)
    fuse the same step inside jitted scans rather than calling this
    per-step host function.
    """
    state = rbm.state if hasattr(rbm, "state") else rbm
    groups = tuple(tuple(g) for g in getattr(rbm, "softmax_groups", []) or [])
    key = rbm._next_key() if hasattr(rbm, "_next_key") else jax.random.key(0)
    kh, kv = jax.random.split(key)
    h_prob = rbm_ops.hidden_probs(state, as_array(v))
    h = sample_bernoulli(kh, h_prob) if sample_h else h_prob
    v_prob = rbm_ops.visible_probs(state, h, groups=groups)
    v_next = sample_visible(kv, v_prob, groups) if sample_v else v_prob
    v_next = clamp_mask(v_next, as_array(v_known), as_array(known_mask))
    return v_next, v_prob


@partial(jax.jit, static_argnames=("steps", "groups", "sample_h", "sample_v",
                                   "Dz"))
def _img2txt_panel_chain(joint: rbm_ops.RBMState, key, z, *, steps: int,
                         groups, sample_h: bool, sample_v: bool, Dz: int):
    """Batched IMG→TXT conditional chain; returns (y0 baseline [B,K],
    per-step y_soft [steps, B, K])."""
    B = z.shape[0]
    K = joint.vb.shape[0] - Dz
    v_known = jnp.concatenate([z, jnp.zeros((B, K), z.dtype)], axis=1)
    km = jnp.concatenate([jnp.ones((B, Dz), z.dtype),
                          jnp.zeros((B, K), z.dtype)], axis=1)
    k0, kloop = jax.random.split(key)
    v = v_known * km + (1 - km) * jax.random.uniform(k0, v_known.shape,
                                                     v_known.dtype)
    # Baseline half-step (reference conditional_steps.py:69-72).
    h0 = rbm_ops.hidden_probs(joint, v)
    v_prob0 = rbm_ops.visible_probs(joint, h0, groups=groups)
    y_prev0 = v_prob0[:, Dz:]

    def body(v, skey):
        kh, kv = jax.random.split(skey)
        h_prob = rbm_ops.hidden_probs(joint, v)
        h = sample_bernoulli(kh, h_prob) if sample_h else h_prob
        v_prob = rbm_ops.visible_probs(joint, h, groups=groups)
        v_next = sample_visible(kv, v_prob, groups) if sample_v else v_prob
        v_next = clamp_mask(v_next, v_known, km)
        return v_next, v_prob[:, Dz:]

    _, ys = jax.lax.scan(body, v, jax.random.split(kloop, steps))
    return y_prev0, ys


@partial(jax.jit, static_argnames=("steps", "groups", "sample_h", "sample_v",
                                   "Dz", "ema_beta"))
def _txt2img_panel_chain(joint: rbm_ops.RBMState, idbn_states, key, y_onehot,
                         img_gt, z_init, *, steps: int, groups,
                         sample_h: bool, sample_v: bool, Dz: int,
                         ema_beta: float = 0.0):
    """Batched TXT→IMG chain with per-step decode; returns
    (dz [steps,B], mse [steps,B], z_final [B,Dz]).

    ``ema_beta`` > 0 smooths the *measured* trace only (reference
    conditional_steps.py:199-202: ``z_new = (1-beta)*z_prev + beta*z_soft``,
    decoded/diffed/carried as z_prev) — the chain state ``v`` itself is
    never smoothed, matching the reference."""
    B = y_onehot.shape[0]
    K = y_onehot.shape[1]
    v_known = jnp.concatenate([jnp.zeros((B, Dz), y_onehot.dtype), y_onehot],
                              axis=1)
    km = jnp.concatenate([jnp.zeros((B, Dz), y_onehot.dtype),
                          jnp.ones((B, K), y_onehot.dtype)], axis=1)
    v = v_known.at[:, :Dz].set(z_init)

    def body(carry, skey):
        v, z_prev = carry
        kh, kv = jax.random.split(skey)
        h_prob = rbm_ops.hidden_probs(joint, v)
        h = sample_bernoulli(kh, h_prob) if sample_h else h_prob
        v_prob = rbm_ops.visible_probs(joint, h, groups=groups)
        v_next = sample_visible(kv, v_prob, groups) if sample_v else v_prob
        v_next = clamp_mask(v_next, v_known, km)
        z_soft = v_prob[:, :Dz]
        if ema_beta > 0.0:
            z_new = (1.0 - ema_beta) * z_prev + ema_beta * z_soft
        else:
            z_new = z_soft
        img_rec = dbn_train.dbn_decode(idbn_states, z_new)
        mse = ((img_rec - img_gt) ** 2).mean(axis=1)
        dz = jnp.sqrt(((z_new - z_prev) ** 2).sum(axis=1))
        return (v_next, z_new), (dz, mse)

    (v, z_final), (dzs, mses) = jax.lax.scan(
        body, (v, v[:, :Dz]), jax.random.split(key, steps))
    return dzs, mses, z_final


# ------------------------------
# IMG -> TXT trace (reference conditional_steps.py:40-126)
# ------------------------------

def _img2txt_posthoc(y_prev0, ys, gt_idx, max_steps, eps_l1, stable_steps,
                     gap_thresh):
    """Reference's in-loop convergence bookkeeping, post-hoc on one sample."""
    K = ys.shape[1]
    y_prev = y_prev0
    pred_cur = int(y_prev.argmax())
    streak = 0
    steps_to_conv = max_steps + 1
    p_top1, p_top2, p_gap, p_gt, l1_list = [], [], [], [], []
    top1_seq, top2_seq = [], []
    t_stop = max_steps
    for t in range(1, max_steps + 1):
        y = ys[t - 1]
        order = np.argsort(-y)
        k1, k2 = int(order[0]), int(order[1]) if K > 1 else int(order[0])
        p1, p2 = float(y[k1]), float(y[k2]) if K > 1 else 0.0
        gap = p1 - p2
        p_top1.append(p1)
        p_top2.append(p2)
        p_gap.append(gap)
        top1_seq.append(k1)
        top2_seq.append(k2)
        if gt_idx is not None:
            p_gt.append(float(y[gt_idx]))
        l1 = float(np.abs(y - y_prev).sum())
        l1_list.append(l1)
        pred_new = k1
        streak = streak + 1 if pred_new == pred_cur else 1
        pred_cur = pred_new
        if (l1 < eps_l1) and (streak >= stable_steps) and (gap >= gap_thresh):
            steps_to_conv = t
            t_stop = t
            break
        y_prev = y
    return {
        "dir": "img2txt",
        "steps_to_converge": steps_to_conv,
        "p_top1": p_top1[:t_stop],
        "p_top2": p_top2[:t_stop],
        "p_gap": p_gap[:t_stop],
        "p_gt": p_gt[:t_stop] if gt_idx is not None else None,
        "l1": l1_list[:t_stop],
        "predT": pred_cur,
        "top1_idx": top1_seq[:t_stop],
        "top2_idx": top2_seq[:t_stop],
        "gt_idx": gt_idx,
    }


def trace_img2txt_cross_batch(model, imgs, lbls=None, max_steps=70,
                              sample_h=False, sample_v=False, eps_l1=1e-3,
                              stable_steps=3, gap_thresh=0.25):
    """Batched IMG→TXT traces: one on-device chain for all samples, then
    per-sample post-hoc convergence. Returns a list of reference-schema
    dicts."""
    x = as_array(imgs)
    z = model.image_idbn.represent(x)
    Dz = getattr(model, "Dz_img", z.shape[1])
    groups = tuple(tuple(g) for g in model.joint_rbm.softmax_groups)
    y0, ys = _img2txt_panel_chain(
        model.joint_rbm.state, model.joint_rbm._next_key(), z,
        steps=int(max_steps), groups=groups, sample_h=sample_h,
        sample_v=sample_v, Dz=Dz)
    y0 = np.asarray(y0)
    ys = np.asarray(ys)  # [steps, B, K]
    gts = (np.asarray(lbls).argmax(axis=1) if lbls is not None else None)
    out = []
    for i in range(z.shape[0]):
        gt_i = int(gts[i]) if gts is not None else None
        out.append(_img2txt_posthoc(y0[i], ys[:, i], gt_i, int(max_steps),
                                    eps_l1, stable_steps, gap_thresh))
    return out


def trace_img2txt_cross(model, img, lbl_onehot=None, max_steps=70,
                        sample_h=False, sample_v=False, eps_l1=1e-3,
                        stable_steps=3, gap_thresh=0.25):
    """Single-sample IMG→TXT trace (reference conditional_steps.py:40-126)."""
    return trace_img2txt_cross_batch(
        model, img, lbl_onehot, max_steps=max_steps, sample_h=sample_h,
        sample_v=sample_v, eps_l1=eps_l1, stable_steps=stable_steps,
        gap_thresh=gap_thresh)[0]


# ------------------------------
# TXT -> IMG trace (reference conditional_steps.py:133-238)
# ------------------------------

def _txt2img_posthoc(dzs, mses, max_steps, eps_z, mse_tol, patience):
    best_mse = float("inf")
    no_improve = 0
    steps_to_conv = max_steps + 1
    z_l2_list, mse_list = [], []
    t_stop = max_steps
    for t in range(1, max_steps + 1):
        mse = float(mses[t - 1])
        dz = float(dzs[t - 1])
        mse_list.append(mse)
        z_l2_list.append(dz)
        if dz < eps_z:
            if mse + 1e-12 < best_mse - mse_tol:
                best_mse = mse
                no_improve = 0
            else:
                no_improve += 1
            if no_improve >= patience:
                steps_to_conv = t
                t_stop = t
                break
        else:
            if mse + 1e-12 < best_mse - mse_tol:
                best_mse = mse
            no_improve = 0
    return {
        "dir": "txt2img",
        "steps_to_converge": steps_to_conv,
        "z_l2": z_l2_list[:t_stop],
        "image_mse": mse_list[:t_stop],
        "best_mse": best_mse,
    }


def trace_txt2img_cross_batch(model, imgs, lbls, max_steps=70,
                              sample_h=False, sample_v=False, eps_z=1e-3,
                              mse_tol=1e-5, patience=3, ema_beta=0.0,
                              init: str = "reference"):
    """Batched TXT→IMG traces (one on-device chain).

    ``ema_beta`` > 0 applies the reference's measurement smoothing
    (conditional_steps.py:199-202): the decoded/measured code is
    ``z_new = (1-beta)*z_prev + beta*z_soft`` while the Gibbs state itself
    is untouched; beta = 0 is the bit-identical unsmoothed path.

    ``init``: "reference" uses the trace's z_class_mean / mean-field init
    (reference conditional_steps.py:168-177); "random" uses U(0,1) unknowns
    (the z-mismatch check's init, reference :602).
    """
    img_gt = as_array(imgs)
    y = as_array(lbls)
    Dz = getattr(model, "Dz_img",
                 int(model.image_idbn.layers[-1].num_hidden))
    groups = tuple(tuple(g) for g in model.joint_rbm.softmax_groups)
    if init == "random":
        z_init = jax.random.uniform(model.joint_rbm._next_key(),
                                    (y.shape[0], Dz), jnp.float32)
    elif getattr(model, "z_class_mean", None) is not None:
        # Init z from z_class_mean when available (reference :168-177).
        z_init = jnp.asarray(model.z_class_mean)[y.argmax(axis=1)]
    else:
        B = y.shape[0]
        K = y.shape[1]
        v_known = jnp.concatenate([jnp.zeros((B, Dz), jnp.float32), y],
                                  axis=1)
        h0 = rbm_ops.hidden_probs(model.joint_rbm.state, v_known)
        v_prob0 = rbm_ops.visible_probs(model.joint_rbm.state, h0,
                                        groups=groups)
        z_init = v_prob0[:, :Dz]
    dzs, mses, z_final = _txt2img_panel_chain(
        model.joint_rbm.state, model.image_idbn._states(),
        model.joint_rbm._next_key(), y, img_gt, z_init,
        steps=int(max_steps), groups=groups, sample_h=sample_h,
        sample_v=sample_v, Dz=Dz, ema_beta=float(ema_beta))
    dzs = np.asarray(dzs)
    mses = np.asarray(mses)
    out = [_txt2img_posthoc(dzs[:, i], mses[:, i], int(max_steps), eps_z,
                            mse_tol, patience)
           for i in range(img_gt.shape[0])]
    return out, np.asarray(z_final)


def trace_txt2img_cross(model, img, lbl_onehot, max_steps=70, sample_h=False,
                        sample_v=False, eps_z=1e-3, mse_tol=1e-5,
                        patience=3, ema_beta: float = 0.0):
    """Single-sample TXT→IMG trace (reference conditional_steps.py:133-238)."""
    out, _ = trace_txt2img_cross_batch(
        model, img, lbl_onehot, max_steps=max_steps, sample_h=sample_h,
        sample_v=sample_v, eps_z=eps_z, mse_tol=mse_tol, patience=patience,
        ema_beta=ema_beta)
    return out[0]


# ------------------------------
# Fixed case / panel caches (reference conditional_steps.py:244-274, :392-433)
# ------------------------------

def pick_fixed_val_case(model, target_label: Optional[int] = None,
                        within_batch_index: int = 0):
    """Cache one val sample on ``model._fixed_val_case``."""
    from multimodal_idbn_tpu.utils.energy_utils import (
        pick_fixed_val_case as _pick)
    return _pick(model, target_label=target_label,
                 within_batch_index=within_batch_index)


def build_or_get_fixed_val_panel(model, per_class: int = 4):
    """Fixed per-class validation panel, cached on
    ``model._fixed_val_panel`` (reference conditional_steps.py:392-433)."""
    if getattr(model, "_fixed_val_panel", None) is not None:
        return model._fixed_val_panel
    if model.val_loader is None:
        raise RuntimeError("val_loader is None")

    K = getattr(model, "num_labels", 32)
    buckets = [[] for _ in range(K)]
    for imgs, lbls in model.val_loader:
        imgs = np.asarray(imgs)
        lbls = np.asarray(lbls)
        for i in range(len(imgs)):
            cls = int(lbls[i].argmax())
            if len(buckets[cls]) < per_class:
                buckets[cls].append((imgs[i:i + 1], lbls[i:i + 1]))
        if all(len(b) >= per_class for b in buckets):
            break

    imgs_list, lbls_list = [], []
    for b in buckets:
        imgs_list.extend([x for (x, _) in b])
        lbls_list.extend([y for (_, y) in b])
    if not imgs_list:
        imgs, lbls = next(iter(model.val_loader))
        imgs_list = [np.asarray(imgs)[:1]]
        lbls_list = [np.asarray(lbls)[:1]]

    panel = (np.concatenate(imgs_list, axis=0),
             np.concatenate(lbls_list, axis=0))
    model._fixed_val_panel = panel
    return panel


# ------------------------------
# Logging (reference conditional_steps.py:278-361, :437-555)
# ------------------------------

def log_cross_case(model, out_img2txt: dict, out_txt2img: dict, epoch: int,
                   tag: str):
    """Per-case convergence plots + summary (reference :278-361)."""
    if getattr(model, "wandb_run", None) is None or wandb is None:
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    class_names = getattr(model, "class_names", None)

    if out_img2txt and out_img2txt.get("p_top1"):
        xs = range(1, 1 + len(out_img2txt["p_top1"]))
        fig1, ax1 = plt.subplots(figsize=(5, 3))
        ax1.plot(xs, out_img2txt["p_top1"], label="p_top1")
        ax1.plot(xs, out_img2txt["p_top2"], label="p_top2")
        if out_img2txt.get("p_gt"):
            ax1.plot(xs, out_img2txt["p_gt"], label="p(y_true)",
                     linestyle="--")

        def to_name(k):
            if class_names and 0 <= k < len(class_names):
                return f"{k}:{class_names[k]}"
            return str(k)

        k1f = out_img2txt["top1_idx"][-1]
        k2f = out_img2txt["top2_idx"][-1]
        ax1.set_ylim(0, 1)
        ax1.set_xlabel("step")
        ax1.set_ylabel("prob")
        ax1.set_title(f"IMG->TXT (Gibbs) - final top1={to_name(k1f)}, "
                      f"top2={to_name(k2f)}")
        ax1.legend()
        model.wandb_run.log({f"cross/{tag}/img2txt_p": wandb.Image(fig1),
                             "epoch": epoch})
        plt.close(fig1)

        fig2, ax2 = plt.subplots(figsize=(5, 3))
        ax2.plot(xs, out_img2txt["p_gap"], label="gap=p1-p2")
        ax2.set_xlabel("step")
        ax2.set_ylabel("gap")
        ax2.set_title("IMG->TXT gap")
        model.wandb_run.log({f"cross/{tag}/img2txt_gap": wandb.Image(fig2),
                             "epoch": epoch})
        plt.close(fig2)

        try:
            cols = ["step", "top1_idx", "p_top1", "top2_idx", "p_top2"]
            has_gt = out_img2txt.get("p_gt") is not None
            if has_gt:
                cols += ["y_true_idx", "p_y_true"]
            if class_names:
                cols += ["top1_label", "top2_label"]
                if has_gt:
                    cols += ["y_true_label"]
            tbl = wandb.Table(columns=cols)
            gt_idx = out_img2txt.get("gt_idx")
            for t in range(len(out_img2txt["p_top1"])):
                r = [t + 1, out_img2txt["top1_idx"][t],
                     out_img2txt["p_top1"][t], out_img2txt["top2_idx"][t],
                     out_img2txt["p_top2"][t]]
                if has_gt:
                    r += [gt_idx, out_img2txt["p_gt"][t]]
                if class_names:
                    r += [class_names[out_img2txt["top1_idx"][t]],
                          class_names[out_img2txt["top2_idx"][t]]]
                    if has_gt and gt_idx is not None:
                        r += [class_names[gt_idx]]
                tbl.add_data(*r)
            model.wandb_run.log({f"cross/{tag}/img2txt_topk_table": tbl,
                                 "epoch": epoch})
        except Exception:
            pass

    if out_txt2img:
        fig3, ax3 = plt.subplots(figsize=(5, 3))
        xs = range(1, 1 + len(out_txt2img["image_mse"]))
        ax3.plot(xs, out_txt2img["image_mse"])
        ax3.set_xlabel("step")
        ax3.set_ylabel("MSE")
        ax3.set_title("TXT->IMG (Gibbs) MSE vs GT")
        model.wandb_run.log({f"cross/{tag}/txt2img_mse": wandb.Image(fig3),
                             "epoch": epoch})
        plt.close(fig3)

    summary = {
        "img2txt_steps": (out_img2txt.get("steps_to_converge")
                          if out_img2txt else None),
        "txt2img_steps": (out_txt2img.get("steps_to_converge")
                          if out_txt2img else None),
        "txt2img_best_mse": (out_txt2img.get("best_mse")
                             if out_txt2img else None),
        "img2txt_pred_final": (out_img2txt.get("predT")
                               if out_img2txt else None),
        "img2txt_gt": (out_img2txt.get("gt_idx") if out_img2txt else None),
    }
    model.wandb_run.log({f"cross/{tag}/summary": summary, "epoch": epoch})


def run_and_log_cross_fixed_case(model, epoch: int,
                                 target_label: Optional[int] = None,
                                 within_batch_index: int = 0,
                                 max_steps: int = 70, sample_h: bool = False,
                                 sample_v: bool = False,
                                 tag: str = "fixed_cross"):
    """Both directions on the fixed sample (reference :365-387)."""
    img, lbl = pick_fixed_val_case(model, target_label=target_label,
                                   within_batch_index=within_batch_index)
    out_img2txt = trace_img2txt_cross(model, img, lbl_onehot=lbl,
                                      max_steps=max_steps, sample_h=sample_h,
                                      sample_v=sample_v)
    out_txt2img = trace_txt2img_cross(model, img, lbl_onehot=lbl,
                                      max_steps=max_steps, sample_h=sample_h,
                                      sample_v=sample_v)
    log_cross_case(model, out_img2txt, out_txt2img, epoch=epoch, tag=tag)
    return out_img2txt, out_txt2img


def _steps_stats(steps_list, max_steps):
    """Converged-only stats (reference conditional_steps.py:437-450)."""
    arr = np.asarray(steps_list, dtype=np.int32)
    conv_mask = arr <= max_steps
    conv_vals = arr[conv_mask]
    stats = {
        "n_total": int(arr.size),
        "n_converged": int(conv_vals.size),
        "frac_converged": float(conv_vals.size / max(1, arr.size)),
        "mean": float(conv_vals.mean()) if conv_vals.size else None,
        "p50": float(np.percentile(conv_vals, 50)) if conv_vals.size else None,
        "p95": float(np.percentile(conv_vals, 95)) if conv_vals.size else None,
    }
    return stats, conv_mask


def _plot_steps_hist_with_nc(steps_list, max_steps, title):
    """Histogram 1..max_steps plus an 'NC' (non-converged) bin
    (reference conditional_steps.py:453-471)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    arr = np.asarray(steps_list, dtype=np.int32)
    counts = [int((arr == s).sum()) for s in range(1, max_steps + 1)]
    labels = [str(s) for s in range(1, max_steps + 1)]
    counts.append(int((arr > max_steps).sum()))
    labels.append("NC")
    fig, ax = plt.subplots(figsize=(min(12, max_steps * 0.35 + 2), 3.2))
    ax.bar(np.arange(len(labels)), counts)
    ax.set_xticks(np.arange(len(labels)))
    ax.set_xticklabels(labels)
    ax.set_xlabel("Gibbs steps")
    ax.set_ylabel("# samples")
    ax.set_title(title)
    return fig


def run_and_log_cross_panel(model, epoch: int, per_class: int = 4,
                            max_steps: int = 70, sample_h: bool = False,
                            sample_v: bool = False, tag: str = "panel"):
    """Panel aggregation: per-class fixed panel, both directions, histogram
    + p50/p95/frac_converged summary (reference conditional_steps.py:475-555).
    The whole panel runs as two batched chains (one per direction)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    imgs, lbls = build_or_get_fixed_val_panel(model, per_class=per_class)

    outs_i2t = trace_img2txt_cross_batch(model, imgs, lbls,
                                         max_steps=max_steps,
                                         sample_h=sample_h,
                                         sample_v=sample_v)
    outs_t2i, _ = trace_txt2img_cross_batch(model, imgs, lbls,
                                            max_steps=max_steps,
                                            sample_h=sample_h,
                                            sample_v=sample_v)

    i2t_steps = [int(o["steps_to_converge"]) for o in outs_i2t]
    t2i_steps = [int(o["steps_to_converge"]) for o in outs_t2i]
    i2t_p1_final = [float(o["p_top1"][-1]) for o in outs_i2t if o["p_top1"]]
    i2t_gap_final = [float(o["p_gap"][-1]) for o in outs_i2t if o["p_gap"]]
    t2i_best_mse = [float(o.get("best_mse", float("inf")))
                    for o in outs_t2i]

    i2t_stats, _ = _steps_stats(i2t_steps, max_steps)
    t2i_stats, _ = _steps_stats(t2i_steps, max_steps)
    mean_p1 = float(np.mean(i2t_p1_final)) if i2t_p1_final else None
    mean_gap = float(np.mean(i2t_gap_final)) if i2t_gap_final else None
    mean_best_mse = float(np.mean(t2i_best_mse)) if t2i_best_mse else None

    if getattr(model, "wandb_run", None) is not None and wandb is not None:
        fig_i2t = _plot_steps_hist_with_nc(
            i2t_steps, max_steps, "IMG->TXT panel: steps to converge")
        model.wandb_run.log({f"conv/panel/{tag}/img2txt_steps_hist":
                             wandb.Image(fig_i2t), "epoch": epoch})
        plt.close(fig_i2t)
        fig_t2i = _plot_steps_hist_with_nc(
            t2i_steps, max_steps, "TXT->IMG panel: steps to converge")
        model.wandb_run.log({f"conv/panel/{tag}/txt2img_steps_hist":
                             wandb.Image(fig_t2i), "epoch": epoch})
        plt.close(fig_t2i)

        summary = {
            "img2txt/mean": i2t_stats["mean"],
            "img2txt/p50": i2t_stats["p50"],
            "img2txt/p95": i2t_stats["p95"],
            "img2txt/frac_converged": i2t_stats["frac_converged"],
            "txt2img/mean": t2i_stats["mean"],
            "txt2img/p50": t2i_stats["p50"],
            "txt2img/p95": t2i_stats["p95"],
            "txt2img/frac_converged": t2i_stats["frac_converged"],
            "img2txt/p_top1_final_mean": mean_p1,
            "img2txt/p_gap_final_mean": mean_gap,
            "txt2img/best_mse_mean": mean_best_mse,
            "n_total": i2t_stats["n_total"],
        }
        model.wandb_run.log({f"conv/panel/{tag}/summary": summary,
                             "epoch": epoch})

    return {
        "img2txt": {"steps": i2t_steps, "stats": i2t_stats,
                    "p1_mean": mean_p1, "gap_mean": mean_gap},
        "txt2img": {"steps": t2i_steps, "stats": t2i_stats,
                    "best_mse_mean": mean_best_mse},
    }


def run_and_log_z_mismatch_check(model, epoch: int, max_steps: int = 20,
                                 sample_h: bool = False,
                                 sample_v: bool = False,
                                 tag: str = "z_check"):
    """Compare latent distributions z_img (from the image branch) vs z_y
    (from TXT→IMG inference): per-component stats, cos(z_y, z_img),
    histograms (reference conditional_steps.py:557-646). Batched: one
    chain for the whole validation batch."""
    if getattr(model, "wandb_run", None) is None:
        return
    try:
        imgs, lbls = next(iter(model.val_loader))
    except Exception:
        return
    imgs = as_array(imgs)
    lbls = as_array(lbls)

    z_img = np.asarray(model.image_idbn.represent(imgs))
    # Random-init chain like the reference z-check (conditional_steps.py:602),
    # NOT the class-mean-initialized trace chain.
    _, z_y = trace_txt2img_cross_batch(model, imgs, lbls,
                                       max_steps=max_steps,
                                       sample_h=sample_h, sample_v=sample_v,
                                       init="random")

    def _stats(t):
        return {
            "mean": float(t.mean()),
            "std": float(t.std()),
            "q10": float(np.quantile(t, 0.10)),
            "q90": float(np.quantile(t, 0.90)),
        }

    z_img_u = z_img / (np.linalg.norm(z_img, axis=1, keepdims=True) + 1e-12)
    z_y_u = z_y / (np.linalg.norm(z_y, axis=1, keepdims=True) + 1e-12)
    cosine = np.clip((z_img_u * z_y_u).sum(axis=1), -1, 1)

    model.wandb_run.log({f"zcheck/{tag}/z_img_stats": _stats(z_img),
                         "epoch": epoch})
    model.wandb_run.log({f"zcheck/{tag}/z_y_stats": _stats(z_y),
                         "epoch": epoch})
    model.wandb_run.log({f"zcheck/{tag}/cosine_mean": float(cosine.mean()),
                         "epoch": epoch})

    if wandb is not None:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig1, ax1 = plt.subplots(figsize=(5, 3))
            ax1.hist(z_img.flatten(), bins=50, alpha=0.6, label="z_img")
            ax1.hist(z_y.flatten(), bins=50, alpha=0.6, label="z_y")
            ax1.set_title("Histogram z values")
            ax1.legend()
            model.wandb_run.log({f"zcheck/{tag}/hist": wandb.Image(fig1),
                                 "epoch": epoch})
            plt.close(fig1)

            fig2, ax2 = plt.subplots(figsize=(5, 3))
            ax2.hist(cosine, bins=30)
            ax2.set_title("cos(z_y, z_img) per sample")
            model.wandb_run.log({f"zcheck/{tag}/cosine_hist":
                                 wandb.Image(fig2), "epoch": epoch})
            plt.close(fig2)
        except Exception:
            pass
    return float(cosine.mean())
