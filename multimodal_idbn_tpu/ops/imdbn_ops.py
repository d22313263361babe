"""Functional joint-RBM training and cross-modal inference (iMDBN core).

The reference's joint training loop (imdbn.py:508-712) and cross-modal
reconstruction (imdbn.py:387-488) are its two hottest paths — per batch it
runs an auxiliary clamped-CD whose positive phase is a ≥10-step noisy
mean-field chain, plus a full cross-modal round trip of 2×``cross_steps``
chain iterations (SURVEY.md §3.3, hot loops B and C). Here a whole joint
epoch is ONE jitted ``lax.scan``: image latents are precomputed once (the
image iDBN is frozen during joint training), chains run on-device, and the
per-batch cross-modal metrics are fused into the scan body.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_idbn_tpu.ops import dbn_train, rbm_ops
from multimodal_idbn_tpu.ops.sampling import SoftmaxGroups

Array = jax.Array


class CrossMetrics(NamedTuple):
    """Per-batch sums for the reference's epoch metrics (imdbn.py:634-639)."""

    n: Array        # samples
    top1: Array     # correct top-1 count
    top3: Array     # correct top-3 count
    ce_sum: Array   # summed BCE vs one-hot
    mse_sum: Array  # summed image MSE


def zeros_metrics() -> CrossMetrics:
    z = jnp.zeros((), jnp.float32)
    return CrossMetrics(z, z, z, z, z)


# ---------------------------------------------------------------------------
# init_joint_bias_from_data statistics (imdbn.py:217-292)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_classes",))
def joint_bias_stats(Z: Array, Y: Array, *, num_classes: int):
    """Compute (z_bias, y_bias, z_class_mean) from latents+labels.

    Reference semantics (SURVEY.md §2.1(9)): mean_z clamped to
    [1e-4, 1-1e-4] → logit bias; label bias = log of smoothed priors
    ``(p+1e-6)/(Σp+1e-6·K)``; per-class z means with global-mean fallback
    for empty classes (imdbn.py:256-292).
    """
    K = num_classes
    mean_z = jnp.clip(Z.mean(0), 1e-4, 1 - 1e-4)
    class_counts = Y.sum(0)
    priors = class_counts / jnp.maximum(1.0, class_counts.sum())
    priors = (priors + 1e-6) / (priors.sum() + 1e-6 * K)

    y_idx = Y.argmax(axis=1)
    onehot = jax.nn.one_hot(y_idx, K, dtype=Z.dtype)       # [N, K]
    sums = onehot.T @ Z                                     # [K, Dz]
    counts = onehot.sum(0)                                  # [K]
    z_class_mean = jnp.where(
        (counts > 0)[:, None], sums / jnp.maximum(counts, 1.0)[:, None],
        mean_z[None, :])

    z_bias = jnp.log(mean_z) - jnp.log1p(-mean_z)           # logit (:291)
    y_bias = jnp.log(priors)                                 # (:292)
    return z_bias, y_bias, z_class_mean


# ---------------------------------------------------------------------------
# Cross-modal reconstruction (imdbn.py:387-488)
# ---------------------------------------------------------------------------

def cross_reconstruct(joint: rbm_ops.RBMState, idbn_states, key: Array,
                      z_img: Array, y_onehot: Array, *, steps: int, Dz: int,
                      groups: SoftmaxGroups,
                      z_class_mean: Optional[Array] = None,
                      z_affine: Optional[Tuple[Array, Array]] = None,
                      use_free_energy: bool = False,
                      best_of_k: int = 5,
                      direction: str = "both") -> Tuple[Array, Array]:
    """IMG→TXT then TXT→IMG through the joint RBM; returns
    (decoded image [B, D], p(y|img) [B, K]).

    - IMG→TXT: clamp the z block, mean-field ``conditional_gibbs``
      (imdbn.py:419-427).
    - TXT→IMG: clamp the y block, μ-pull toward ``z_class_mean[argmax y]``
      with η0=0.15, noisy mean-field annealing T0=3→1, σ0=0.9
      (imdbn.py:436-449).
    - Best-of-K: the reference builds 5 candidates but its free-energy
      guard never fires (RBM has no ``free_energy`` method), so argmin of
      all-zero scores always picks candidate 0 — the full annealed chain
      (SURVEY.md §2.1(10)). With ``use_free_energy=False`` (default,
      reference parity) the refinement candidates are dead compute with no
      RNG side effects, so we skip them entirely: bitwise-identical output,
      ~half the chain work. ``use_free_energy=True`` wires in the real
      free energy (energy_utils semantics) and selects per-sample.
    """
    B = z_img.shape[0]
    K = y_onehot.shape[1]
    k_i2t, k_t2i, k_ref = jax.random.split(key, 3)

    # `direction` ("both" | "img2txt" | "txt2img") statically skips the
    # unused half for one-direction public wrappers; key derivation is
    # shared, so the kept half is bit-identical to the "both" path. The
    # skipped output is returned as None.
    if direction not in ("both", "img2txt", "txt2img"):
        raise ValueError(f"unknown direction {direction!r}")

    p_y_given_img = None
    if direction in ("both", "img2txt"):
        # --- IMG→TXT (imdbn.py:419-427)
        v_known = jnp.concatenate(
            [z_img, jnp.zeros((B, K), z_img.dtype)], axis=1)
        km_i = jnp.concatenate(
            [jnp.ones((B, Dz), z_img.dtype),
             jnp.zeros((B, K), z_img.dtype)], axis=1)
        v_img2txt = rbm_ops.conditional_gibbs(
            joint, k_i2t, v_known, km_i, n_steps=steps, sample_h=False,
            sample_v=False, groups=groups)
        p_y_given_img = v_img2txt[:, Dz:]
    if direction == "img2txt":
        return None, p_y_given_img

    km = jnp.concatenate(
        [jnp.ones((B, Dz), z_img.dtype), jnp.zeros((B, K), z_img.dtype)],
        axis=1)
    # --- TXT→IMG (imdbn.py:430-449)
    v_known2 = jnp.concatenate(
        [jnp.zeros((B, Dz), z_img.dtype), y_onehot], axis=1)
    km2 = 1.0 - km
    mu_k = None
    if z_class_mean is not None:
        mu_k = z_class_mean[y_onehot.argmax(axis=1)]
    v_chain = rbm_ops.noisy_meanfield_annealed(
        joint, k_t2i, v_known2, km2, n_steps=steps, T0=3.0, T1=1.0,
        sigma0=0.9, hot_frac=0.7, sharpen_last=3, T_cold_plus=0.9,
        mu_k=mu_k, eta0=0.15, groups=groups)

    if use_free_energy and best_of_k > 1:
        # Candidate i+1 = 1-step cold mean-field "refinement" of candidate
        # i (imdbn.py:460-470; note the chain re-randomizes the unknown
        # block each time — reproduced by noisy_meanfield's init).
        def refine(v_prev, step_key):
            v_next = rbm_ops.noisy_meanfield_annealed(
                joint, step_key, v_prev, km2, n_steps=1, T0=0.9, T1=0.9,
                sigma0=0.0, hot_frac=0.0, sharpen_last=0, T_cold_plus=0.9,
                mu_k=mu_k, eta0=0.15, groups=groups)
            return v_next, v_next

        _, extra = jax.lax.scan(refine, v_chain,
                                jax.random.split(k_ref, best_of_k - 1))
        cands = jnp.concatenate([v_chain[None], extra], axis=0)  # [Kb, B, V]
        F = jax.vmap(lambda v: rbm_ops.free_energy(joint, v))(cands)
        best = F.argmin(axis=0)                                   # [B]
        v_pick = jnp.take_along_axis(
            cands, best[None, :, None].astype(jnp.int32), axis=0)[0]
    else:
        v_pick = v_chain  # degenerate argmin(zeros) == candidate 0

    z_from_y = v_pick[:, :Dz]
    if z_affine is not None:
        scale, bias = z_affine
        z_from_y = (z_from_y - bias) / (scale + 1e-6)  # (:481-484)

    img_from_txt = dbn_train.dbn_decode(idbn_states, z_from_y)
    return img_from_txt, p_y_given_img


def cross_metrics_batch(img_from_txt: Array, p_y: Array, img_flat: Array,
                        y_onehot: Array) -> CrossMetrics:
    """Reference per-batch metric sums (imdbn.py:619-639)."""
    gt = y_onehot.argmax(axis=1)
    pred = p_y.argmax(axis=1)
    topk = min(3, p_y.shape[1])
    _, topk_idx = jax.lax.top_k(p_y, topk)
    top3 = (topk_idx == gt[:, None]).any(axis=1)
    p = jnp.clip(p_y, 1e-6, 1 - 1e-6)
    t = jax.nn.one_hot(gt, p_y.shape[1], dtype=p.dtype)
    ce = -(t * jnp.log(p) + (1 - t) * jnp.log1p(-p)).sum()
    mse = ((img_from_txt - img_flat) ** 2).sum()
    B = jnp.asarray(img_flat.shape[0], jnp.float32)
    return CrossMetrics(B, (pred == gt).sum().astype(jnp.float32),
                        top3.sum().astype(jnp.float32), ce, mse)


# ---------------------------------------------------------------------------
# Joint training: one batch, and one fused epoch (imdbn.py:508-712)
# ---------------------------------------------------------------------------

def _joint_train_batch(joint: rbm_ops.RBMState, idbn_states, key: Array,
                       zb: Array, yb: Array, imgb: Array, b_idx,
                       lr, mom, weight_decay, z_class_mean, *,
                       warmup: bool, joint_cd: int, aux_cond_steps: int,
                       Dz: int, steps: int, groups: SoftmaxGroups,
                       use_free_energy: bool, zclamp_every: int,
                       compute_metrics: bool, sr=None):
    """One joint-training batch (reference imdbn.py:553-639).

    Warmup epochs: 2× y-clamped aux CD (imdbn.py:566-579). Main epochs:
    free CD + y-clamp aux every batch + z-clamp aux every
    ``zclamp_every``-th batch (:582-612). Cross-modal metrics per batch.
    """
    B = zb.shape[0]
    K = yb.shape[1]
    v_plus = jnp.concatenate([zb, yb], axis=1)
    km_y = jnp.concatenate(
        [jnp.zeros((B, Dz), zb.dtype), jnp.ones((B, K), zb.dtype)], axis=1)
    v_known_y = jnp.concatenate([jnp.zeros((B, Dz), zb.dtype), yb], axis=1)
    keys = jax.random.split(key, 4)

    cd_loss = jnp.zeros((), jnp.float32)
    if warmup:
        for i in range(2):  # 2× per batch (:566-579)
            joint, _ = rbm_ops.clamped_cd_update(
                joint, keys[i], v_known_y, km_y, lr=lr, mom=mom,
                weight_decay=weight_decay, cd=1,
                cond_init_steps=aux_cond_steps, sample_h=False,
                sample_v=False, reclamp_negative=True, aux_lr_mult=0.3,
                use_noisy_init=True, groups=groups, sr=sr)
    else:
        joint, cd_loss = rbm_ops.cd_update(
            joint, keys[0], v_plus, lr=lr, mom=mom,
            weight_decay=weight_decay, cd=joint_cd, groups=groups,
            sr=sr)
        joint, _ = rbm_ops.clamped_cd_update(
            joint, keys[1], v_known_y, km_y, lr=lr, mom=mom,
            weight_decay=weight_decay, cd=1,
            cond_init_steps=aux_cond_steps, sample_h=False, sample_v=False,
            reclamp_negative=False, aux_lr_mult=0.3, use_noisy_init=True,
            groups=groups, sr=sr)

        # z-clamp aux every `zclamp_every` batches (:599-612).
        km_z = 1.0 - km_y
        v_known_z = jnp.concatenate([zb, jnp.zeros((B, K), zb.dtype)],
                                    axis=1)

        def do_zclamp(j):
            j2, _ = rbm_ops.clamped_cd_update(
                j, keys[2], v_known_z, km_z, lr=lr, mom=mom,
                weight_decay=weight_decay, cd=1,
                cond_init_steps=aux_cond_steps, sample_h=False,
                sample_v=False, reclamp_negative=False, aux_lr_mult=0.3,
                use_noisy_init=True, groups=groups, sr=sr)
            return j2

        joint = jax.lax.cond(b_idx % zclamp_every == 0, do_zclamp,
                             lambda j: j, joint)

    if compute_metrics:
        img_from_txt, p_y = cross_reconstruct(
            joint, idbn_states, keys[3], zb, yb, steps=steps, Dz=Dz,
            groups=groups, z_class_mean=z_class_mean,
            use_free_energy=use_free_energy)
        metrics = cross_metrics_batch(img_from_txt, p_y, imgb, yb)
    else:
        metrics = zeros_metrics()
    return joint, cd_loss, metrics


@partial(jax.jit,
         static_argnames=("warmup", "joint_cd", "aux_cond_steps", "Dz",
                          "steps", "groups", "use_free_energy",
                          "zclamp_every", "batch_size", "metrics_every",
                          "shuffle", "mesh", "shard_axis", "sr"))
def joint_epoch(joint: rbm_ops.RBMState, idbn_states, key: Array, Z: Array,
                Y: Array, IMG: Array, lr, mom, weight_decay, z_class_mean,
                *, warmup: bool, joint_cd: int, aux_cond_steps: int,
                Dz: int, steps: int, groups: SoftmaxGroups,
                use_free_energy: bool = False, zclamp_every: int = 50,
                batch_size: int = 128, metrics_every: int = 1,
                shuffle: bool = False, mesh=None, shard_axis=None,
                sr=None):
    """One fused joint-training epoch over precomputed latents Z.

    Returns (joint', mean_cd_loss, CrossMetrics sums). Remainder samples
    beyond ``nb*batch_size`` are handled by the caller via
    ``joint_train_batch_step``. With ``mesh``/``shard_axis`` set, the
    per-step batch axis is kept sharded over the mesh (data parallelism;
    SURVEY.md §5.8).
    """
    n = Z.shape[0]
    nb = n // batch_size
    if nb == 0:  # dataset smaller than one batch: caller's remainder
        return joint, jnp.zeros((), jnp.float32), zeros_metrics()
    kperm, kscan = jax.random.split(key)
    if shuffle:
        sel = jax.random.permutation(kperm, n)[:nb * batch_size]
        Zb = Z[sel].reshape(nb, batch_size, -1)
        Yb = Y[sel].reshape(nb, batch_size, -1)
        Ib = IMG[sel].reshape(nb, batch_size, -1)
    else:  # static slices: callers permute beforehand (exactly-once)
        Zb = Z[:nb * batch_size].reshape(nb, batch_size, -1)
        Yb = Y[:nb * batch_size].reshape(nb, batch_size, -1)
        Ib = IMG[:nb * batch_size].reshape(nb, batch_size, -1)
    from multimodal_idbn_tpu.ops.dbn_train import _constrain_batches
    Zb = _constrain_batches(Zb, mesh, shard_axis)
    Yb = _constrain_batches(Yb, mesh, shard_axis)
    Ib = _constrain_batches(Ib, mesh, shard_axis)
    step_keys = jax.random.split(kscan, nb)

    def body(carry, xs):
        joint, totals, loss_sum = carry
        zb, yb, imgb, skey, b_idx = xs
        joint, cd_loss, m = _joint_train_batch(
            joint, idbn_states, skey, zb, yb, imgb, b_idx, lr, mom,
            weight_decay, z_class_mean, warmup=warmup, joint_cd=joint_cd,
            aux_cond_steps=aux_cond_steps, Dz=Dz, steps=steps,
            groups=groups, use_free_energy=use_free_energy,
            zclamp_every=zclamp_every,
            compute_metrics=(metrics_every == 1), sr=sr)
        if metrics_every > 1:
            # Thinned cadence (config extension; reference computes every
            # batch, imdbn.py:614-639 — default metrics_every=1 keeps that).
            def compute(_):
                img_from_txt, p_y = cross_reconstruct(
                    joint, idbn_states, jax.random.fold_in(skey, 7), zb, yb,
                    steps=steps, Dz=Dz, groups=groups,
                    z_class_mean=z_class_mean,
                    use_free_energy=use_free_energy)
                return cross_metrics_batch(img_from_txt, p_y, imgb, yb)

            m = jax.lax.cond(b_idx % metrics_every == 0, compute,
                             lambda _: zeros_metrics(), None)
        totals = CrossMetrics(*(a + b for a, b in zip(totals, m)))
        return (joint, totals, loss_sum + cd_loss), None

    init = (joint, zeros_metrics(), jnp.zeros((), jnp.float32))
    (joint, totals, loss_sum), _ = jax.lax.scan(
        body, init, (Zb, Yb, Ib, step_keys,
                     jnp.arange(nb, dtype=jnp.int32)))
    mean_cd = loss_sum / jnp.maximum(1, nb)
    return joint, mean_cd, totals


@partial(jax.jit,
         static_argnames=("warmup", "joint_cd", "aux_cond_steps", "Dz",
                          "steps", "groups", "use_free_energy",
                          "zclamp_every", "batch_size", "metrics_every",
                          "n_epochs", "mesh", "shard_axis", "sr"))
def joint_epoch_block(joint: rbm_ops.RBMState, idbn_states,
                      epoch_key: Array, Z: Array, Y: Array, IMG: Array,
                      epoch_idx: Array, lr_arr: Array, mom_arr: Array,
                      weight_decay, z_class_mean, *, warmup: bool,
                      joint_cd: int, aux_cond_steps: int, Dz: int,
                      steps: int, groups: SoftmaxGroups,
                      use_free_energy: bool = False,
                      zclamp_every: int = 50, batch_size: int = 128,
                      metrics_every: int = 1, n_epochs: int = 1,
                      mesh=None, shard_axis=None, sr=None):
    """Run ``n_epochs`` joint epochs in ONE dispatch (nested scan),
    amortizing per-call tunnel latency. Identical key derivation to the
    per-epoch path (``fold_in(epoch_key, epoch_idx)``) so blocked and
    unblocked training produce identical results.

    Returns (joint', cd_sum[E], cd_count[E], CrossMetrics-of-arrays[E]).
    """
    n = Z.shape[0]
    nb = n // batch_size
    rem = n - nb * batch_size

    def epoch_body(joint, xs):
        e_idx, lr, mom = xs
        key = jax.random.fold_in(epoch_key, e_idx)
        perm = jax.random.permutation(jax.random.fold_in(key, 0), n)
        Zp, Yp, Ip = Z[perm], Y[perm], IMG[perm]
        kscan = jax.random.split(key)[1]

        totals = zeros_metrics()
        cd_sum = jnp.zeros((), jnp.float32)
        cd_count = jnp.zeros((), jnp.float32)

        if nb > 0:
            Zb = Zp[:nb * batch_size].reshape(nb, batch_size, -1)
            Yb = Yp[:nb * batch_size].reshape(nb, batch_size, -1)
            Ib = Ip[:nb * batch_size].reshape(nb, batch_size, -1)
            from multimodal_idbn_tpu.ops.dbn_train import (
                _constrain_batches)
            Zb = _constrain_batches(Zb, mesh, shard_axis)
            Yb = _constrain_batches(Yb, mesh, shard_axis)
            Ib = _constrain_batches(Ib, mesh, shard_axis)
            step_keys = jax.random.split(kscan, nb)

            def body(carry, bxs):
                joint, totals, loss_sum = carry
                zb, yb, imgb, skey, b_idx = bxs
                joint, cd_loss, m = _joint_train_batch(
                    joint, idbn_states, skey, zb, yb, imgb, b_idx, lr,
                    mom, weight_decay, z_class_mean, warmup=warmup,
                    joint_cd=joint_cd, aux_cond_steps=aux_cond_steps,
                    Dz=Dz, steps=steps, groups=groups,
                    use_free_energy=use_free_energy,
                    zclamp_every=zclamp_every,
                    compute_metrics=(metrics_every == 1), sr=sr)
                if metrics_every > 1:
                    def compute(_):
                        img_from_txt, p_y = cross_reconstruct(
                            joint, idbn_states,
                            jax.random.fold_in(skey, 7), zb, yb,
                            steps=steps, Dz=Dz, groups=groups,
                            z_class_mean=z_class_mean,
                            use_free_energy=use_free_energy)
                        return cross_metrics_batch(img_from_txt, p_y,
                                                   imgb, yb)

                    m = jax.lax.cond(b_idx % metrics_every == 0, compute,
                                     lambda _: zeros_metrics(), None)
                totals = CrossMetrics(*(a + b for a, b in zip(totals, m)))
                return (joint, totals, loss_sum + cd_loss), None

            (joint, totals, cd_sum), _ = jax.lax.scan(
                body, (joint, totals, cd_sum),
                (Zb, Yb, Ib, step_keys, jnp.arange(nb, dtype=jnp.int32)))
            cd_count = jnp.asarray(nb, jnp.float32)

        if rem:
            joint, cd_rem, m_rem = _joint_train_batch(
                joint, idbn_states, jax.random.fold_in(key, 991),
                Zp[nb * batch_size:], Yp[nb * batch_size:],
                Ip[nb * batch_size:], jnp.asarray(nb), lr, mom,
                weight_decay, z_class_mean, warmup=warmup,
                joint_cd=joint_cd, aux_cond_steps=aux_cond_steps, Dz=Dz,
                steps=steps, groups=groups,
                use_free_energy=use_free_energy,
                zclamp_every=zclamp_every,
                compute_metrics=(metrics_every == 1), sr=sr)
            totals = CrossMetrics(*(a + b for a, b in zip(totals, m_rem)))
            cd_sum = cd_sum + cd_rem
            cd_count = cd_count + 1.0
        return joint, (cd_sum, cd_count, totals)

    joint, (cd_sums, cd_counts, totals) = jax.lax.scan(
        epoch_body, joint, (epoch_idx, lr_arr, mom_arr))
    return joint, cd_sums, cd_counts, totals


@partial(jax.jit,
         static_argnames=("warmup", "joint_cd", "aux_cond_steps", "Dz",
                          "steps", "groups", "use_free_energy",
                          "zclamp_every", "compute_metrics", "sr"))
def joint_train_batch_step(joint: rbm_ops.RBMState, idbn_states, key: Array,
                           zb: Array, yb: Array, imgb: Array, b_idx, lr,
                           mom, weight_decay, z_class_mean, *, warmup: bool,
                           joint_cd: int, aux_cond_steps: int, Dz: int,
                           steps: int, groups: SoftmaxGroups,
                           use_free_energy: bool = False,
                           zclamp_every: int = 50,
                           compute_metrics: bool = True, sr=None):
    """Single-batch jitted variant (epoch remainder / reference-style path)."""
    return _joint_train_batch(
        joint, idbn_states, key, zb, yb, imgb, b_idx, lr, mom, weight_decay,
        z_class_mean, warmup=warmup, joint_cd=joint_cd,
        aux_cond_steps=aux_cond_steps, Dz=Dz, steps=steps, groups=groups,
        use_free_energy=use_free_energy, zclamp_every=zclamp_every,
        compute_metrics=compute_metrics, sr=sr)


_cross_reconstruct_jit = jax.jit(
    cross_reconstruct,
    static_argnames=("steps", "Dz", "groups", "use_free_energy",
                     "best_of_k", "direction"))


# ---------------------------------------------------------------------------
# Class-conditional generative sampling (framework extension)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("steps", "Dz", "groups"))
def sample_txt2img(joint: rbm_ops.RBMState, idbn_states, key: Array,
                   y_onehot: Array, *, steps: int, Dz: int,
                   groups: SoftmaxGroups, z_affine=None):
    """Draw images from p(img | y): fully sampled conditional Gibbs on
    the joint RBM with the label block clamped
    (``rbm_ops.sampled_conditional_chain``), then ancestral-sampled
    decode through the image iDBN (``dbn_train.dbn_decode_sampled``).

    Framework extension — the reference's TXT→IMG path (imdbn.py:387-488)
    is a mean-field DECODER, whose L2-optimal output is the per-class
    mean image; on numerosity that mean is information-bounded near blank
    (benchmarks/RESULTS.md). Sampling the chain and the descent instead
    draws individual plausible images (sharp dots, count carried by y).
    ``z_affine=(scale, bias)`` destandardizes the sampled z before decode
    exactly like the mean path (reference imdbn.py:481-484).

    Returns (imgs [B, D] pixel probabilities of the sampled
    configuration, z_sample [B, Dz] the binary top-layer sample).
    """
    B, K = y_onehot.shape
    kchain, kdec = jax.random.split(key)
    v_known = jnp.concatenate(
        [jnp.zeros((B, Dz), jnp.float32), y_onehot.astype(jnp.float32)],
        axis=1)
    km = jnp.concatenate([jnp.zeros((Dz,), jnp.float32),
                          jnp.ones((K,), jnp.float32)])
    v = rbm_ops.sampled_conditional_chain(joint, kchain, v_known, km,
                                          n_steps=steps, groups=groups)
    z_sample = v[:, :Dz]
    z_dec = z_sample
    if z_affine is not None:
        scale, bias = z_affine
        z_dec = (z_dec - bias) / (scale + 1e-6)  # (imdbn.py:481-484)
    imgs = dbn_train.dbn_decode_sampled(idbn_states, z_dec, kdec)
    return imgs, z_sample
