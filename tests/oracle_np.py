"""NumPy oracle of the reference RBM math (deterministic-sampling mode).

Re-implements the update rules of reference imdbn/models/rbm.py in plain
NumPy, with sampling pinned to deterministic surrogates:

- Bernoulli sample  -> (p > 0.5)          (uniform draw := 0.5)
- categorical sample-> argmax one-hot     (Gumbel noise := const)
- Gaussian noise    -> 0
- chain init U(0,1) -> 0.5

Tests monkeypatch jax.random the same way, so the JAX implementation and
this oracle must agree elementwise over entire chains and parameter
updates — validating the exact update order of SURVEY.md §2.1.
"""

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def softplus(x):
    return np.logaddexp(0.0, x)


def det_sample(p):
    return (p > 0.5).astype(p.dtype)


def lin_schedule(t, t_max, start, end):
    if t_max <= 1:
        return float(end)
    alpha = min(max(t / (t_max - 1), 0.0), 1.0)
    return float(start + (end - start) * alpha)


class OracleRBM:
    """Reference rbm.py semantics in NumPy with deterministic sampling."""

    def __init__(self, w, hb, vb, groups=(), weight_decay=0.0,
                 sparsity=False, sparsity_factor=0.05):
        self.w = np.array(w, np.float32)
        self.hb = np.array(hb, np.float32)
        self.vb = np.array(vb, np.float32)
        self.w_m = np.zeros_like(self.w)
        self.hb_m = np.zeros_like(self.hb)
        self.vb_m = np.zeros_like(self.vb)
        self.groups = tuple(groups)
        self.weight_decay = weight_decay
        self.sparsity = sparsity
        self.sparsity_factor = sparsity_factor

    # conditionals -----------------------------------------------------------
    def hidden_probs(self, v, T=1.0):
        return sigmoid((v @ self.w + self.hb) / max(1e-6, T))

    def visible_logits(self, h, T=1.0):
        return (h @ self.w.T + self.vb) / max(1e-6, T)

    def visible_probs(self, h, T=1.0):
        logits = self.visible_logits(h, T)
        p = sigmoid(logits)
        for s, e in self.groups:
            p[:, s:e] = softmax(logits[:, s:e], axis=1)
        return p

    def sample_visible(self, v_prob):
        v = det_sample(v_prob)
        for s, e in self.groups:
            probs = np.clip(v_prob[:, s:e], 1e-8, 1.0)
            idx = probs.argmax(axis=1)
            v[:, s:e] = 0.0
            v[np.arange(v.shape[0]), s + idx] = 1.0
        return v

    def free_energy(self, v):
        return -(v @ self.vb) - softplus(self.hb + v @ self.w).sum(axis=1)

    # CD-k update (rbm.py:181-227) -------------------------------------------
    def cd_update(self, data, lr, mom, cd):
        bsz = data.shape[0]
        pos_h = self.hidden_probs(data)
        pos_assoc = data.T @ pos_h
        h = det_sample(pos_h)
        for _ in range(cd):
            v_prob = self.visible_probs(h)
            v = self.sample_visible(v_prob)
            h_prob = self.hidden_probs(v)
            h = det_sample(h_prob)
        neg_assoc = v.T @ h_prob
        self.w_m = mom * self.w_m + lr * ((pos_assoc - neg_assoc) / bsz
                                          - self.weight_decay * self.w)
        self.w = self.w + self.w_m
        self.hb_m = mom * self.hb_m + lr * (pos_h.sum(0) - h_prob.sum(0)) / bsz
        if self.sparsity:
            self.hb_m = self.hb_m + (-lr * (pos_h.mean(0) - self.sparsity_factor))
        self.hb = self.hb + self.hb_m
        self.vb_m = mom * self.vb_m + lr * (data.sum(0) - v.sum(0)) / bsz
        self.vb = self.vb + self.vb_m
        return np.mean((data - v_prob) ** 2)

    # conditional samplers ------------------------------------------------------
    def conditional_gibbs(self, v_known, km, n_steps, sample_h=False,
                          sample_v=False):
        v = v_known * km + (1 - km) * 0.5
        for _ in range(n_steps):
            h_prob = self.hidden_probs(v)
            h = det_sample(h_prob) if sample_h else h_prob
            v_prob = self.visible_probs(h)
            v = v_prob * (1 - km) + v_known * km
            if sample_v:
                v = self.sample_visible(v) * (1 - km) + v_known * km
        return self.visible_probs(self.hidden_probs(v))

    def sampled_conditional_chain(self, v_known, km, n_steps):
        """Fully sampled clamped Gibbs (framework extension: the chain
        behind sample_txt2img/sample_cross — rbm_ops
        .sampled_conditional_chain). Uniform init := 0.5; h and v both
        det-sampled each step; final SAMPLED v returned (no mean-field
        pass)."""
        v = v_known * km + (1 - km) * 0.5
        for _ in range(n_steps):
            h = det_sample(self.hidden_probs(v))
            v_prob = self.visible_probs(h)
            v_new = self.sample_visible(v_prob)
            v = v_new * (1 - km) + v_known * km
        return v

    def conditional_gibbs_annealed(self, v_known, km, n_steps=40, T0=2.5,
                                   T1=1.0, sample_h_until=20,
                                   sample_v_every=0, final_meanfield=True):
        v = v_known * km + (1 - km) * 0.5
        hot = int(max(0, min(n_steps, sample_h_until)))
        for t in range(n_steps):
            Tt = lin_schedule(t, n_steps, T0, T1)
            if (n_steps - t) <= 3:
                Tt = min(0.9, Tt)
            h_prob = self.hidden_probs(v, T=Tt)
            h = det_sample(h_prob) if t < hot else h_prob
            v_prob = self.visible_probs(h, T=Tt)
            if (t < hot) and (sample_v_every > 0) and (t % sample_v_every == 0):
                v_new = self.sample_visible(v_prob)
            else:
                v_new = v_prob
            v = v_new * (1 - km) + v_known * km
        if final_meanfield:
            h_prob = self.hidden_probs(v, T=1.0)
            v = self.visible_probs(h_prob, T=1.0) * (1 - km) + v_known * km
        return v

    def noisy_meanfield_annealed(self, v_known, km, n_steps=72, T0=3.0,
                                 T1=1.0, sigma0=0.9, sharpen_last=3,
                                 T_cold_plus=0.9, mu_k=None, eta0=0.15):
        # Noise is deterministic-zero in oracle mode regardless of sigma0.
        v = v_known * km + (1 - km) * 0.5
        for t in range(n_steps):
            Tt = lin_schedule(t, n_steps, T0, T1)
            if (n_steps - t) <= max(1, int(sharpen_last)):
                Tt = T_cold_plus
            h_logits = (v @ self.w + self.hb) / max(1e-6, Tt)
            h_prob = sigmoid(h_logits)
            v_logits = (h_prob @ self.w.T + self.vb) / max(1e-6, Tt)
            v_prob = sigmoid(v_logits)
            for s, e in self.groups:
                v_prob[:, s:e] = softmax(v_logits[:, s:e], axis=1)
            if mu_k is not None:
                Dz = mu_k.shape[1]
                eta_t = eta0 * max(0.0, 1.0 - (t / max(1, n_steps - 1)))
                v_prob[:, :Dz] = (1 - eta_t) * v_prob[:, :Dz] + eta_t * mu_k
            v = v_prob * (1 - km) + v_known * km
        return v

    def clamped_cd_update(self, v_known, km, lr, mom, cd=1,
                          cond_init_steps=50, sample_h=True, sample_v=False,
                          reclamp_negative=True, aux_lr_mult=0.3,
                          use_noisy_init=True, mu_k=None, eta0=0.15):
        bsz = v_known.shape[0]
        if use_noisy_init:
            v_plus = self.noisy_meanfield_annealed(
                v_known, km, n_steps=max(10, int(cond_init_steps)),
                T0=3.0, T1=1.0, sigma0=0.9, sharpen_last=2, T_cold_plus=0.9,
                mu_k=mu_k, eta0=eta0)
        else:
            v_plus = self.conditional_gibbs(v_known, km, cond_init_steps,
                                            sample_h=sample_h,
                                            sample_v=sample_v)
        h_plus = self.hidden_probs(v_plus)
        pos_assoc = v_plus.T @ h_plus
        v_neg = v_plus.copy()
        for _ in range(cd):
            h_prob = self.hidden_probs(v_neg)
            h = det_sample(h_prob) if sample_h else h_prob
            v_prob = self.visible_probs(h)
            if reclamp_negative:
                v_neg = v_prob * (1 - km) + v_known * km
            else:
                v_neg = v_prob
            if sample_v:
                v_neg = self.sample_visible(v_neg)
        h_neg = self.hidden_probs(v_neg)
        neg_assoc = v_neg.T @ h_neg
        scaled = aux_lr_mult * lr
        self.w_m = mom * self.w_m + scaled * ((pos_assoc - neg_assoc) / bsz
                                              - self.weight_decay * self.w)
        self.w = self.w + self.w_m
        self.hb_m = mom * self.hb_m + scaled * (h_plus.sum(0) - h_neg.sum(0)) / bsz
        self.hb = self.hb + self.hb_m
        self.vb_m = mom * self.vb_m + scaled * (v_plus.sum(0) - v_neg.sum(0)) / bsz
        self.vb = self.vb + self.vb_m
        return np.mean((v_plus - v_neg) ** 2)


def dbn_decode_sampled_oracle(oracles, top):
    """Ancestral-sampled decode (framework extension, dbn_train
    .dbn_decode_sampled): det-sample every intermediate layer on the way
    down, probabilities at the bottom."""
    cur = top
    n = len(oracles)
    for i, o in enumerate(reversed(list(oracles))):
        cur = o.visible_probs(cur)
        if i < n - 1:
            cur = det_sample(cur)
    return cur
