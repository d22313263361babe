"""Microbenchmark: is in-kernel sampling fusion worth building for the
stochastic CD chain? (ROADMAP gap 2 — "measure before building".)

Decomposes one CD-k update on the flagship joint RBM shape
(532 visible / 500 hidden, batch 128, softmax label group) into:

  1. full sampled CD-k update (the production `cd_update` path),
  2. the same chain with sampling removed (mean-field CD — same matmuls
     and sigmoids, no threefry / no compare),
  3. pure sampling cost (threefry uniform + compare on the same shapes).

All variants run B_STEPS times inside ONE `lax.scan` dispatch so the
axon-tunnel latency (~0.25 s/call) does not pollute the per-step numbers.
If (1) - (2) is a small fraction of (1), XLA's separate threefry kernels
are already cheap relative to the MXU work and a fused Pallas sampled
chain cannot win meaningfully. Results are recorded in RESULTS.md.

Usage: python benchmarks/microbench_cd.py [--steps 400] [--cd 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_idbn_tpu.ops import rbm_ops
from multimodal_idbn_tpu.ops.sampling import (apply_softmax_groups,
                                              sample_bernoulli)

V, H, B = 532, 500, 128
GROUPS = ((500, 532),)


def timed_scan(fn, carry, n_steps, label):
    """Scan fn n_steps times in one dispatch; return per-step seconds."""

    @jax.jit
    def run(carry):
        def body(c, i):
            return fn(c, i), ()
        c, _ = jax.lax.scan(body, carry, jnp.arange(n_steps))
        return c

    out = run(carry)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(carry)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_steps
    print(f"  {label:34s} {dt * 1e6:9.1f} us/step", file=sys.stderr)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--cd", type=int, default=5)
    args = ap.parse_args()

    print(f"[microbench] devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.key(0)
    state = rbm_ops.init_rbm_state(key, V, H)
    data = jnp.asarray(
        (np.random.RandomState(0).rand(B, V) < 0.3).astype(np.float32))

    # 1) full sampled CD-k update (production path)
    def full_cd(carry, i):
        st, k = carry
        k = jax.random.fold_in(k, i)
        st, _ = rbm_ops.cd_update(st, k, data, lr=0.04, mom=0.5,
                                  weight_decay=1e-4, cd=args.cd,
                                  groups=GROUPS)
        return (st, k)

    t_full = timed_scan(full_cd, (state, key), args.steps,
                        f"sampled CD-{args.cd} update")

    # 2) mean-field CD-k (identical matmuls/sigmoids, zero sampling)
    def mf_cd(carry, i):
        st, v = carry
        pos_h = rbm_ops.hidden_probs(st, data)
        h = pos_h
        for _ in range(args.cd):
            v = rbm_ops.visible_probs(st, h, groups=GROUPS)
            h = rbm_ops.hidden_probs(st, v)
        pos = data.T @ pos_h
        neg = v.T @ h
        w_m = st.w_m * 0.5 + 0.04 * ((pos - neg) / B - 1e-4 * st.w)
        st = st._replace(w=st.w + w_m, w_m=w_m)
        return (st, v)

    t_mf = timed_scan(mf_cd, (state, data), args.steps,
                      f"mean-field CD-{args.cd} (no sampling)")

    # 3) pure sampling cost on the chain's shapes: per CD step the chain
    # samples one [B,V] visible (production `sample_visible` — Bernoulli
    # + Gumbel-max categorical for the softmax label group) and one [B,H]
    # hidden, plus the initial hidden draw. Every draw feeds the carry so
    # XLA cannot dead-code-eliminate any of the 2*cd+1 draws.
    from multimodal_idbn_tpu.ops.sampling import sample_visible

    def sampling_core(keys, acc):
        vlike = acc[:, :V]
        hlike = acc[:, :H]
        out = sample_bernoulli(keys[0], jax.nn.sigmoid(hlike))
        for s in range(args.cd):
            v_prob = apply_softmax_groups(jax.nn.sigmoid(vlike), vlike,
                                          GROUPS)
            sv = sample_visible(keys[1 + 2 * s], v_prob, GROUPS)
            sh = sample_bernoulli(keys[2 + 2 * s], jax.nn.sigmoid(hlike))
            vlike = vlike + sv * 1e-9
            hlike = hlike + sh * 1e-9
        # fold every sampled tensor into the carry (keeps all draws live)
        return acc + 1e-9 * (vlike.sum() + hlike.sum() + out.sum())

    def sampling_only(carry, i):
        k, acc = carry
        k = jax.random.fold_in(k, i)
        keys = jax.random.split(k, 2 * args.cd + 1)
        return (k, sampling_core(keys, acc))

    acc = jnp.zeros((B, V), jnp.float32)
    t_samp = timed_scan(sampling_only, (key, acc), args.steps,
                        f"threefry sampling only ({2 * args.cd + 1} draws)")

    # 3b) same draws with keys pre-split OUTSIDE the scan — isolates key
    # management (fold_in/split kernels) from the uniform draws proper.
    all_keys = jax.random.split(key, args.steps * (2 * args.cd + 1)).reshape(
        args.steps, 2 * args.cd + 1)

    def sampling_presplit(carry, i):
        acc, = carry
        return (sampling_core(all_keys[i], acc),)

    t_pre = timed_scan(sampling_presplit, (acc,), args.steps,
                       "  ... with pre-split keys")

    overhead = t_full - t_mf
    print(f"  sampling overhead (full - MF):     "
          f"{overhead * 1e6:9.1f} us/step "
          f"({100 * overhead / t_full:.1f}% of full)", file=sys.stderr)

    import json
    print(json.dumps({
        "shape": f"{V}x{H} b{B} cd{args.cd}",
        "full_cd_us": round(t_full * 1e6, 1),
        "meanfield_cd_us": round(t_mf * 1e6, 1),
        "sampling_only_us": round(t_samp * 1e6, 1),
        "sampling_presplit_us": round(t_pre * 1e6, 1),
        "sampling_overhead_pct": round(100 * overhead / t_full, 1),
    }))


if __name__ == "__main__":
    main()
