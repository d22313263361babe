"""Benchmark: CD-1 epoch on the flagship [10000, 1500, 500] iDBN.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

- value: steady-state wall-clock per fused on-device training epoch
  (batch 128, N=2048 synthetic samples, CD-1, both layers updated per
  batch — the reference's iterative schedule, SURVEY.md §2.1(8)).
- vs_baseline: speedup over the PyTorch-CPU reference semantics (the
  reference publishes no numbers, SURVEY.md §6, so the denominator is
  measured here: identical math implemented in torch on CPU, timed on a
  few batches and extrapolated to the epoch).

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

LAYERS = (10000, 1500, 500)
BATCH = 128
N_SAMPLES = 2048
CD = 1

# TPU v5e bf16 peak (XLA runs f32 matmuls at bf16 precision by default
# here). Any measured epoch implying more than this is a tunnel artifact,
# not a measurement — groups above peak are discarded (VERDICT r1 §weak 1).
PEAK_FLOPS = 197e12
PEAK_HBM = 819e9  # v5e HBM bandwidth, bytes/s


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def epoch_flops(layers=LAYERS, batch=BATCH, n=N_SAMPLES, cd=CD):
    """Analytic GEMM FLOPs of one fused iDBN epoch (elementwise ignored).

    Per layer per batch: pos hidden probs, pos association, cd×(visible
    reconstruction + hidden probs), negative association, plus the
    hidden_probs pass that feeds the next layer = (4 + 2*cd) GEMMs of
    2*B*V*H FLOPs each (reference hot loop rbm.py:181-227).
    """
    nb = n // batch
    total = 0.0
    for v, h in zip(layers[:-1], layers[1:]):
        total += (4 + 2 * cd) * 2.0 * batch * v * h
    return total * nb


def epoch_hbm_bytes(layers=LAYERS, batch=BATCH, n=N_SAMPLES, cd=CD,
                    bytes_per_el=4.0):
    """Estimated HBM traffic of one fused epoch (W-sized arrays only).

    At batch 128 the W-sized arrays dominate: per cd_update the GEMMs
    read W (2 + cd) times and produce the two V×H association matrices,
    and the momentum update reads W + W_m and writes W + W_m. Assuming
    XLA fuses each association GEMM's output straight into the update
    epilogue (it reads them once: +2 reads, no extra writes), that is
    (2 + cd) + 2 + 4 = 8 + cd W-sized transfers per layer per batch.
    Activations (B×V / B×H) are negligible by comparison. An ESTIMATE —
    fusion can save or add a transfer — but it makes the point that the
    epoch is memory-bound, so HBM roofline (not MFU) is the
    speed-of-light yardstick.
    """
    nb = n // batch
    total = 0.0
    for v, h in zip(layers[:-1], layers[1:]):
        total += (8 + cd) * bytes_per_el * v * h
    return total * nb


def make_data(n=N_SAMPLES, v=LAYERS[0], seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, v) < 0.12).astype(np.float32)  # ~dot-image sparsity


def bench_jax():
    import jax
    import jax.numpy as jnp

    from multimodal_idbn_tpu.ops import dbn_train, rbm_ops

    log(f"[bench] jax devices: {jax.devices()}")
    data = jnp.asarray(make_data())
    keys = jax.random.split(jax.random.key(0), len(LAYERS))
    states = tuple(
        rbm_ops.init_rbm_state(keys[i], LAYERS[i], LAYERS[i + 1])
        for i in range(len(LAYERS) - 1))
    kwargs = dict(cd=CD, sparsity_flags=(False, True), batch_size=BATCH)

    def epoch(states, e):
        return dbn_train.idbn_epoch(states, jax.random.fold_in(keys[-1], e),
                                    data, 0.1, 0.5, 1e-4, 0.1, **kwargs)

    t0 = time.perf_counter()
    states, _ = epoch(states, 0)
    jax.block_until_ready(states)
    log(f"[bench] first epoch (compile): {time.perf_counter() - t0:.1f}s")

    # Median over groups: per-dispatch tunnel jitter makes small-group
    # averages wobble run-to-run; ≥20 epochs/group amortizes the round
    # trip and a host-side value fetch (not just block_until_ready, which
    # can return early through the tunnel) forces true completion of the
    # whole epoch chain (each epoch carries the previous one's states).
    flops = epoch_flops()
    hbm = epoch_hbm_bytes()
    group, n_groups = 20, 5
    e = 1
    # Warmup group: absorbs any residual compile/autotune work the first
    # post-compile dispatches trigger (observed ~15 s on the first group).
    for _ in range(3):
        states, losses = epoch(states, e)
        e += 1
    float(losses[-1, -1])
    times = []
    for _ in range(n_groups):
        t0 = time.perf_counter()
        for _ in range(group):
            states, losses = epoch(states, e)
            e += 1
        final_loss = float(losses[-1, -1])  # device->host fetch = barrier
        times.append((time.perf_counter() - t0) / group)
    implied = [flops / t for t in times]
    log(f"[bench] groups: {[round(t * 1000, 2) for t in times]} ms/epoch, "
        f"implied {[round(f / 1e12, 1) for f in implied]} TFLOP/s "
        f"(peak {PEAK_FLOPS / 1e12:.0f}), loss {final_loss:.4f}")
    valid = [t for t in times if flops / t <= PEAK_FLOPS]
    if valid:
        dt = float(np.median(valid))
        if len(valid) < len(times):
            log(f"[bench] WARNING: discarded {len(times) - len(valid)} "
                f"group(s) implying FLOP/s above chip peak "
                f"(tunnel artifact)")
    else:
        dt = flops / PEAK_FLOPS
        log("[bench] WARNING: every group implied FLOP/s above chip peak "
            "— reporting the speed-of-light bound instead of an "
            "impossible reading")
    # Opt-in bf16 storage (halves the W-traffic the epoch is bound on).
    bf16_dt = None
    try:
        states16 = tuple(
            rbm_ops.init_rbm_state(keys[i], LAYERS[i], LAYERS[i + 1],
                                   dtype=jnp.bfloat16)
            for i in range(len(LAYERS) - 1))
        t0 = time.perf_counter()
        states16, l16 = epoch(states16, 0)
        float(l16[-1, -1])
        log(f"[bench] bf16 first epoch (compile): "
            f"{time.perf_counter() - t0:.1f}s")
        times16 = []
        e16 = 1
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(group):
                states16, l16 = epoch(states16, e16)
                e16 += 1
            f16_loss = float(l16[-1, -1])
            times16.append((time.perf_counter() - t0) / group)
        v16 = [t for t in times16 if flops / t <= PEAK_FLOPS]
        if v16:
            bf16_dt = float(np.median(v16))
            log(f"[bench] bf16 epoch: {bf16_dt * 1000:.2f} ms median "
                f"({hbm / 2 / bf16_dt / 1e9:.0f} GB/s eff, loss "
                f"{f16_loss:.4f}; groups "
                f"{[round(t * 1000, 2) for t in times16]} ms)")
    except Exception as exc:  # pragma: no cover - optional path
        log(f"[bench] bf16 variant unavailable: {exc}")

    # True-f32 GEMMs ("highest" matmul precision — the torch reference's
    # numerics; TPU default runs f32 matmuls at bf16 input precision).
    # This is the precision the quality-critical training paths pin
    # (config.set_matmul_precision), so its speed cost is a headline
    # extra (VERDICT r3 item 2).
    hp_dt = None
    try:
        states_hp = tuple(
            rbm_ops.init_rbm_state(keys[i], LAYERS[i], LAYERS[i + 1])
            for i in range(len(LAYERS) - 1))
        with jax.default_matmul_precision("highest"):
            t0 = time.perf_counter()
            states_hp, lhp = epoch(states_hp, 0)
            float(lhp[-1, -1])
            log(f"[bench] highest-precision first epoch (compile): "
                f"{time.perf_counter() - t0:.1f}s")
            times_hp = []
            ehp = 1
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(group):
                    states_hp, lhp = epoch(states_hp, ehp)
                    ehp += 1
                fhp_loss = float(lhp[-1, -1])
                times_hp.append((time.perf_counter() - t0) / group)
        vhp = [t for t in times_hp if flops / t <= PEAK_FLOPS]
        if vhp:
            hp_dt = float(np.median(vhp))
            log(f"[bench] highest-precision epoch: {hp_dt * 1000:.2f} ms "
                f"median (loss {fhp_loss:.4f}; groups "
                f"{[round(t * 1000, 2) for t in times_hp]} ms)")
    except Exception as exc:  # pragma: no cover - optional path
        log(f"[bench] highest-precision variant unavailable: {exc}")

    # Mixed precision (COMPUTE_DTYPE): f32 master weights, bf16 chain
    # GEMMs — the quality-preserving fast mode (pure bf16 storage
    # collapses flagship quality, benchmarks/RESULTS.md round-2 study).
    mixed_dt = None
    try:
        statesm = tuple(
            rbm_ops.init_rbm_state(keys[i], LAYERS[i], LAYERS[i + 1])
            for i in range(len(LAYERS) - 1))

        def epoch_mixed(states, e):
            return dbn_train.idbn_epoch(
                states, jax.random.fold_in(keys[-1], e), data, 0.1, 0.5,
                1e-4, 0.1, compute_dtype=jnp.bfloat16, **kwargs)

        t0 = time.perf_counter()
        statesm, lm = epoch_mixed(statesm, 0)
        float(lm[-1, -1])
        log(f"[bench] mixed first epoch (compile): "
            f"{time.perf_counter() - t0:.1f}s")
        timesm = []
        em = 1
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(group):
                statesm, lm = epoch_mixed(statesm, em)
                em += 1
            fm_loss = float(lm[-1, -1])
            timesm.append((time.perf_counter() - t0) / group)
        vm = [t for t in timesm if flops / t <= PEAK_FLOPS]
        if vm:
            mixed_dt = float(np.median(vm))
            log(f"[bench] mixed-precision epoch: {mixed_dt * 1000:.2f} ms "
                f"median (loss {fm_loss:.4f}; groups "
                f"{[round(t * 1000, 2) for t in timesm]} ms)")
    except Exception as exc:  # pragma: no cover - optional path
        log(f"[bench] mixed variant unavailable: {exc}")

    mfu = flops / dt / PEAK_FLOPS
    hbm_util = hbm / dt / PEAK_HBM
    log(f"[bench] steady-state epoch: {dt * 1000:.2f} ms median "
        f"({flops / 1e9:.0f} GFLOP -> {flops / dt / 1e12:.1f} TFLOP/s, "
        f"MFU {mfu:.0%}; ~{hbm / 1e9:.1f} GB -> {hbm / dt / 1e9:.0f} GB/s, "
        f"HBM roofline {hbm_util:.0%} — memory-bound at batch {BATCH}; "
        f"spread {min(times) * 1000:.2f}-{max(times) * 1000:.2f} ms)")
    extras = {"implied_tflops": round(flops / dt / 1e12, 1),
              "mfu": round(mfu, 3),
              "hbm_roofline": round(hbm_util, 3),
              "spread_ms": [round(min(times) * 1000, 2),
                            round(max(times) * 1000, 2)]}
    if bf16_dt is not None:
        extras["bf16_epoch_s"] = round(bf16_dt, 5)
    if mixed_dt is not None:
        extras["mixed_epoch_s"] = round(mixed_dt, 5)
    if hp_dt is not None:
        extras["highest_precision_epoch_s"] = round(hp_dt, 5)
    # Precision the HEADLINE value is measured at (XLA's default:
    # bf16-input f32 matmuls on TPU) — kept for r1-r3 continuity; the
    # quality-critical training entry points pin "highest"
    # (config.set_matmul_precision), whose cost is the extra above.
    extras["matmul_precision"] = "default"
    return dt, extras


def bench_torch_cpu():
    """Reference-semantics CD-1 epoch on torch CPU (the reference's own
    execution model: per-batch loop, one device), extrapolated from a few
    timed batches."""
    import torch

    torch.manual_seed(0)

    class TorchRBM:
        def __init__(self, v, h):
            self.W = torch.randn(v, h) / (v ** 0.5)
            self.hb = torch.zeros(h)
            self.vb = torch.zeros(v)
            self.W_m = torch.zeros_like(self.W)
            self.hb_m = torch.zeros_like(self.hb)
            self.vb_m = torch.zeros_like(self.vb)

        @torch.no_grad()
        def train_epoch(self, data, lr=0.1, mom=0.5, wd=1e-4, cd=CD):
            bsz = data.size(0)
            pos_h = torch.sigmoid(data @ self.W + self.hb)
            pos_assoc = data.T @ pos_h
            h = (pos_h > torch.rand_like(pos_h)).float()
            for _ in range(cd):
                v_prob = torch.sigmoid(h @ self.W.T + self.vb)
                v = (v_prob > torch.rand_like(v_prob)).float()
                h_prob = torch.sigmoid(v @ self.W + self.hb)
                h = (h_prob > torch.rand_like(h_prob)).float()
            neg_assoc = v.T @ h_prob
            self.W_m.mul_(mom).add_(lr * ((pos_assoc - neg_assoc) / bsz
                                          - wd * self.W))
            self.W.add_(self.W_m)
            self.hb_m.mul_(mom).add_(lr * (pos_h.sum(0)
                                           - h_prob.sum(0)) / bsz)
            self.hb.add_(self.hb_m)
            self.vb_m.mul_(mom).add_(lr * (data.sum(0) - v.sum(0)) / bsz)
            self.vb.add_(self.vb_m)
            return torch.sigmoid(data @ self.W + self.hb)

    rbms = [TorchRBM(LAYERS[i], LAYERS[i + 1])
            for i in range(len(LAYERS) - 1)]
    data = torch.from_numpy(make_data())
    nb = N_SAMPLES // BATCH

    def one_batch(b):
        v = data[b * BATCH:(b + 1) * BATCH]
        for rbm in rbms:
            v = rbm.train_epoch(v)
        return v

    one_batch(0)  # warm caches
    # MEAN per-batch matches the pinned calibration's protocol (it was
    # measured as a mean in round 2), so the drift ratio compares like
    # with like; the min is logged as the contention-robust floor.
    n_timed = 4
    per_batch_times = []
    for b in range(1, 1 + n_timed):
        t0 = time.perf_counter()
        one_batch(b)
        per_batch_times.append(time.perf_counter() - t0)
    per_batch = sum(per_batch_times) / n_timed
    epoch_s = per_batch * nb
    log(f"[bench] torch-CPU per-batch {per_batch * 1000:.0f} ms mean "
        f"(min {min(per_batch_times) * 1000:.0f}, "
        f"max {max(per_batch_times) * 1000:.0f}) -> "
        f"epoch {epoch_s:.2f}s ({nb} batches)")
    return epoch_s


def bench_gibbs_chains():
    """Secondary BASELINE metric: HBM-resident joint-chain throughput
    (flagship joint RBM 500+32→500, batch 128, softmax label group)."""
    from multimodal_idbn_tpu.utils.profiling import measure_gibbs_steps_per_sec

    stats = measure_gibbs_steps_per_sec(num_visible=532, num_hidden=500,
                                        batch_size=128, n_steps=500)
    log(f"[bench] joint Gibbs chain: "
        f"{stats['chain_steps_per_sec']:.0f} chain-steps/s "
        f"({stats['cell_updates_per_sec']:.3e} cell updates/s)")
    return stats


def probe_backend(attempts=None, probe_timeout=None):
    """Return True iff JAX backend init succeeds in a FRESH bounded
    subprocess.

    When the axon terminal is down, ``jax.devices()`` hangs ~25 min and
    then raises — and a process whose backend init failed once is
    poisoned (CLAUDE.md: poll for recovery with a fresh process per
    attempt). BENCH_r04 was lost to exactly this: an unguarded
    ``jax.devices()`` killed the whole bench with no JSON line. The
    probe keeps each attempt bounded and the parent process clean.
    """
    if attempts is None:
        attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", 3))
    if probe_timeout is None:
        probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", 300))
    for i in range(attempts):
        t0 = time.perf_counter()
        try:
            rc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL).returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        dt = time.perf_counter() - t0
        log(f"[bench] backend probe {i + 1}/{attempts}: "
            f"{'ok' if rc == 0 else rc} in {dt:.0f}s")
        if rc == 0:
            return True
    return False


def main():
    # Orchestrator layout (VERDICT r4 weak #1): this process NEVER
    # touches the TPU backend itself. The torch-CPU denominator (no TPU
    # needed) is measured first so it survives any outage; the JAX side
    # runs in a bounded child (``bench.py --jax-only``) after a fresh-
    # subprocess backend probe. Every exit path prints one JSON line.
    if "--jax-only" in sys.argv:
        from multimodal_idbn_tpu.config import (
            enable_persistent_compilation_cache)
        enable_persistent_compilation_cache()
        jax_epoch, extras = bench_jax()
        try:
            extras["gibbs"] = bench_gibbs_chains()
        except Exception as exc:  # pragma: no cover - secondary metric
            log(f"[bench] gibbs-chain metric unavailable: {exc}")
        print(json.dumps({"jax_epoch": jax_epoch, "extras": extras}))
        return

    # vs_baseline uses a PINNED calibrated denominator (measured once on
    # an idle host, benchmarks/torch_cpu_calibration.json) so it is a
    # regression signal, not host-contention noise: round 2 vs round 3
    # measured 13.6 s vs 31.6 s for identical torch code purely from CPU
    # contention (VERDICT r3 weak #3). The live reading is still taken
    # and reported as drift.
    calib_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "torch_cpu_calibration.json")
    try:
        calib = json.load(open(calib_path))["torch_cpu_epoch_s"]
    except Exception as e:  # pragma: no cover - file ships with the repo
        log(f"[bench] calibration file unavailable ({e}); "
            f"falling back to the live torch reading")
        calib = None

    # Torch denominator FIRST — it needs no TPU, so an axon outage must
    # not cost it (BENCH_r04 lost it along with everything else).
    extras = {}
    torch_epoch = None
    try:
        if os.environ.get("BENCH_SKIP_TORCH") == "1":
            # Test hook only (tests/test_bench_cli.py): lets the outage
            # drill run in seconds without the multi-minute torch epoch.
            raise RuntimeError("BENCH_SKIP_TORCH=1")
        torch_epoch = bench_torch_cpu()
        if calib is not None:
            drift = torch_epoch / calib
            extras["torch_cpu_live_epoch_s"] = round(torch_epoch, 2)
            extras["torch_cpu_drift"] = round(drift, 2)
            if drift > 1.2:
                log(f"[bench] NOTE: live torch epoch {torch_epoch:.1f}s is "
                    f"{drift:.1f}x the calibrated {calib:.1f}s — host CPU "
                    f"contended; vs_baseline uses the calibration")
            elif drift < 0.95:
                log(f"[bench] NOTE: live torch epoch {torch_epoch:.1f}s "
                    f"beats the calibration {calib:.1f}s — consider "
                    f"updating {calib_path}")
    except Exception as e:  # pragma: no cover - env-dependent
        log(f"[bench] torch-CPU baseline unavailable: {e}")

    result = {
        "metric": "idbn_cd1_epoch_time_10000-1500-500_b128",
        "value": None,
        "unit": "s",
        "vs_baseline": None,
        **extras,
    }

    jax_payload = None
    if os.environ.get("BENCH_SIMULATE_OUTAGE") == "1":
        log("[bench] BENCH_SIMULATE_OUTAGE=1 — skipping probe, "
            "emitting the outage line")
        result["error"] = "tpu_unavailable"
    elif not probe_backend():
        log("[bench] backend unavailable after all probe attempts — "
            "emitting the outage line (torch denominator preserved)")
        result["error"] = "tpu_unavailable"
    else:
        # The JAX side runs in a bounded child so even a mid-run axon
        # drop (observed r4: connection lost after ~25 min of sustained
        # occupancy) still ends with a parseable line from this parent.
        budget = int(os.environ.get("BENCH_JAX_TIMEOUT_S", 2400))
        try:
            child = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--jax-only"],
                timeout=budget, stdout=subprocess.PIPE, text=True)
            if child.returncode == 0 and child.stdout.strip():
                jax_payload = json.loads(
                    child.stdout.strip().splitlines()[-1])
            else:
                result["error"] = (f"jax_bench_failed_rc"
                                   f"{child.returncode}")
        except subprocess.TimeoutExpired:
            log(f"[bench] JAX child exceeded {budget}s — killed")
            result["error"] = "jax_bench_timeout"
        except Exception as e:  # pragma: no cover - defensive
            result["error"] = f"jax_bench_error: {e}"

    if jax_payload is not None:
        jax_epoch = jax_payload["jax_epoch"]
        result["value"] = round(jax_epoch, 5)
        denom = calib if calib is not None else torch_epoch
        if denom is not None:
            result["vs_baseline"] = round(denom / jax_epoch, 2)
        result.update(jax_payload["extras"])
        result.update(extras)  # torch provenance wins over child copies
    print(json.dumps(result))


if __name__ == "__main__":
    main()
