#!/bin/bash
# Round-5 serial TPU work queue. One TPU process at a time; every step
# gated on a fresh bounded backend probe (a failed init poisons its
# process — CLAUDE.md recovery rule). Results land in
# benchmarks/_staging/ (untracked) and are merged+committed by a live
# foreground step, never by this script (round-end hygiene rule).
set -u
cd /root/repo
STG=benchmarks/_staging
LOG=$STG/tpu_queue_r5.log
mkdir -p "$STG"

say() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

probe() { # wait (up to ~forever) for the backend, fresh process each try
  local n=0
  while true; do
    if timeout -k 15 300 python -c "import jax; jax.devices()" >/dev/null 2>&1
    then say "probe ok (attempt $((n+1)))"; return 0
    fi
    n=$((n+1)); say "probe down (attempt $n) — sleeping 600s"
    sleep 600
  done
}

run_step() { # run_step <name> <timeout_s> <cmd...> — up to 3 attempts
  local name=$1 tmo=$2; shift 2
  if [ -e "$STG/$name.done" ]; then say "$name: already done"; return; fi
  local a
  for a in 1 2 3; do
    probe
    say "$name: start (attempt $a)"
    local rc=0
    timeout -k 30 "$tmo" "$@" > "$STG/$name.json" 2> "$STG/$name.err" \
      || rc=$?
    if [ "$rc" -eq 0 ]; then
      touch "$STG/$name.done"; say "$name: OK"; return 0
    fi
    say "$name: FAILED rc=$rc on attempt $a (see $STG/$name.err)"
  done
}

# 1. perf record (bench.py is itself outage-proof and always emits JSON)
run_step bench_r5 3600 python bench.py

# 2. bf16+SR flagship quality, 2 seeds (VERDICT item 4). Default matmul
#    precision = the fast mode as a user would run it; crash-safe ckpts.
for s in 0 1; do
  run_step bf16sr_seed$s 5400 python benchmarks/quality_multimodal.py \
    --dtype bfloat16 --seed $s --matmul-precision default \
    --ckpt-dir "$STG/ckpt_bf16_s$s"
done

# 3. bimodal robustness seeds 5-10 (VERDICT item 5). Pinned to XLA
#    default matmul precision: the r3 seeds 0-4 these pool with predate
#    the --matmul-precision flag and ran at the XLA default.
for s in 5 6 7 8 9 10; do
  run_step bimodal_seed$s 3600 python benchmarks/quality_bimodal.py \
    --seed $s --matmul-precision default
done

# 4. per-round TPU obligations missed in r4 (VERDICT item 6):
#    kernel tests at HEAD on the real chip ...
run_step pallas_tpu 3600 env IDBN_TESTS_ON_TPU=1 \
  python -m pytest tests/test_pallas.py tests/test_pallas_chain.py -q

#    ... and a fresh flagship head-to-head ours-side eval at HEAD
#    (3 seeds, default precision, ~5 min/seed; crash-safe ckpts)
run_step h2h_head 14400 python benchmarks/reference_head_to_head.py \
  --flagship --roles ours --seeds 0 1 2 --ours-tpu --jobs 1 \
  --seed-retries 2 --ckpt-dir "$STG/ckpt_h2h_head" \
  --out "$STG/h2h_r5_head.json"

say "queue complete"
