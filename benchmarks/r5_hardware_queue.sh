#!/bin/bash
# Round-5 hardware queue: the four outstanding on-chip jobs (VERDICT r4
# items 1-3, 5) back to back. Each job is bounded with `timeout`, logs to
# /tmp/r5_*.log, and — the round-4 lesson (a truncated capture went
# unnoticed because only `tail` ran) — every job's EXIT STATUS is checked
# and recorded; the suite capture is only promoted into the repo when the
# run exited 0 AND emitted the expected final metric.
#
# Usage: nohup bash benchmarks/r5_hardware_queue.sh > /tmp/r5_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

FAILED=0

probe() {
  timeout 90 python - <<'EOF' 2>/dev/null
import time, jax, jax.numpy as jnp
x = jnp.ones((8, 8))
f = jax.jit(lambda a: (a @ a).sum())
float(f(x))
t0 = time.time(); float(f(x)); rtt = (time.time() - t0) * 1000
print(f"RTT_MS={rtt:.1f}")
EOF
}

echo "[queue] probing tunnel ..."
while true; do
  out=$(probe)
  if [[ "$out" == RTT_MS=* ]]; then
    echo "[queue] tunnel healthy: $out ($(date))"
    break
  fi
  echo "[queue] tunnel wedged ($(date)); retry in 120s"
  sleep 120
done

run_job() {
  local name="$1" tmo="$2" log="$3"; shift 3
  echo "[queue] === $name ($(date)) ==="
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  if [[ $rc -ne 0 ]]; then
    FAILED=1
    echo "[queue] !!! $name FAILED exit=$rc ($(date)) — see $log"
  else
    echo "[queue] $name ok ($(date))"
  fi
  tail -4 "$log"
  return $rc
}

# --- job 1: full bench suite (first: the tunnel is healthy NOW, and the
# in-repo capture is VERDICT item 3) ---
run_job "bench suite" 2400 /tmp/r5_suite.log python benchmarks/bench_suite.py
if [[ $? -eq 0 ]] && grep -q '"metric": "train_step_throughput_416_bs32"' /tmp/r5_suite.log; then
  grep '^{' /tmp/r5_suite.log > benchmarks/SUITE_r05.jsonl
  echo "[queue] SUITE_r05.jsonl written ($(wc -l < benchmarks/SUITE_r05.jsonl) metrics)"
else
  FAILED=1
  echo "[queue] !!! suite capture INCOMPLETE — NOT promoting to benchmarks/"
fi

# --- job 2: the reference's full default recipe as ONE composition
# (k-means custom anchors + darknet backbone import + mosaic + multi-scale
# + warmup + early stop; VERDICT item 1 / BASELINE config #3) ---
run_job "composed full recipe" 10800 /tmp/r5_composed.log \
  python benchmarks/convergence_run.py \
    --kmeans-anchors --load-weights --mosaic --decay-lr \
    --max-num-steps 700 --identifier composed_r5 --root /tmp/conv_composed

# --- job 3: CSPDarknet53 trained to convergence, mosaic pairing
# (VERDICT item 2 / BASELINE config #5 / reference README.md:40) ---
run_job "CSP convergence" 7200 /tmp/r5_csp.log \
  python benchmarks/convergence_run.py \
    --backbone cspdarknet53 --mosaic --no-multi-scale --decay-lr \
    --max-num-steps 550 --identifier csp_r5 --root /tmp/conv_csp

# --- job 4: hi-res quality anchor: 416 vs 608 vs 832 eval on the
# small-defect set (VERDICT item 5) ---
run_job "hires eval" 9000 /tmp/r5_hires.log \
  python benchmarks/hires_eval.py --max-num-steps 700

# --- job 5: headline re-check ---
run_job "bench.py headline" 900 /tmp/r5_bench.log python bench.py

if [[ $FAILED -ne 0 ]]; then
  echo "[queue] DONE WITH FAILURES ($(date)) — grep '!!!' above"
else
  echo "[queue] ALL DONE OK ($(date))"
fi
