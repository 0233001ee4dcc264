#!/bin/bash
# Round-4 hardware queue: wait for the axon tunnel to recover, then run the
# three outstanding on-chip jobs back to back (VERDICT r3 items 2 and 3),
# then a fresh bench-suite capture. Each job is bounded with `timeout` and
# logs to /tmp/r4_*.log; this script never kills by pattern.
#
# Usage: nohup bash benchmarks/r4_hardware_queue.sh > /tmp/r4_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

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

echo "[queue] waiting for tunnel recovery ..."
while true; do
  out=$(probe)
  if [[ "$out" == RTT_MS=* ]]; then
    echo "[queue] tunnel healthy: $out ($(date))"
    break
  fi
  echo "[queue] tunnel still wedged ($(date)); retry in 120s"
  sleep 120
done

echo "[queue] === job 1: int8+bf16 hermetic export on chip ==="
timeout 2400 python benchmarks/serve_export_tpu.py --mode both \
  > /tmp/r4_export.log 2>&1
echo "[queue] export exit=$? ($(date))"
tail -5 /tmp/r4_export.log

echo "[queue] === job 2: mosaic convergence run ==="
timeout 5400 python benchmarks/convergence_run.py \
  --mosaic --no-multi-scale --decay-lr \
  --max-num-steps 550 --identifier mosaic_r4 --root /tmp/conv_mosaic \
  > /tmp/r4_mosaic.log 2>&1
echo "[queue] mosaic exit=$? ($(date))"
tail -3 /tmp/r4_mosaic.log

echo "[queue] === job 3: frozen-backbone fine-tune ==="
timeout 5400 python benchmarks/convergence_run.py \
  --freeze-backbone --no-multi-scale --decay-lr \
  --max-num-steps 700 --identifier freeze_r4 --root /tmp/conv_freeze \
  > /tmp/r4_freeze.log 2>&1
echo "[queue] freeze exit=$? ($(date))"
tail -3 /tmp/r4_freeze.log

echo "[queue] === job 4: full bench suite ==="
timeout 2400 python benchmarks/bench_suite.py > /tmp/r4_suite.log 2>&1
echo "[queue] suite exit=$? ($(date))"
tail -25 /tmp/r4_suite.log

echo "[queue] ALL DONE ($(date))"
