#!/bin/bash
# Round-4 hardware batch #4: the 4K AI mode measured CORRECTLY
# (bench_sweep needs the :ai suffix — hw2 §7 passed env BENCH_AI=1 which
# bench_sweep clobbers, so it re-measured native 4K: 9.26 FPS), plus the
# 1080p AI mode for the record.
set -u
LOG="${1:-/root/repo/tools_dev/r4hw4.log}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

probe() {
  timeout 1500 python -u -c "
import jax, jax.numpy as jnp
print('probe ok:', float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()), flush=True)
" >> "$LOG" 2>&1
}
gate() {
  local tries=0
  until probe; do
    tries=$((tries+1))
    echo "--- tunnel down before $1 (probe fail #$tries), sleeping 300s" >> "$LOG"
    if [ "$tries" -ge 24 ]; then echo "--- giving up" >> "$LOG"; return 1; fi
    sleep 300
  done
}

echo "##### sweep_r4_hw4 start $(date -u) commit $(git rev-parse --short HEAD)" >> "$LOG"

echo "=== 1 BENCH AI modes (ultra4k:ai spheres1080_1m:ai) ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_ai && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 4200 python -u scripts/bench_sweep.py ultra4k:ai \
  spheres1080_1m:ai >> "$LOG" 2>&1
echo "=== END b_ai exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 2 BENCH interp (BASELINE config 4) ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_interp && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 BENCH_CONFIG=interp \
  timeout 1800 python -u bench.py >> "$LOG" 2>&1
echo "=== END b_interp exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "##### sweep_r4_hw4 done $(date -u)" >> "$LOG"
