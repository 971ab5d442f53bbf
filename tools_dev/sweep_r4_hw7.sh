#!/bin/bash
# Round-4 FINAL defaults confirmation: full five-config sweep + gated
# flavors at whatever defaults ship for BENCH_r04. Launch manually after
# the SUB decision (r4hw5).
set -u
LOG="${1:-/root/repo/tools_dev/r4hw7.log}"
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
echo "##### sweep_r4_hw7 start $(date -u) commit $(git rev-parse --short HEAD)" >> "$LOG"
echo "=== 1 FLAVOR GATE at final defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate fgate && timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END fgate exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== 2 FULL five-config at final defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate bfull && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 5400 python -u scripts/bench_sweep.py cube512 spheres1080 \
  spheres1080_1m ultra4k shadows1080 >> "$LOG" 2>&1
echo "=== END bfull exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r4_hw7 done $(date -u)" >> "$LOG"
