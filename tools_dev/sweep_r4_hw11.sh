#!/bin/bash
# Round-4 hardware batch #11 (truly final): RECT transposed dense records.
set -u
LOG="${1:-/root/repo/tools_dev/r4hw11.log}"
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
    if [ "$tries" -ge 12 ]; then echo "--- giving up" >> "$LOG"; return 1; fi
    sleep 300
  done
}
echo "##### sweep_r4_hw11 start $(date -u) commit $(git rev-parse --short HEAD)" >> "$LOG"
echo "=== 1 KBENCH RECT=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate kbrt && env KB_ITERS=30 TRIDENT_RECT=1 KB_CONFIGS=zero,dflt,full \
  timeout 2400 python -u tools_dev/kbench.py >> "$LOG" 2>&1
echo "=== END kbrt exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== 2 BENCH 1M RECT=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate brt && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_RECT=1 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END brt exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== 3 FLAVORS RECT=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate frt && env TRIDENT_RECT=1 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END frt exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r4_hw11 done $(date -u)" >> "$LOG"
