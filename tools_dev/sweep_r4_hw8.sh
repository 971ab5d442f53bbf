#!/bin/bash
# Round-4 hardware batch #8: the RECPAD DMA-bandwidth hypothesis.
#   1) kbench RECPAD=1 (zero should collapse from ~6.2 ms toward ~1 ms
#      if the padded-destination restride was the floor)
#   2) bench 1M RECPAD=1
#   3) bench 1M defaults (bracket)
#   4) flavors RECPAD=1 (gate)
set -u
LOG="${1:-/root/repo/tools_dev/r4hw8.log}"
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
echo "##### sweep_r4_hw8 start $(date -u) commit $(git rev-parse --short HEAD)" >> "$LOG"
echo "=== 1 KBENCH RECPAD=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate kbrp && env KB_ITERS=30 TRIDENT_RECPAD=1 KB_CONFIGS=zero,dflt,full \
  timeout 2400 python -u tools_dev/kbench.py >> "$LOG" 2>&1
echo "=== END kbrp exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== 2 BENCH 1M RECPAD=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate brp && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_RECPAD=1 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END brp exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== 3 BENCH 1M defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate bd && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END bd exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== 4 FLAVORS RECPAD=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate frp && env TRIDENT_RECPAD=1 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END frp exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r4_hw8 done $(date -u)" >> "$LOG"
