#!/bin/bash
# Round-4 hardware batch #10 (final): deeper lookahead buffering of the
# record blocks (pl.Buffered) — the r4hw9 probes measured the per-pair
# record DMA ~1 us serialized and only partially hidden by the default
# double buffering.
set -u
LOG="${1:-/root/repo/tools_dev/r4hw10.log}"
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
echo "##### sweep_r4_hw10 start $(date -u) commit $(git rev-parse --short HEAD)" >> "$LOG"
echo "=== 1 KBENCH RECBUF=3 ($(date -u +%H:%M:%S))" >> "$LOG"
gate kb3 && env KB_ITERS=30 TRIDENT_RECBUF=3 KB_CONFIGS=zero,dflt,probe \
  timeout 2400 python -u tools_dev/kbench.py >> "$LOG" 2>&1
echo "=== END kb3 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== 2 BENCH 1M RECBUF=3 ($(date -u +%H:%M:%S))" >> "$LOG"
gate b3 && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_RECBUF=3 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END b3 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== 3 BENCH 1M RECBUF=4 ($(date -u +%H:%M:%S))" >> "$LOG"
gate b4 && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_RECBUF=4 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END b4 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== 4 FLAVORS RECBUF=3 ($(date -u +%H:%M:%S))" >> "$LOG"
gate f3 && env TRIDENT_RECBUF=3 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END f3 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r4_hw10 done $(date -u)" >> "$LOG"
