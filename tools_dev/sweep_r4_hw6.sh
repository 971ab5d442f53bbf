#!/bin/bash
# Round-4 hardware batch #6: the 4K pixel-side plays from the r4hw3 §7
# ladder (the 4K frame is 61% shade/resolve/untile):
#   1) ultra4k with TRIDENT_TILED_SHADE=1 — the untile is 12.9 ms at 4K
#      (vs 4.1 at 1080p where tiled-shade measured a loss)
#   2) ultra4k defaults re-measure (bracket)
set -u
LOG="${1:-/root/repo/tools_dev/r4hw6.log}"
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
echo "##### sweep_r4_hw6 start $(date -u) commit $(git rev-parse --short HEAD)" >> "$LOG"
echo "=== 1 BENCH ultra4k TILED_SHADE=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate b4kts && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 TRIDENT_TILED_SHADE=1 \
  timeout 2400 python -u scripts/bench_sweep.py ultra4k >> "$LOG" 2>&1
echo "=== END b4kts exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== 2 BENCH ultra4k defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate b4kd && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 2400 python -u scripts/bench_sweep.py ultra4k >> "$LOG" 2>&1
echo "=== END b4kd exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== 3 BENCH ultra4k TEXEL_MXU=0 (r3 open question) ($(date -u +%H:%M:%S))" >> "$LOG"
gate b4ktex && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 TRIDENT_TEXEL_MXU=0 \
  timeout 2400 python -u scripts/bench_sweep.py ultra4k >> "$LOG" 2>&1
echo "=== END b4ktex exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 4 BENCH AI modes retry (smaller scan graph, big watchdog) ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_ai2 && env BENCH_ITERS=10 BENCH_WATCHDOG=3300 \
  timeout 7200 python -u scripts/bench_sweep.py ultra4k:ai \
  spheres1080_1m:ai >> "$LOG" 2>&1
echo "=== END b_ai2 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 5 BENCH interp (config 4) ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_interp2 && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 BENCH_CONFIG=interp \
  timeout 1800 python -u bench.py >> "$LOG" 2>&1
echo "=== END b_interp2 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "##### sweep_r4_hw6 done $(date -u)" >> "$LOG"
