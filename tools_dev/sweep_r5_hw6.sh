#!/bin/bash
# Round-5 hardware batch #6: route-to-60 probes.
#   1. kbench dual-stream probe (fused-pass floor question, leg 1)
#   2. CHUNK=512/SUB=32 kernel decomposition + end-to-end flagship
#      (leg 2: halves the pair count at equal record bytes; CPU-golden
#      verified oracle-exact before queueing)
set -u
LOG="${1:-/root/repo/tools_dev/r5hw6.log}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

probe() {
  timeout 420 python -u -c "
import jax, jax.numpy as jnp
print('probe devices:', jax.devices(), flush=True)
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

echo "##### sweep_r5_hw6 start $(date -u)" >> "$LOG"

echo "=== KBENCH dual-stream probe ($(date -u +%H:%M:%S))" >> "$LOG"
gate kb_dual && env KB_CONFIGS=zero,dflt,dual,dflt,dual \
  timeout 3600 python -u tools_dev/kbench.py >> "$LOG" 2>&1

echo "=== SBENCH fused stage probe ($(date -u +%H:%M:%S))" >> "$LOG"
gate sb_fused && env SB_CONFIGS=fused,resolve,resolve_tiled \
  timeout 3600 python -u tools_dev/sbench.py >> "$LOG" 2>&1

echo "=== BENCH 1m FUSE=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_fuse && env TRIDENT_FUSE=1 \
  BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1

echo "=== KBENCH chunk512/sub32 ($(date -u +%H:%M:%S))" >> "$LOG"
gate kb_512 && env TRIDENT_CHUNK=512 TRIDENT_SUB=32 \
  KB_CONFIGS=zero,dflt,full,dflt \
  timeout 3600 python -u tools_dev/kbench.py >> "$LOG" 2>&1

echo "=== BENCH 1m FUSE=1 TILED_SHADE=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_fuse_ts && env TRIDENT_FUSE=1 TRIDENT_TILED_SHADE=1 \
  BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1

echo "=== KBENCH sort ladder ($(date -u +%H:%M:%S))" >> "$LOG"
gate kb_sort && env KB_SORT=1 KB_CONFIGS=none \
  timeout 3600 python -u tools_dev/kbench.py >> "$LOG" 2>&1

echo "=== KBENCH treset off ($(date -u +%H:%M:%S))" >> "$LOG"
gate kb_treset && env TRIDENT_TRESET=0 KB_CONFIGS=zero,dflt,dflt \
  timeout 3600 python -u tools_dev/kbench.py >> "$LOG" 2>&1

echo "=== BENCH 1m chunk512/sub32 vs defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_512 && env TRIDENT_CHUNK=512 TRIDENT_SUB=32 \
  BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1
gate bench_ctrl && env BENCH_ITERS=30 BENCH_WATCHDOG=2400 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m shadows1080 \
  >> "$LOG" 2>&1

echo "##### sweep_r5_hw6 done $(date -u)" >> "$LOG"
