#!/bin/bash
# Round-4 hardware batch #3: CKERN v2 (16-row slices + shared
# lexicographic accumulator; tids ride records col 15; no post-gather
# rewrite) + cover min-tree in both kernels.
#   1) kbench CKERN v2: bins timing (compact-build cost) + kernel
#      decomposition (zero ≈ bank0-only, dflt, full ≈ both banks)
#   2) kbench masked kernel with the min-tree + col-15 tid trims
#   3) bench 1M CKERN=1 v2
#   4) bench 1M defaults (min-tree effect on the shipped kernel)
#   5) flavors with the trims (exactness: min-tree NaN/-0.0 + col-15 ids)
#   6) if CKERN v2 looks good: full config sweep CKERN=1
set -u
LOG="${1:-/root/repo/tools_dev/r4hw3.log}"
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

echo "##### sweep_r4_hw3 start $(date -u) commit $(git rev-parse --short HEAD)" >> "$LOG"

echo "=== 1 KBENCH CKERN v2 ($(date -u +%H:%M:%S))" >> "$LOG"
gate kb_ck && env KB_ITERS=30 KB_BINS=1 TRIDENT_CKERN=1 KB_CONFIGS=zero,dflt,full \
  timeout 2400 python -u tools_dev/kbench.py >> "$LOG" 2>&1
echo "=== END kb_ck exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 2 KBENCH masked + trims ($(date -u +%H:%M:%S))" >> "$LOG"
gate kb_m && env KB_ITERS=30 KB_BINS=1 KB_CONFIGS=zero,dflt,full \
  timeout 2400 python -u tools_dev/kbench.py >> "$LOG" 2>&1
echo "=== END kb_m exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 3 BENCH 1M CKERN v2 ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_ck2 && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_CKERN=1 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END b_ck2 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 4 BENCH 1M defaults + trims ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_base && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END b_base exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 5 FLAVORS trims (defaults) ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav_t && timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END flav_t exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 6 FLAVORS CKERN v2 ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav_ck2 && env TRIDENT_CKERN=1 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END flav_ck2 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 7 LADDER at 4K (fused ablation, VERDICT r3 item 5) ($(date -u +%H:%M:%S))" >> "$LOG"
gate ladder4k && timeout 3600 python -u scripts/profile_stages.py --scale 4k >> "$LOG" 2>&1
echo "=== END ladder4k exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 8 BENCH 110k + shadows CKERN v2 (scaled budget) ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_ck_small && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_CKERN=1 \
  timeout 2400 python -u scripts/bench_sweep.py spheres1080 shadows1080 >> "$LOG" 2>&1
echo "=== END b_ck_small exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 9 BENCH 1M CKERN CK_BANK=4 (4 banks) ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_ck4 && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_CKERN=1 \
  TRIDENT_CK_BANK=4 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END b_ck4 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "##### sweep_r4_hw3 done $(date -u)" >> "$LOG"
