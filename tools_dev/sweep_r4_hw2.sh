#!/bin/bash
# Round-4 hardware batch #2: the compact-bank kernel (CKERN) + zskip fate.
#   1) flavors CKERN=1 — Mosaic exactness (col-15 tid cast, dense banks)
#   2) bench 1M CKERN=1 (the kbench-projected ~13-14 ms visibility)
#   3) bench 1M CKERN=1 SUB=32 CK_BANK=4 (coarser subs: fewer pad dups?)
#   4) bench 110k + ultra4k CKERN=1 (different pair/hit structures)
#   5) bench defaults re-measure (tunnel drift bracket)
#   6) shadows1080 with ZSKIP=1 (the backdrop IS overdraw — zskip's fate)
#   7) ultra4k BENCH_AI=1 (neural 2x as the blessed 4K mode, VERDICT #5)
set -u
LOG="${1:-/root/repo/tools_dev/r4hw2.log}"
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

echo "##### sweep_r4_hw2 start $(date -u) commit $(git rev-parse --short HEAD)" >> "$LOG"

echo "=== 1 FLAVORS CKERN=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav_ck && env TRIDENT_CKERN=1 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END flav_ck exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 2 BENCH 1M CKERN=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_ck && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_CKERN=1 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END b_ck exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 3 BENCH 1M CKERN=1 SUB=32 CK_BANK=4 ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_ck32 && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_CKERN=1 \
  TRIDENT_SUB=32 TRIDENT_CK_BANK=4 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END b_ck32 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 4 BENCH 110k + 4K CKERN=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_ck_wide && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 TRIDENT_CKERN=1 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080 ultra4k >> "$LOG" 2>&1
echo "=== END b_ck_wide exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 5 BENCH 1M defaults re-measure ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_base && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END b_base exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 6 BENCH shadows1080 ZSKIP=1 vs 0 ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_shzs && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_ZSKIP=1 \
  timeout 1800 python -u scripts/bench_sweep.py shadows1080 >> "$LOG" 2>&1
echo "=== END b_shzs exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 7 BENCH ultra4k AI mode ($(date -u +%H:%M:%S))" >> "$LOG"
gate b_4kai && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 BENCH_AI=1 \
  timeout 2400 python -u scripts/bench_sweep.py ultra4k >> "$LOG" 2>&1
echo "=== END b_4kai exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "##### sweep_r4_hw2 done $(date -u)" >> "$LOG"
