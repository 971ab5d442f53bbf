#!/bin/bash
# Round-4 hardware batch #1: the quarter-gated visibility kernel.
#   0) fast compile probe (cube512, 3 iters) — does the 64-branch QGATE
#      kernel + static lane slices + f32 zparams SMEM arg lower at all?
#   1) golden flavors at the new defaults (QGATE=1 ZORDER=1): Mosaic-level
#      bit-exactness the CPU interpreter cannot prove
#   2) bench 1M at defaults (quarter gating ON)
#   3) bench 1M QGATE=0 (lex merge + zorder, whole-tile sweeps)
#   4) bench 1M QGATE=0 ZORDER=0 (≈ round-3 kernel baseline)
#   5) bench 1M ZSKIP=1 (normalized hierarchical-Z v2; flagship has little
#      overdraw so expect ~neutral — the exactness run is section 6)
#   6) golden flavors ZSKIP=1 (dequant + per-quarter max on chip)
#   7) full five-config sweep at defaults (incl. the new shadows1080)
set -u
LOG="${1:-/root/repo/tools_dev/r4hw1.log}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

probe() {
  timeout 1500 python -u -c "
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

echo "##### sweep_r4_hw1 start $(date -u) commit $(git rev-parse --short HEAD)" >> "$LOG"

echo "=== 0 COMPILE PROBE cube512 ($(date -u +%H:%M:%S))" >> "$LOG"
gate compile_probe && env BENCH_ITERS=3 BENCH_WATCHDOG=1500 BENCH_CONFIG=cube512 \
  timeout 1800 python -u bench.py >> "$LOG" 2>&1
echo "=== END compile_probe exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 1 FLAVORS defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate flavors && timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END flavors exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 2 BENCH 1M defaults QGATE=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_qgate1 && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END bench_qgate1 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 3 BENCH 1M QGATE=0 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_qgate0 && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 TRIDENT_QGATE=0 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END bench_qgate0 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 4 BENCH 1M QGATE=0 ZORDER=0 (r3 baseline) ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_r3base && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  TRIDENT_QGATE=0 TRIDENT_ZORDER=0 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END bench_r3base exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 5 BENCH 1M ZSKIP=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_zskip && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 TRIDENT_ZSKIP=1 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END bench_zskip exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 6 FLAVORS ZSKIP=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav_zskip && env TRIDENT_ZSKIP=1 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END flavors_zskip exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 7 FULL five-config sweep at defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_full && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 5400 python -u scripts/bench_sweep.py cube512 spheres1080 \
  spheres1080_1m ultra4k shadows1080 >> "$LOG" 2>&1
echo "=== END bench_full exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "##### sweep_r4_hw1 done $(date -u)" >> "$LOG"
