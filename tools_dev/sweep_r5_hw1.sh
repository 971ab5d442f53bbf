#!/bin/bash
# Round-5 hardware batch #1: the shared-accumulator masked kernel (ACC,
# the CKERN-v2 transplant — VERDICT r4 item 1) A/B, plus the binning-chain
# decomposition (item 2 groundwork) and the flavor gate at the new default.
set -u
LOG="${1:-/root/repo/tools_dev/r5hw1.log}"
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

echo "##### sweep_r5_hw1 start $(date -u)" >> "$LOG"

# 1. end-to-end flagship at the NEW defaults (ACC=1); measured twice in one
#    process (first-compile timing is noise — re-measure first config last)
echo "=== BENCH 1M ACC=1 defaults x2 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_acc1 && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m spheres1080_1m \
  >> "$LOG" 2>&1

# 2. control: the r4 per-sweep merge (ACC=0) in a fresh process
echo "=== BENCH 1M ACC=0 control ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_acc0 && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_ACC=0 \
  timeout 2400 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1

# 3. kernel decomposition at ACC=1 + the binning-chain decomposition
echo "=== KBENCH ACC=1 + BINS decomposition ($(date -u +%H:%M:%S))" >> "$LOG"
gate kbench_acc1 && env KB_BINS=1 KB_CONFIGS=zero,dflt,full,nobranch,dflt \
  timeout 3600 python -u tools_dev/kbench.py >> "$LOG" 2>&1

# 4. kernel decomposition control at ACC=0
echo "=== KBENCH ACC=0 control ($(date -u +%H:%M:%S))" >> "$LOG"
gate kbench_acc0 && env TRIDENT_ACC=0 KB_CONFIGS=zero,dflt,dflt \
  timeout 2400 python -u tools_dev/kbench.py >> "$LOG" 2>&1

# 5. golden-flavor hardware gate at the new default (incl. new flip caps)
echo "=== FLAVOR GATE ACC=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate flavors && timeout 3600 python -u tools_dev/flavor_hw_check.py \
  >> "$LOG" 2>&1

echo "##### sweep_r5_hw1 done $(date -u)" >> "$LOG"
