#!/bin/bash
# Round-5 hardware batch #2: exact-fit binning A/B (VERDICT item 2),
# shade-side decomposition (item 3), AI-mode decomposition (item 4).
# Launch AFTER sweep_r5_hw1 completes (one TPU process at a time).
set -u
LOG="${1:-/root/repo/tools_dev/r5hw2.log}"
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

echo "##### sweep_r5_hw2 start $(date -u)" >> "$LOG"

# 0. re-run the hw1 kbench sections (failed on an f-string syntax error):
#    kernel decomposition at ACC=1 + the binning-chain decomposition, then
#    the ACC=0 control
echo "=== KBENCH ACC=1 + BINS decomposition ($(date -u +%H:%M:%S))" >> "$LOG"
gate kbench_acc1 && env KB_BINS=1 KB_CONFIGS=zero,dflt,full,nobranch,dflt \
  timeout 3600 python -u tools_dev/kbench.py >> "$LOG" 2>&1
echo "=== KBENCH ACC=0 control ($(date -u +%H:%M:%S))" >> "$LOG"
gate kbench_acc0 && env TRIDENT_ACC=0 KB_CONFIGS=zero,dflt,dflt \
  timeout 2400 python -u tools_dev/kbench.py >> "$LOG" 2>&1

# 1. exact-fit binning A/B across the three capacity-diverse configs in ONE
#    process (bench aborts loudly if aux != 0 — the 4K capacity guard)
echo "=== BENCH EXACT_BINS=1: 1M + 110k + 4K ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_exact && env BENCH_ITERS=30 BENCH_WATCHDOG=2400 TRIDENT_EXACT_BINS=1 \
  timeout 5400 python -u scripts/bench_sweep.py spheres1080_1m spheres1080 ultra4k \
  >> "$LOG" 2>&1

# 1b. shadows1080 at the new defaults (depth-only light pass; zskip policy
#     auto-applies) — r4 best was 19.44 with zskip, 17.82 without
echo "=== BENCH shadows1080 depth-only light pass ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_shadows && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 3600 python -u scripts/bench_sweep.py shadows1080 shadows1080 \
  >> "$LOG" 2>&1

# 2. binning-chain decomposition at EXACT_BINS=1 (compare hw1 §3 baseline)
echo "=== KBENCH BINS EXACT_BINS=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate kbench_exact && env TRIDENT_EXACT_BINS=1 KB_BINS=1 KB_CONFIGS=dflt \
  timeout 2400 python -u tools_dev/kbench.py >> "$LOG" 2>&1

# 3. shade-side decomposition at the 1M flagship (first ever)
echo "=== SBENCH flagship ($(date -u +%H:%M:%S))" >> "$LOG"
gate sbench && timeout 3600 python -u tools_dev/sbench.py >> "$LOG" 2>&1

# 4. AI-mode decomposition at the ultra4k:ai shapes (first ever)
echo "=== AIBENCH ultra4k shapes ($(date -u +%H:%M:%S))" >> "$LOG"
gate aibench && timeout 2400 python -u tools_dev/aibench.py >> "$LOG" 2>&1

echo "##### sweep_r5_hw2 done $(date -u)" >> "$LOG"

# 5. shadow-pass decomposition at the shadows1080 scene (first ever)
echo "=== SHBENCH shadows1080 ($(date -u +%H:%M:%S))" >> "$LOG"
gate shbench && timeout 3600 python -u tools_dev/shbench.py >> "$LOG" 2>&1

echo "##### sweep_r5_hw2 really done $(date -u)" >> "$LOG"
