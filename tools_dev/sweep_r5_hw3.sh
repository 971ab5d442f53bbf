#!/bin/bash
# Round-5 hardware batch #3: DYNHIT A/B (the dynamic hit-sub sweep),
# sbench re-run (hw2's crashed on a tunnel error after texel(mxu)),
# upscaler-V2 sections + end-to-end :ai benches.
set -u
LOG="${1:-/root/repo/tools_dev/r5hw3.log}"
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

echo "##### sweep_r5_hw3 start $(date -u)" >> "$LOG"

# 1. DYNHIT end-to-end A/B at the flagship (x2) + the 110k scene
echo "=== BENCH DYNHIT=1: 1M x2 + 110k ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_dynhit && env BENCH_ITERS=30 BENCH_WATCHDOG=2400 TRIDENT_DYNHIT=1 \
  timeout 5400 python -u scripts/bench_sweep.py spheres1080_1m spheres1080_1m spheres1080 \
  >> "$LOG" 2>&1

# 2. DYNHIT kernel decomposition (compare hw2 ACC=1: zero 7.47 dflt 19.06)
echo "=== KBENCH DYNHIT=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate kbench_dynhit && env TRIDENT_DYNHIT=1 KB_CONFIGS=zero,dflt,full,dflt \
  timeout 2400 python -u tools_dev/kbench.py >> "$LOG" 2>&1

# 3. flavor gate with DYNHIT (exactness on chip across all flavors)
echo "=== FLAVOR GATE DYNHIT=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate flavor_dynhit && env TRIDENT_DYNHIT=1 \
  timeout 3600 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1

# 4. sbench full re-run at defaults (hw2 died after texel(mxu) 4.42)
echo "=== SBENCH flagship re-run ($(date -u +%H:%M:%S))" >> "$LOG"
gate sbench && timeout 3600 python -u tools_dev/sbench.py >> "$LOG" 2>&1

# 5. aibench V2 sections (d2s modes / warp-from-blocks / bf16 net / chain)
echo "=== AIBENCH V2 sections ($(date -u +%H:%M:%S))" >> "$LOG"
gate aibench_v2 && env AB_CONFIGS=d2s,warpv2,netv2,v2 \
  timeout 2400 python -u tools_dev/aibench.py >> "$LOG" 2>&1

# 6. end-to-end :ai benches with the V2 defaults (vs r4: 1M:ai 19.81,
#    ultra4k:ai 5.34 at 31.07 dB)
echo "=== BENCH :ai with V2 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_ai_v2 && env BENCH_ITERS=30 BENCH_WATCHDOG=2400 \
  timeout 5400 python -u scripts/bench_sweep.py spheres1080_1m:ai ultra4k:ai \
  >> "$LOG" 2>&1

# 7. shadows1080 with DYNHIT on both passes
echo "=== BENCH shadows1080 DYNHIT=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_shadow_dynhit && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 TRIDENT_DYNHIT=1 \
  timeout 3600 python -u scripts/bench_sweep.py shadows1080 >> "$LOG" 2>&1

echo "##### sweep_r5_hw3 done $(date -u)" >> "$LOG"
