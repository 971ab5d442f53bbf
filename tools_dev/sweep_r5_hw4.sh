#!/bin/bash
# Round-5 hardware batch #4: MXU shadow-factor A/B (shbench + shadows1080
# end-to-end at the new defaults), then the round's final defaults
# brackets (VERDICT item 9 regression guard).
set -u
LOG="${1:-/root/repo/tools_dev/r5hw4.log}"
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

echo "##### sweep_r5_hw4 start $(date -u)" >> "$LOG"

# 1. shbench with the MXU factor A/B (coherent + random worlds; fixed
#    main0/main1 probes that consume color)
echo "=== SHBENCH mxu A/B ($(date -u +%H:%M:%S))" >> "$LOG"
gate shbench_mxu && timeout 3600 python -u tools_dev/shbench.py >> "$LOG" 2>&1

# 2. shadows1080 end-to-end at the new defaults (DYNHIT + SHADOW_MXU),
#    x2 (r4 best 19.44; r5hw2 depth-only pass 19.64; r5hw3 +DYNHIT TBD)
echo "=== BENCH shadows1080 new defaults x2 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_shadows && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 3600 python -u scripts/bench_sweep.py shadows1080 shadows1080 \
  >> "$LOG" 2>&1

# 3. final defaults bracket: every config at the shipping tree
echo "=== FINAL DEFAULTS BRACKET ($(date -u +%H:%M:%S))" >> "$LOG"
gate bracket && env BENCH_ITERS=30 BENCH_WATCHDOG=2400 \
  timeout 7200 python -u scripts/bench_sweep.py \
  spheres1080_1m cube512 spheres1080 ultra4k shadows1080 spheres1080_1m \
  >> "$LOG" 2>&1

echo "##### sweep_r5_hw4 done $(date -u)" >> "$LOG"
