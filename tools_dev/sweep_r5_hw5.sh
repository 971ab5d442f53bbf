#!/bin/bash
# Round-5 hardware batch #5: the MXU temporal warp (ops/warp_pallas.py)
# A/B at the ultra4k:ai shape, then the :ai modes end-to-end — the
# VERDICT item-4 measurement (target: ultra4k:ai >= native 9.26 FPS at
# >= 27 dB; stretch 15 FPS).
set -u
LOG="${1:-/root/repo/tools_dev/r5hw5.log}"
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

echo "##### sweep_r5_hw5 start $(date -u)" >> "$LOG"

# 1. warp A/B at 1080p->4K: gather vs MXU (one process each — the knob is
#    an import default; keep sections cheap with just the warp + v2 chain)
echo "=== AIBENCH warp gather ($(date -u +%H:%M:%S))" >> "$LOG"
gate aib_gather && env TRIDENT_WARP_MXU=0 AB_CONFIGS=warpv2,netv2,v2 \
  timeout 3600 python -u tools_dev/aibench.py >> "$LOG" 2>&1

echo "=== AIBENCH warp mxu ($(date -u +%H:%M:%S))" >> "$LOG"
gate aib_mxu && env TRIDENT_WARP_MXU=1 AB_CONFIGS=warpv2,netv2,v2 \
  timeout 3600 python -u tools_dev/aibench.py >> "$LOG" 2>&1

# 2. the :ai modes end-to-end at the new default (MXU warp ON)
echo "=== BENCH :ai modes (mxu warp) ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_ai && env BENCH_ITERS=30 BENCH_WATCHDOG=2400 \
  timeout 7200 python -u scripts/bench_sweep.py \
  spheres1080_1m:ai ultra4k:ai >> "$LOG" 2>&1

echo "##### sweep_r5_hw5 done $(date -u)" >> "$LOG"
