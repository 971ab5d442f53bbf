#!/bin/bash
# Round-5 hardware batch #7: :ai modes with the V2 block-history chain
# (the r5hw5 run chained out.color -> V1 warp; bench now chains
# FrameOutput.history -> MXU warp). Target: ultra4k:ai >= 15 FPS at
# >= 27 dB and >= ultra4k native (VERDICT item 4).
set -u
LOG="${1:-/root/repo/tools_dev/r5hw7.log}"
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

echo "##### sweep_r5_hw7 start $(date -u)" >> "$LOG"

echo "=== BENCH :ai modes (V2 history chain) ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_ai_v2 && env BENCH_ITERS=30 BENCH_WATCHDOG=2400 \
  timeout 7200 python -u scripts/bench_sweep.py \
  spheres1080_1m:ai ultra4k:ai >> "$LOG" 2>&1

# FUSE composition probes: near-to-far pair order makes the fused
# kernel's any(better) interpolation gate approximate the standalone
# resolve's final-winner skip (without ZORDER, later pairs are often
# locally ahead and pay the one-hot+interp the split pass skips —
# r5hw6 sbench: fused marginal 7.9 vs standalone tiled 8.78)
echo "=== BENCH 1m FUSE+ZORDER ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_fuse_z && env TRIDENT_FUSE=1 TRIDENT_ZORDER=1 \
  BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1

echo "=== BENCH 1m FUSE+ZORDER+ZSKIP ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_fuse_zz && env TRIDENT_FUSE=1 TRIDENT_ZORDER=1 TRIDENT_ZSKIP=1 \
  BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1

# final defaults bracket at the shipping tree (VERDICT item 9 guard for
# BENCH_r05): every config, defaults only
echo "=== FINAL DEFAULTS BRACKET ($(date -u +%H:%M:%S))" >> "$LOG"
gate final_bracket && env BENCH_ITERS=30 BENCH_WATCHDOG=2400 \
  timeout 10800 python -u scripts/bench_sweep.py \
  spheres1080_1m cube512 spheres1080 ultra4k shadows1080 spheres1080_1m \
  >> "$LOG" 2>&1

echo "##### sweep_r5_hw7 done $(date -u)" >> "$LOG"
