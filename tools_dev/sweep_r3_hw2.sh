#!/bin/bash
# Round-3 hardware batch #2: composition A/Bs for the two sweep-#1 winners
# (TEXEL_MXU=1 at 19.29, RESOLVE_PREC=bf16 at 19.73 vs 18.45/18.51
# defaults), then the full 4-config bench sweep and the once-per-round
# hardware parity suite, both with TEXEL_MXU=1 (the new-default candidate:
# exact by construction, unlike bf16 winner-select which quantizes
# records to 8 mantissa bits and stays an opt-in escape).
#
# Usage: bash tools_dev/sweep_r3_hw2.sh [logfile]
set -u
LOG="${1:-/root/repo/tools_dev/r3hw2.log}"
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
  local label="$1"
  local tries=0
  until probe; do
    tries=$((tries+1))
    echo "--- tunnel down before $label (probe fail #$tries), sleeping 300s" >> "$LOG"
    if [ "$tries" -ge 24 ]; then echo "--- giving up waiting for tunnel" >> "$LOG"; return 1; fi
    sleep 300
  done
}

run_combo() {
  local label="$1"; shift
  echo "=== COMBO $label  ($(date -u +%H:%M:%S)) env: $*" >> "$LOG"
  gate "$label" || return 1
  env BENCH_CONFIG=spheres1080_1m BENCH_ITERS=30 BENCH_WATCHDOG=1200 "$@" \
    timeout 1320 python -u bench.py >> "$LOG" 2>&1
  echo "=== END $label exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
}

echo "##### sweep_r3_hw2 start $(date -u)" >> "$LOG"
# composition A/Bs (flagship config, 30 iters like sweep #1)
run_combo P_texel_bf16   TRIDENT_TEXEL_MXU=1 TRIDENT_RESOLVE_PREC=bf16
run_combo Q_texel_split  TRIDENT_TEXEL_MXU=1 TRIDENT_RESOLVE_PREC=split
run_combo R_texel_c512s32 TRIDENT_TEXEL_MXU=1 TRIDENT_CHUNK=512 TRIDENT_SUB=32

# full bench sweep, new-default candidate, one process
echo "=== BENCH_SWEEP texel_mxu=1  ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_sweep && \
  env TRIDENT_TEXEL_MXU=1 BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
    timeout 3600 python -u scripts/bench_sweep.py >> "$LOG" 2>&1
echo "=== END bench_sweep exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

# once-per-round hardware parity suite (oracle parity, golden flavors,
# zero-overflow sweep) against the new-default candidate
echo "=== TPU_PARITY texel_mxu=1  ($(date -u +%H:%M:%S))" >> "$LOG"
gate tpu_parity && \
  env TRIDENT_TEXEL_MXU=1 TRIDENT_TPU_TESTS=1 \
    timeout 3600 python -u -m pytest tests/test_raster_tpu.py -x -q \
    >> "$LOG" 2>&1
echo "=== END tpu_parity exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r3_hw2 done $(date -u)" >> "$LOG"
