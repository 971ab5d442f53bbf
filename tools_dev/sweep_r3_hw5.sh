#!/bin/bash
# Round-3 hardware batch #5: measure the transposed-record resolve
# (TRIDENT_RESOLVE_TR, default ON — 32 KB record blocks instead of
# 128 KB) and compaction v2 (cumsum+scatter owners-only grid), refresh
# the four-config sweep at the new defaults (texel-MXU auto-gated ≤4 Mpix),
# and re-run the hardware parity suite with the precision-pinned oracle.
set -u
LOG="${1:-/root/repo/tools_dev/r3hw5.log}"
WAIT_PID="${2:-}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

if [ -n "$WAIT_PID" ]; then
  echo "##### waiting for pid $WAIT_PID" >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

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

run_combo() {
  local label="$1"; shift
  echo "=== COMBO $label  ($(date -u +%H:%M:%S)) env: $*" >> "$LOG"
  gate "$label" || return 1
  env BENCH_CONFIG=spheres1080_1m BENCH_ITERS=30 BENCH_WATCHDOG=1200 "$@" \
    timeout 1320 python -u bench.py >> "$LOG" 2>&1
  echo "=== END $label exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
}

echo "##### sweep_r3_hw5 start $(date -u)" >> "$LOG"
run_combo T1_defaults_tr            # TR on + texel on (new defaults)
run_combo T0_tr_off     TRIDENT_RESOLVE_TR=0
run_combo C1_compact    TRIDENT_RESOLVE_COMPACT=1
run_combo TB_tr_bf16    TRIDENT_RESOLVE_PREC=bf16   # new speed ceiling?
run_combo TS_tr_split   TRIDENT_RESOLVE_PREC=split  # split w/ 16KB blocks

echo "=== BENCH_SWEEP new defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_sweep && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  timeout 3600 python -u scripts/bench_sweep.py >> "$LOG" 2>&1
echo "=== END bench_sweep exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== TPU_PARITY pinned-oracle defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate parity && env TRIDENT_TPU_TESTS=1 \
  timeout 3600 python -u -m pytest tests/test_raster_tpu.py -q \
  >> "$LOG" 2>&1
echo "=== END tpu_parity exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r3_hw5 done $(date -u)" >> "$LOG"
