#!/bin/bash
# Round-3 hardware batch #11: validate the affine-depth REVERT + planar
# chain + split barrier fix.
#   1) diag_cover: covered-pixel count at the 1M profile scene, planar
#      on/off — must be back to ~743763 (r3hw10's affine run lost 27%).
#   2) diag_resolve: split select with the optimization_barrier fix —
#      expect split == fp32 exactly now (the bf16-propagation theory).
#   3) hardware parity suite (tie-tolerant bench-scale test).
#   4) bench_sweep at defaults (fp32, planar ON) — the honest number.
#   5) 1M A/Bs: planar OFF, and split select (if 2 shows exact).
#   6) stage profiler.
set -u
LOG="${1:-/root/repo/tools_dev/r3hw11.log}"
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

echo "##### sweep_r3_hw11 start $(date -u)" >> "$LOG"

echo "=== DIAG_COVER planar on/off ($(date -u +%H:%M:%S))" >> "$LOG"
gate diag_cover && timeout 3000 python -u tools_dev/diag_cover.py \
  >> "$LOG" 2>&1
echo "=== END diag_cover exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== DIAG_RESOLVE split barrier ($(date -u +%H:%M:%S))" >> "$LOG"
gate diag_resolve && timeout 2400 python -u tools_dev/diag_resolve.py \
  >> "$LOG" 2>&1
echo "=== END diag_resolve exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== TPU_PARITY reverted depth ($(date -u +%H:%M:%S))" >> "$LOG"
gate parity && env TRIDENT_TPU_TESTS=1 \
  timeout 3600 python -u -m pytest tests/test_raster_tpu.py -q \
  >> "$LOG" 2>&1
echo "=== END tpu_parity exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== BENCH_SWEEP defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_def && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  timeout 3600 python -u scripts/bench_sweep.py >> "$LOG" 2>&1
echo "=== END bench_defaults exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== BENCH 1M planar OFF ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_np && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 TRIDENT_PLANAR=0 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1
echo "=== END bench_planar_off exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== BENCH 1M split-barrier ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_split && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  TRIDENT_RESOLVE_PREC=split \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1
echo "=== END bench_split exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== PROFILE large ($(date -u +%H:%M:%S))" >> "$LOG"
gate profile && \
  timeout 2400 python -u scripts/profile_stages.py --scale large \
  >> "$LOG" 2>&1
echo "=== END profile exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r3_hw11 done $(date -u)" >> "$LOG"
