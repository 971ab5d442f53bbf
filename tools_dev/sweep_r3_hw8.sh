#!/bin/bash
# Round-3 hardware batch #8: validate the fixed-association plane-build
# fix (planes.py _plane_parts — einsum dot_general rounding was output-
# layout-dependent on TPU, giving the TR column records a ~1-ulp drift
# vs the row oracle and 2-3.7% >3LSB golden-flavor pixels):
#   1) flavor check at FULL defaults (TEXEL_MXU auto, TR=1, PREC=split)
#      — expect WORST_FRAC ~0.001 (the conservative-mode residual).
#   2) flavor check TEXEL_MXU=0 — direct A/B vs r3hw7's 0.0368.
#   3) Morton-sorted hardware parity suite (must pass now).
#   4) 4-config bench sweep — confirm the elementwise plane chains hold
#      21.5 FPS at 1M/1080p.
set -u
LOG="${1:-/root/repo/tools_dev/r3hw8.log}"
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

echo "##### sweep_r3_hw8 start $(date -u)" >> "$LOG"

echo "=== FLAVORS defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav_def && timeout 2400 python -u tools_dev/flavor_hw_check.py \
  >> "$LOG" 2>&1
echo "=== END flavors_defaults exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== FLAVORS texel_off ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav_tex0 && env TRIDENT_TEXEL_MXU=0 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END flavors_texel_off exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== TPU_PARITY sorted ($(date -u +%H:%M:%S))" >> "$LOG"
gate parity && env TRIDENT_TPU_TESTS=1 \
  timeout 3600 python -u -m pytest tests/test_raster_tpu.py -q \
  >> "$LOG" 2>&1
echo "=== END tpu_parity exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== BENCH_SWEEP defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_sweep && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  timeout 3600 python -u scripts/bench_sweep.py >> "$LOG" 2>&1
echo "=== END bench_sweep exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r3_hw8 done $(date -u)" >> "$LOG"
