#!/bin/bash
# Round-3 hardware batch #10:
#   1) diag_split_kernel: micro-probe the Mosaic split-select loss
#      (r3hw9: resolve split degenerates to hi-plane-only in BOTH record
#      layouts; exact in interpret + XLA-side) at 3 fidelity levels.
#   2) hardware parity suite at the NEW defaults (PREC=fp32 + affine
#      screen-space depth + clustered bench-scale scene).
#   3) 4-config bench sweep — the affine-depth headline number.
#   4) stage profiler — new vis/resolve stage split.
set -u
LOG="${1:-/root/repo/tools_dev/r3hw10.log}"
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

echo "##### sweep_r3_hw10 start $(date -u)" >> "$LOG"

echo "=== DIAG_SPLIT_KERNEL ($(date -u +%H:%M:%S))" >> "$LOG"
gate split_kernel && timeout 2400 python -u tools_dev/diag_split_kernel.py \
  >> "$LOG" 2>&1
echo "=== END diag_split_kernel exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== TPU_PARITY affine+fp32 ($(date -u +%H:%M:%S))" >> "$LOG"
gate parity && env TRIDENT_TPU_TESTS=1 \
  timeout 3600 python -u -m pytest tests/test_raster_tpu.py -q \
  >> "$LOG" 2>&1
echo "=== END tpu_parity exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== BENCH_SWEEP affine+fp32 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_sweep && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  timeout 3600 python -u scripts/bench_sweep.py >> "$LOG" 2>&1
echo "=== END bench_sweep exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== PROFILE large affine+fp32 ($(date -u +%H:%M:%S))" >> "$LOG"
gate profile && \
  timeout 2400 python -u scripts/profile_stages.py --scale large \
  >> "$LOG" 2>&1
echo "=== END profile exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r3_hw10 done $(date -u)" >> "$LOG"
