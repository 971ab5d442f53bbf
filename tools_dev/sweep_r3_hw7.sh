#!/bin/bash
# Round-3 hardware batch #7: diagnose the two parity failures.
#   1) diag_parity small+bench: which side (oracle/pallas) quantizes
#      depths on-chip (bf16-roundtrip fingerprint), cover-disagree vs
#      winner-flip split, mismatched-pixel samples.
#   2) flavor drift bisection: TEXEL_MXU=0, then all-conservative
#      (TEXEL_MXU=0 TR=0 PREC=fp32).
#   3) stage profiler at the split defaults (fixed TR token read).
set -u
LOG="${1:-/root/repo/tools_dev/r3hw7.log}"
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

echo "##### sweep_r3_hw7 start $(date -u)" >> "$LOG"

echo "=== DIAG_PARITY small ($(date -u +%H:%M:%S))" >> "$LOG"
gate diag_small && timeout 2400 python -u tools_dev/diag_parity.py \
  --scale small >> "$LOG" 2>&1
echo "=== END diag_small exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== DIAG_PARITY bench ($(date -u +%H:%M:%S))" >> "$LOG"
gate diag_bench && timeout 3600 python -u tools_dev/diag_parity.py \
  --scale bench >> "$LOG" 2>&1
echo "=== END diag_bench exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== FLAVORS texel_off ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav1 && env TRIDENT_TEXEL_MXU=0 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END flavors_texel_off exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== FLAVORS conservative ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav2 && env TRIDENT_TEXEL_MXU=0 TRIDENT_RESOLVE_TR=0 \
  TRIDENT_RESOLVE_PREC=fp32 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END flavors_conservative exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== PROFILE large split defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate profile && \
  timeout 2400 python -u scripts/profile_stages.py --scale large \
  >> "$LOG" 2>&1
echo "=== END profile exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r3_hw7 done $(date -u)" >> "$LOG"
