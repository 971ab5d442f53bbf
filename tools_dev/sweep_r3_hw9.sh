#!/bin/bash
# Round-3 hardware batch #9: pin the golden-flavor drift to ONE knob.
# r3hw7 flipped TR and PREC together (dirty: TR=1/split; clean:
# TR=0/fp32). Here:
#   1) diag_resolve: all (layout x precision) resolve variants on
#      identical inputs in one process + on-chip split-reconstruction
#      and builder-twin probes (unit/tiny/huge record scales).
#   2) flavors TR=1 PREC=fp32  — TR alone.
#   3) flavors TR=0 PREC=split — split alone.
set -u
LOG="${1:-/root/repo/tools_dev/r3hw9.log}"
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

echo "##### sweep_r3_hw9 start $(date -u)" >> "$LOG"

echo "=== DIAG_RESOLVE ($(date -u +%H:%M:%S))" >> "$LOG"
gate diag_resolve && timeout 2400 python -u tools_dev/diag_resolve.py \
  >> "$LOG" 2>&1
echo "=== END diag_resolve exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== FLAVORS tr_only (TR=1 PREC=fp32) ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav_tr && env TRIDENT_RESOLVE_PREC=fp32 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END flavors_tr_only exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== FLAVORS split_only (TR=0 PREC=split) ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav_split && env TRIDENT_RESOLVE_TR=0 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END flavors_split_only exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r3_hw9 done $(date -u)" >> "$LOG"
