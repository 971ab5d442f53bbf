#!/bin/bash
# Round-3 hardware batch #3 (auto-queued behind batch #2 via its pid):
#   S  — clean measurement of the REDESIGNED exact split resolve
#        (stacked (NC,3,C,RW) bf16 planes + bf16 one-hot at the compare;
#        batch #2's Q ran while the redesign was landing, so its 18.77
#        is ambiguous) composed with TEXEL_MXU=1.
#   PROFILE — fused-ablation stage ladder at 1M/1080p with the
#        new-default texel-MXU sampler, to aim the next optimization.
set -u
LOG="${1:-/root/repo/tools_dev/r3hw3.log}"
WAIT_PID="${2:-}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

if [ -n "$WAIT_PID" ]; then
  echo "##### waiting for pid $WAIT_PID (batch #2)" >> "$LOG"
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

echo "##### sweep_r3_hw3 start $(date -u)" >> "$LOG"
echo "=== COMBO S_texel_splitnew  ($(date -u +%H:%M:%S))" >> "$LOG"
gate S && env TRIDENT_TEXEL_MXU=1 TRIDENT_RESOLVE_PREC=split \
  BENCH_CONFIG=spheres1080_1m BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  timeout 1320 python -u bench.py >> "$LOG" 2>&1
echo "=== END S_texel_splitnew exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== PROFILE large texel_mxu=1 split ($(date -u +%H:%M:%S))" >> "$LOG"
gate profile && env TRIDENT_TEXEL_MXU=1 TRIDENT_RESOLVE_PREC=split \
  timeout 2400 python -u scripts/profile_stages.py --scale large \
  >> "$LOG" 2>&1
echo "=== END profile exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r3_hw3 done $(date -u)" >> "$LOG"
