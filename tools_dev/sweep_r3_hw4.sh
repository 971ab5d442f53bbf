#!/bin/bash
# Round-3 hardware batch #4 (auto-queued behind batch #3 via its pid):
#   PARITY — re-run the once-per-round hardware parity suite with the
#       banded oracle fix (the whole-frame oracle's 1.6 GB scan step
#       crashed the TPU worker in batch #2) and texel-MXU defaults.
#   U4K_AB — ultra4k with the texel sampler off, to bracket batch #2's
#       8.23 (texel on) vs the 8.98 pre-outage defaults number.
set -u
LOG="${1:-/root/repo/tools_dev/r3hw4.log}"
WAIT_PID="${2:-}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

if [ -n "$WAIT_PID" ]; then
  echo "##### waiting for pid $WAIT_PID (batch #3)" >> "$LOG"
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

echo "##### sweep_r3_hw4 start $(date -u)" >> "$LOG"
echo "=== TPU_PARITY banded-oracle defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate parity && env TRIDENT_TPU_TESTS=1 \
  timeout 3600 python -u -m pytest tests/test_raster_tpu.py -q \
  >> "$LOG" 2>&1
echo "=== END tpu_parity exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== COMBO U4K_texel_off  ($(date -u +%H:%M:%S))" >> "$LOG"
gate u4k && env TRIDENT_TEXEL_MXU=0 BENCH_CONFIG=ultra4k BENCH_ITERS=20 \
  BENCH_WATCHDOG=1200 timeout 1320 python -u bench.py >> "$LOG" 2>&1
echo "=== END U4K_texel_off exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r3_hw4 done $(date -u)" >> "$LOG"
