#!/bin/bash
# Round-3 hardware batch #12: tiled (channel-planar) deferred shading.
#   1) 4-config bench at the new defaults (tiled + split + planar).
#   2) 1M A/B with TRIDENT_TILED_SHADE=0.
#   3) golden flavors at the defaults (tiled reassociates the shading
#      fma chains — drift must stay in the <1% gate).
#   4) hardware parity suite.
#   5) stage profiler (FULL now uses the tiled path; the resolve/untile
#      ladder stops still measure the legacy layout).
set -u
LOG="${1:-/root/repo/tools_dev/r3hw12.log}"
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

echo "##### sweep_r3_hw12 start $(date -u)" >> "$LOG"

echo "=== BENCH_SWEEP tiled defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_tiled && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  timeout 3600 python -u scripts/bench_sweep.py >> "$LOG" 2>&1
echo "=== END bench_tiled exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== BENCH 1M tiled OFF ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_nt && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  TRIDENT_TILED_SHADE=0 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1
echo "=== END bench_tiled_off exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== FLAVORS tiled defaults ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav_tiled && timeout 2400 python -u tools_dev/flavor_hw_check.py \
  >> "$LOG" 2>&1
echo "=== END flavors_tiled exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== TPU_PARITY tiled ($(date -u +%H:%M:%S))" >> "$LOG"
gate parity && env TRIDENT_TPU_TESTS=1 \
  timeout 3600 python -u -m pytest tests/test_raster_tpu.py -q \
  >> "$LOG" 2>&1
echo "=== END tpu_parity exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== PROFILE large tiled ($(date -u +%H:%M:%S))" >> "$LOG"
gate profile && \
  timeout 2400 python -u scripts/profile_stages.py --scale large \
  >> "$LOG" 2>&1
echo "=== END profile exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r3_hw12 done $(date -u)" >> "$LOG"
