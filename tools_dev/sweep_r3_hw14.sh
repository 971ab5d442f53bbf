#!/bin/bash
# Round-3 hardware batch #14: the tiled-shading A/B sweep 12 lost to a
# process collision (its 1M TILED_SHADE=0 watchdog fired while a stray
# diagnostic held the tunnel).
set -u
LOG="${1:-/root/repo/tools_dev/r3hw14.log}"
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

echo "##### sweep_r3_hw14 start $(date -u)" >> "$LOG"

echo "=== BENCH 1M+4K tiled OFF ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_nt && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  TRIDENT_TILED_SHADE=0 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m ultra4k \
  >> "$LOG" 2>&1
echo "=== END bench_tiled_off exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "##### sweep_r3_hw14 done $(date -u)" >> "$LOG"
