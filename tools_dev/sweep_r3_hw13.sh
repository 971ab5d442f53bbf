#!/bin/bash
# Round-3 hardware batch #13: hierarchical-Z pair skip A/B.
#   1) 1M + ultra4k + 110k with TRIDENT_ZSKIP=1 (compare against the
#      defaults section of sweep 12's log — same tiled/split defaults).
#   2) golden flavors with ZSKIP=1 (bit-exact by construction; this is
#      the Mosaic-lowering check the CPU interpreter can't give us:
#      the scalar high-bit unpack + in-kernel tile max reduce).
#   3) a defaults re-measure of 1M to bracket tunnel drift.
set -u
LOG="${1:-/root/repo/tools_dev/r3hw13.log}"
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

echo "##### sweep_r3_hw13 start $(date -u)" >> "$LOG"

echo "=== BENCH ZSKIP=1 three configs ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_zskip && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  TRIDENT_ZSKIP=1 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m ultra4k \
  spheres1080 >> "$LOG" 2>&1
echo "=== END bench_zskip exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== BENCH defaults re-measure 1M ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_base && env BENCH_ITERS=30 BENCH_WATCHDOG=1200 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1
echo "=== END bench_base exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== FLAVORS ZSKIP=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate flav_zskip && env TRIDENT_ZSKIP=1 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END flavors_zskip exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "##### sweep_r3_hw13 done $(date -u)" >> "$LOG"
