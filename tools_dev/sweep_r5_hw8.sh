#!/bin/bash
# Round-5 hardware batch #8: re-measure the end-to-end A/Bs whose hw6
# numbers were lost with the uncommitted r5hw6.log (see PERF.md log
# index): TRESET=0, CHUNK=512/SUB=32, plain FUSE. All three are pure
# knob flips over parity-tested code (test_treset_off_is_bit_exact;
# the chunk512/sub32 and FUSE combos were CPU-golden verified before
# hw6 queued). Defaults anchor first so every A/B has a same-process
# tunnel-state control.
set -u
LOG="${1:-/root/repo/tools_dev/r5hw8.log}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

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
    if [ "$tries" -ge 12 ]; then echo "--- giving up" >> "$LOG"; return 1; fi
    sleep 300
  done
}

echo "##### sweep_r5_hw8 start $(date -u)" >> "$LOG"

# anchor: the hw7 final-bracket flagship run minutes earlier in the
# same tunnel state serves as the defaults control for these A/Bs
echo "=== BENCH 1m TRESET=0 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_treset && env TRIDENT_TRESET=0 \
  BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1

# hw7 showed FUSE+ZORDER loses on the zero-overdraw flagship (23.78 vs
# 24.85); the shadows scene is the overdraw case where zskip already
# pays — the fused pass's z-skipped pairs skip BOTH sweeps' work there
echo "=== BENCH shadows1080 FUSE=1 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_fuse_sh && env TRIDENT_FUSE=1 \
  BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 3600 python -u scripts/bench_sweep.py shadows1080 \
  >> "$LOG" 2>&1

echo "=== BENCH 1m chunk512/sub32 ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_512 && env TRIDENT_CHUNK=512 TRIDENT_SUB=32 \
  BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1

echo "=== BENCH 1m FUSE=1 (plain) ($(date -u +%H:%M:%S))" >> "$LOG"
gate bench_fuse && env TRIDENT_FUSE=1 \
  BENCH_ITERS=30 BENCH_WATCHDOG=1800 \
  timeout 3600 python -u scripts/bench_sweep.py spheres1080_1m \
  >> "$LOG" 2>&1

echo "##### sweep_r5_hw8 done $(date -u)" >> "$LOG"
