#!/bin/bash
# Round-4 hardware batch #5: masked-kernel SUB sweep at CHUNK=256.
# kbench r4hw3 killed CKERN (compact build 42 ms; v2 kernel 31 vs 21 ms
# — the ~160 ns/block fixed cost is col loads/broadcasts, not the
# shareable merge). The remaining block-overhead lever: FEWER, BIGGER
# sub-blocks. CHUNK=256/SUB=32 and /64 were never measured alone
# (r3's 512·32 moved CHUNK too). Expected from the cost model:
# SUB=32 ≈ 3.6 blocks/pair × ~360 ns + 8 checks ≈ −4 ms vs SUB=16.
set -u
LOG="${1:-/root/repo/tools_dev/r4hw5.log}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

probe() {
  timeout 1500 python -u -c "
import jax, jax.numpy as jnp
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

echo "##### sweep_r4_hw5 start $(date -u) commit $(git rev-parse --short HEAD)" >> "$LOG"

echo "=== 1 KBENCH SUB=32 ($(date -u +%H:%M:%S))" >> "$LOG"
gate kb32 && env KB_ITERS=30 KB_BINS=1 TRIDENT_SUB=32 KB_CONFIGS=zero,dflt,full \
  timeout 2400 python -u tools_dev/kbench.py >> "$LOG" 2>&1
echo "=== END kb32 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 2 BENCH 1M SUB=32 ($(date -u +%H:%M:%S))" >> "$LOG"
gate b32 && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_SUB=32 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END b32 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 3 BENCH 1M SUB=64 ($(date -u +%H:%M:%S))" >> "$LOG"
gate b64 && env BENCH_ITERS=30 BENCH_WATCHDOG=1500 TRIDENT_SUB=64 \
  timeout 1800 python -u scripts/bench_sweep.py spheres1080_1m >> "$LOG" 2>&1
echo "=== END b64 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 4 BENCH SUB=32 full configs (if it won) ($(date -u +%H:%M:%S))" >> "$LOG"
gate b32full && env BENCH_ITERS=30 BENCH_WATCHDOG=1800 TRIDENT_SUB=32 \
  timeout 4800 python -u scripts/bench_sweep.py cube512 spheres1080 \
  ultra4k shadows1080 >> "$LOG" 2>&1
echo "=== END b32full exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "=== 5 FLAVORS SUB=32 ($(date -u +%H:%M:%S))" >> "$LOG"
gate f32 && env TRIDENT_SUB=32 \
  timeout 2400 python -u tools_dev/flavor_hw_check.py >> "$LOG" 2>&1
echo "=== END f32 exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "##### sweep_r4_hw5 done $(date -u)" >> "$LOG"
