#!/bin/bash
# Round-4 hardware batch #9: the per-pair floor decomposition for the
# round-5 roadmap. zero-mask (5.3-6.4 ms) minus probe (reset only, real
# records DMA) minus probe_tiny (reset only, 4 KB dummy blocks) splits
# the floor into mask-check cost, record-DMA latency, and bare grid
# machinery.
set -u
LOG="${1:-/root/repo/tools_dev/r4hw9.log}"
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
echo "##### sweep_r4_hw9 start $(date -u) commit $(git rev-parse --short HEAD)" >> "$LOG"
echo "=== 1 KBENCH floor probes ($(date -u +%H:%M:%S))" >> "$LOG"
gate kbp && env KB_ITERS=30 KB_CONFIGS=zero,probe,probe_tiny,zero \
  timeout 2400 python -u tools_dev/kbench.py >> "$LOG" 2>&1
echo "=== END kbp exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "##### sweep_r4_hw9 done $(date -u)" >> "$LOG"
