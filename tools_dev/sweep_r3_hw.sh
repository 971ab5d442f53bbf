#!/bin/bash
# Round-3 hardware A/B batch (reconstructed after the /tmp wipe).
# One python process per knob combo: the TRIDENT_* knobs are import-time
# constants in ops/raster_pallas.py / resolve_pallas.py / texel_pallas.py.
# Between runs a cheap probe gates on tunnel health: if the tunnel is down
# we wait in 5-min steps instead of burning each run's 22-min timeout.
#
# Usage: bash tools_dev/sweep_r3_hw.sh [logfile]
set -u
LOG="${1:-/root/repo/tools_dev/r3hw.log}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

probe() {
  timeout 420 python -u -c "
import jax, jax.numpy as jnp
print('probe devices:', jax.devices(), flush=True)
print('probe ok:', float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()), flush=True)
" >> "$LOG" 2>&1
}

run_combo() {
  local label="$1"; shift
  echo "=== COMBO $label  ($(date -u +%H:%M:%S)) env: $*" >> "$LOG"
  # gate on tunnel health; wait up to ~2h in 5-min steps if it is down
  local tries=0
  until probe; do
    tries=$((tries+1))
    echo "--- tunnel down before $label (probe fail #$tries), sleeping 300s" >> "$LOG"
    if [ "$tries" -ge 24 ]; then echo "--- giving up waiting for tunnel" >> "$LOG"; return 1; fi
    sleep 300
  done
  env BENCH_CONFIG=spheres1080_1m BENCH_ITERS=30 BENCH_WATCHDOG=1200 "$@" \
    timeout 1320 python -u bench.py >> "$LOG" 2>&1
  echo "=== END $label exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
}

echo "##### sweep_r3_hw start $(date -u)" >> "$LOG"
run_combo A_defaults
run_combo B_chunk512_sub16   TRIDENT_CHUNK=512 TRIDENT_SUB=16
run_combo C_chunk960_sub16   TRIDENT_CHUNK=960 TRIDENT_SUB=16
run_combo D_chunk512_sub32   TRIDENT_CHUNK=512 TRIDENT_SUB=32
run_combo E_chunk240_sub8    TRIDENT_CHUNK=240 TRIDENT_SUB=8
run_combo F_chunk480_sub8    TRIDENT_CHUNK=480 TRIDENT_SUB=8
run_combo G_resolve_half     TRIDENT_RESOLVE_HALF=1
run_combo H_resolve_skip     TRIDENT_RESOLVE_SKIP=1
run_combo I_skip_plus_half   TRIDENT_RESOLVE_SKIP=1 TRIDENT_RESOLVE_HALF=1
run_combo J_prec_split       TRIDENT_RESOLVE_PREC=split
run_combo K_prec_bf16        TRIDENT_RESOLVE_PREC=bf16
run_combo L_texel_mxu        TRIDENT_TEXEL_MXU=1
run_combo M_texel_slab1024   TRIDENT_TEXEL_MXU=1 TRIDENT_TEXEL_SLAB=1024
run_combo N_texel_br16bc512  TRIDENT_TEXEL_MXU=1 TRIDENT_TEXEL_BR=16 TRIDENT_TEXEL_BC=512
run_combo O_defaults_again
echo "##### sweep_r3_hw done $(date -u)" >> "$LOG"
