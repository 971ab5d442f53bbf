"""Production visibility pass: tile-binned Pallas rasterizer.

Replaces the O(T×pixels) reference path with a sort-middle design:

  1. (XLA) Triangle records are packed (Tpad+C, 16) row-major — 9
     homogeneous edge coefficients, clip z and w per vertex — in chunks of C
     consecutive triangles. Meshes are Morton-ordered at build time
     (geometry.mesh.morton_order), so a chunk's union bbox is tight.
     Records chunk 0 is an empty sentinel.
  2. (XLA) Each chunk is binned to the framebuffer tiles its bbox overlaps
     (≤ SPAN_X×SPAN_Y slots); chunks spanning more tiles are emitted for EVERY
     tile (rare: huge triangles). Every candidate tile is tested EXACTLY
     against the 16-triangle sub-block bboxes: tiles no sub-block touches
     emit nothing, and the surviving pairs carry a per-sub-block hit mask.
     Pairs pack as (tile | quantized-chunk-min-depth | chunk_slot) in ONE
     sortable i32 — one sort yields the tile-major pair list AND a
     near-to-far per-tile order (the kernel merge is order-independent
     lexicographic (depth, tid), so ordering is a pure hierarchical-Z
     enabler, not a correctness requirement). Tiles nothing
     touches are masked to background AFTER the kernel from the pair list
     itself (one cheap scatter), so no per-tile sentinel pairs are needed
     and output blocks are always well-defined even if the pair list
     saturates PAIR_BUDGET.
  3. (Pallas) Grid over PAIRS: the scalar-prefetched pair array drives the
     index maps, so each pair's record block streams in with Pallas's own
     double-buffered pipeline — no manual DMA. All pairs of a tile are
     consecutive, so the flat (1, TILE_H·TILE_W) depth/tri output blocks
     accumulate across revisits (a tile's first pair resets them): per
     pair, all C triangles are evaluated against all tile pixels as
     (C, npx) vector work — edge functions, perspective depth z·e / w·e,
     early-Z merge with later-triangle-wins ties (the LESS_OR_EQUAL depth
     state of the reference pipeline, Pipeline.cpp:549-725).

Capacity overflow (pairs beyond PAIR_BUDGET, big chunks beyond MAX_GLOBAL)
degrades to MISSING geometry, never to garbage; the per-frame drop counts
ride out in GBuffer.aux → FrameOutput.aux so the renderer can warn.

The per-pixel winner-triangle GBuffer feeds the same deferred shading pass
as the reference rasterizer, so goldens compare the two directly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trident_tpu.ops.vertex import TriangleSetup
from trident_tpu.render.types import GBuffer

Array = jax.Array

import os as _os

# TRIDENT_TILE_H / TRIDENT_CHUNK: dev-sweep overrides (scripts measure
# constants on hardware without editing source; production defaults below)
TILE_H = int(_os.environ.get("TRIDENT_TILE_H", "32"))
TILE_W = int(_os.environ.get("TRIDENT_TILE_W", "32"))
                     # tile width need not be the 128-lane width: the kernels
                     # only use flat (1, TILE_H·TILE_W) pixel rows, so a
                     # 32×32 tile (same 1024 px) is legal — squarer tiles
                     # overlap fewer ~square Morton sub-block bboxes per
                     # pair at equal vector work. Hardware sweep (round 3,
                     # 1M/1080p, gate off): 128×8→17.0, 64×16→18.5,
                     # 32×32→18.9 FPS — square is best.
CHUNK = int(_os.environ.get("TRIDENT_CHUNK", "256"))
                     # triangles per record block. Hardware sweep (round 3,
                     # 1M/1080p): 64→13.5 FPS, 128→14.9, 256→15.9, 480→16.0
                     # — fewer grid steps / output read-modify-writes at
                     # constant vector work (sub-block masks keep the
                     # evaluated-triangle count flat); 256 is the knee.
SUB = int(_os.environ.get("TRIDENT_SUB", "16"))
                     # triangles per maskable sub-block (Morton-compact
                     # 16-tri groups have ~tile-sized bboxes; dev-sweep
                     # knob — the hit mask spans up to 2 i32 words = 60
                     # sub-blocks, so SUB=8 caps CHUNK at 480, SUB=16
                     # at 960)
SPAN0 = int(_os.environ.get("TRIDENT_SPAN0", "2"))
                     # base-tier span (tiles per axis): every chunk emits
                     # SPAN0² candidate slots. At CHUNK=256 a Morton chunk
                     # of a dense scene boxes ~2×2 of the 32px tiles, so
                     # the old 8×4-slot base left ~87% of the sorted array
                     # as empty sentinels — the sort IS the binning cost
                     # (~65 ns/key on v5e). Wider chunks cascade through
                     # the doubling windowed tiers below, then the whale
                     # slots; only whale overflow drops (counted, aux[1]).
SORT_PAD = _os.environ.get("TRIDENT_SORT_PAD", "0") == "1"
                     # pad the emission slot array with extra sentinels to
                     # a measured-fast sort shape before the one big
                     # jnp.sort. The TPU sort is shape-quantized, not
                     # per-key: 131,072 i32 keys sort in 1.97 ms where the
                     # flagship's natural 73,664 take 3.87 and 49,152 take
                     # 5.53 (r5hw9_sort.log ladder; r5hw2 first saw 24,576
                     # sorting SLOWER than 73,664). Sentinel padding is
                     # semantically identity — pads sort to the end, past
                     # the real-pair prefix the budget slice keeps. Only
                     # kicks in for (SORT_PAD_MIN, SORT_PAD_TARGET)
                     # natural sizes so tiny scenes (cube512) never pay a
                     # bigger sort.
SORT_PAD_MIN = 32768
SORT_PAD_TARGET = 131072
COVER_GATE = _os.environ.get("TRIDENT_COVER_GATE", "0") == "1"
                     # skip a sub-block's reciprocal/reductions/merge when
                     # every edge test missed (bbox hit, no pixel covered).
                     # Measured a LOSS on v5e (14.4 vs 16.5 FPS @1M/1080p):
                     # the @pl.when branchiness costs more than the skipped
                     # vector work once sub-block masks already cull most
                     # misses. Default OFF; knob kept for re-measurement.
QGATE = _os.environ.get("TRIDENT_QGATE", "0") == "1"
                     # quarter-gated sub-block evaluation (round 4): the
                     # per-pair hit masks carry one bit per (sub-block ×
                     # 8-row tile quarter) instead of per sub-block, and
                     # the kernel evaluates each hit sub-block only on the
                     # hit quarters (static 128-aligned lane slices). CPU
                     # stats said a sub-block's bbox covers only ~8% of its
                     # tile (53M swept px/frame → 22M), but the r4hw1
                     # hardware A/B measured a LOSS (19.19 vs 21.44 FPS at
                     # 1M/1080p): the 4x @pl.when regions cost more than
                     # the pruned pixels saved — the kernel is not purely
                     # vector-bound (tools_dev/kbench.py decomposes it).
                     # Default OFF; exact either way (bit-equality test).
ZORDER = _os.environ.get(
    "TRIDENT_ZORDER", _os.environ.get("TRIDENT_ZSKIP", "0")) == "1"
                     # near-to-far pair ordering: the bin sort key carries
                     # a frame-normalized quantized chunk min-depth between
                     # the tile and chunk-slot bits, so a tile's pairs
                     # process front chunks first. Correctness-neutral (the
                     # kernel merge is order-independent lexicographic
                     # (depth, tid) — see _visibility_kernel); it exists to
                     # let the hierarchical-Z skip fire on occluded pairs,
                     # so it FOLLOWS the ZSKIP default unless set
                     # explicitly (its binning z/w divides measured
                     # −0.4 FPS at 1M with no consumer, r4hw1 §3 vs §4).
                     # Auto-disables when tile+chunk bits leave <2 spare.
ZSKIP = _os.environ.get("TRIDENT_ZSKIP", "0") == "1"
                     # pair-level hierarchical-Z skip: build_bins packs a
                     # conservative 13-bit min depth into the spare high
                     # bits of the LAST mask word, quantized over the
                     # frame's [min,max] sub-block depth range (base/step
                     # ride in a 2-float SMEM array — round 3's fixed [0,1]
                     # quantization had 1.2e-4 steps, far coarser than the
                     # flagship's 4e-5 total depth spread, so the bound
                     # could never discriminate and the skip never fired).
                     # The kernel skips a (sub-block, quarter) sweep when
                     # the bound exceeds that QUARTER's current max
                     # accumulated depth. Provably a no-op merge (margin
                     # 1e-5 + floor quantization both round DOWN: d >=
                     # hull min - margin >= bound > acc_d at every pixel
                     # ⇒ `better` is false everywhere, ties included) so
                     # outputs are BIT-IDENTICAL with the knob on/off;
                     # only occluded-after-occluder pairs get cheaper.
ZSKIP_BITS = 13
ZSKIP_SCALE = float((1 << ZSKIP_BITS) - 1)
ZSKIP_MARGIN = 1e-5  # absolute fp-noise bound on the kernel's rational
                     # depth vs the binner's corner ratios (r3 hardware-
                     # validated; see the ZSKIP note)
EXACT_BINS = _os.environ.get("TRIDENT_EXACT_BINS", "0") == "1"
                     # exact-fit ragged pair emission (round 5, VERDICT r4
                     # item 2): instead of the tiered bbox-corner windows
                     # (base span0² slots/chunk + MID_CAPS windowed tiers +
                     # whale broadcast — ~73k sort slots at 1M/1080p of
                     # which ~88% are sentinels), each chunk claims exactly
                     # span_x·span_y slots in ONE flat pool laid out by a
                     # cumsum over chunk candidate areas; a searchsorted
                     # maps pool slots back to (chunk, dx, dy). The sorted
                     # array shrinks to n_chunks·span0²+8192 static slots
                     # (~25k at 1M/1080p — the sort is ~65 ns/key), and the
                     # per-tier argsort compactions + the (MAX_GLOBAL,
                     # n_tiles) whale test disappear. Emission is exact at
                     # EVERY span (a whale claims its true area), so the
                     # only capacity loss is pool-end overflow: chunks past
                     # the pool are dropped-and-counted (aux[1]), same
                     # degrade-to-missing contract as the whale cap.
EXACT_POOL_PAD = 8192
                     # exact-fit pool headroom past n_chunks·span0²: absorbs
                     # chunks wider than the base span (the old mid tiers'
                     # job). Tests shrink it to exercise the counted-drop
                     # path.
ACC = _os.environ.get("TRIDENT_ACC", "1") == "1"
                     # shared-accumulator masked kernel (round 5, the
                     # CKERN-v2 transplant): instead of reducing + merging
                     # into the output tile once PER SWEEP (~163 ns fixed
                     # each — merge + two cross-sub reductions +
                     # predication, measured as ~1/3 of the kernel,
                     # r4kb1.log), each hit sweep accumulates (depth, tid)
                     # elementwise into a (SUB, npx) VMEM scratch pair
                     # with the 6-op lexicographic update CKERN v2 proved
                     # exact and Mosaic-friendly on chip
                     # (_visibility_kernel_ck), and the pair reduces +
                     # merges ONCE at the end. Scratch persists across
                     # @pl.when regions (unlike registers), so the
                     # per-sub-block branch structure — which QGATE/CKERN
                     # showed must stay — is untouched. Bit-exact either
                     # way (same lexicographic semantics; A/B test).
DYNHIT = _os.environ.get("TRIDENT_DYNHIT", "1") == "1"
                     # dynamic hit-sub sweep (round 5): kbench r4kb1/r5hw2
                     # measured ~40-65 ns per @pl.when branch CHECK — the
                     # zero-mask kernel's 6.2-7.5 ms is almost entirely the
                     # 16 UNTAKEN checks — and the flagship takes only
                     # 5.8/16. DYNHIT replaces the NSUB static branch
                     # regions with ONE jax.lax.fori_loop over the pair's
                     # hit sub-blocks: build_bins packs the hit sub
                     # INDICES (descending q, base-DYN_B digits, DPW per
                     # SMEM word) and the kernel dynamic-slices each hit
                     # sub's 16 record rows from the already-resident VMEM
                     # block (no CKERN-style producer gather — the records
                     # layout stays untouched, which r4 proved is the only
                     # cost-neutral place to restructure). Descending q
                     # order makes within-pair tid ties resolve with ONE
                     # strict < compare (ids are monotone in q for a fixed
                     # record row), cutting the 6-op lexicographic
                     # accumulate to 3 ops. Requires ACC (the loop
                     # accumulates into the shared scratch), NQ=1 (no
                     # QGATE), the dense record layout (no RECT/CKERN),
                     # and SUB % 8 == 0 (sublane-aligned dynamic slices).
                     # Exact either way (oracle + A/B bit-equality tests).
                     # DEFAULT ON since the round-5 hardware A/B
                     # (r5hw3.log): 1M/1080p 24.81/24.85 FPS vs 22.80/
                     # 22.83 at the ACC defaults (+8.8%), 110k 46.61 vs
                     # 43.8, kernel dflt 17.06 ms vs 19.05, flavor gate
                     # PASSED on chip.
TRESET = _os.environ.get("TRIDENT_TRESET", "1") == "1"
                     # per-pair run_t scratch reset. treset=False drops it:
                     # stale tids can only persist under SENTINEL run_d
                     # rows (a valid dm always writes depth and tid in the
                     # same btr select), and the final merge excludes
                     # sentinel rows whenever cmin is valid — while an
                     # all-sentinel pair's win is discarded by the
                     # (cmin < acc_d) guard (4.0 can never beat acc ≤ 1.0).
                     # So the reset is provably redundant; bit-exact A/B
                     # tested. Kept ON until the hardware A/B sizes the
                     # ~64 KB/pair VMEM fill it saves.
RECT = _os.environ.get("TRIDENT_RECT", "0") == "1"
                     # transposed DENSE records (round-4 floor follow-up):
                     # the per-pair record DMA is ~1 µs serialized because
                     # a (CHUNK, 16) block is 16-of-128 lanes sparse in
                     # VMEM (r4hw9 probes; deeper buffering is capped at 2
                     # by Mosaic). RECT stores records as (16, N) — the
                     # (16, CHUNK) block is 16 sublanes × 256 lanes DENSE,
                     # so the DMA moves 16 KB contiguous at full bandwidth
                     # — and the kernel pays ONE (16,256)→(256,16)
                     # transpose per pair to restore the compute layout.
                     # Wins if Mosaic's transpose costs < the ~0.7 µs of
                     # exposed DMA it removes.
RECPAD = _os.environ.get("TRIDENT_RECPAD", "0") == "1"
                     # lane-padded visibility records (round-4 DMA
                     # hypothesis): kbench measured the per-pair cost
                     # floor INVARIANT across CHUNK and SUB — i.e. bound
                     # by record BYTES, ~23 GB/s effective. A (CHUNK, 16)
                     # f32 block lane-pads 16→128 in VMEM, so the DMA
                     # restrides 64 B rows into a padded destination at
                     # ~1/8 bandwidth. RECPAD stores the records
                     # pre-padded to (·, 128) so the copy is contiguous
                     # at full bandwidth — 8× the HBM footprint for the
                     # visibility table only (537 MB at 1M tris), kernel
                     # arithmetic unchanged (the VMEM block was always
                     # this shape; loads were always lane-full).
CKERN = _os.environ.get("TRIDENT_CKERN", "0") == "1"
                     # compact-bank visibility kernel (round-4 experiment,
                     # MEASURED A LOSS — default stays OFF; kept as the
                     # documented negative result so it is not retried):
                     # the binner gathers each pair's HIT sub-blocks into
                     # a padded contiguous block (padding duplicates are
                     # bit-exactly free — the lexicographic merge is
                     # idempotent) and the kernel evaluates CK_BANK-slice
                     # banks with no per-sub branch checks. kbench r4kb1
                     # suggested ~13 ms; reality (r4hw2/r4hw3): v1's dense
                     # (128,1024) region spilled to VMEM (10.8 FPS), v2's
                     # shared accumulator measured 31 ms vs the masked
                     # kernel's 19.9 — the ~160 ns/block "region fixed"
                     # cost is column loads/broadcast setup, which
                     # sharing the merge cannot remove — and the compact
                     # gather adds +8.3 ms to build_bins. Zero cost when
                     # OFF (everything gated on the static flag). Exact
                     # either way (oracle + banded equality tests).
CK_BANK = int(_os.environ.get("TRIDENT_CK_BANK", "8"))
CK_NBANKS = 2   # derived in recompute_derived()
                     # hit sub-blocks per compact bank; 2 banks must cover
                     # NSUB (flagship hit distribution p50=5 p90=12 of 16)
MAX_GLOBAL = int(_os.environ.get("TRIDENT_MAX_GLOBAL", "8"))
                     # whale-chunk slots (span beyond every mid tier): each
                     # costs an (n_tiles,) row in the bin sort whether used
                     # or not — 8 rows = 65k of the 4K sort, so the cap is
                     # small and the MID_CAPS tiers below absorb everything
                     # up to 4x the base span first. Overflow degrades to
                     # counted drops (aux[1]), never garbage.
MID_CAPS = (1024, 128, 32, 8)
                     # cascading mid tiers: tier k admits up to MID_CAPS[k]
                     # chunks whose tile span fits a (span0<<(k+1))² window
                     # anchored at their bbox corner (compacted by stable
                     # argsort like the whale tier), where span0 is the
                     # resolution-scaled base span build_bins derives per
                     # frame shape. Chunks past a tier's cap cascade to
                     # the next tier, then to the global whale slots. At
                     # 1080p/SPAN0=2 the windows are 4²/8²/16²/32² tiles;
                     # the first cap is wide (1024 chunks) because medium-
                     # object scenes put EVERY chunk there (a 110k-tri
                     # sphere grid spans ~3×3 tiles per chunk).
PAIR_BUDGET_OVERRIDE = (int(_os.environ["TRIDENT_PAIR_BUDGET"])
                        if "TRIDENT_PAIR_BUDGET" in _os.environ else None)
                     # scalar-prefetch arrays live in SMEM (~1MB); cap them.
                     # Real pairs are a sorted prefix; overflow truncates the
                     # farthest-sorted tiles' geometry (counted in `aux`).
                     # (2+MASK_WORDS) i32 arrays ride in SMEM, so the default
                     # shrinks as mask words grow ((2+3)·40960·4B = 819KB) —
                     # real pair counts are far below (flagship 8.9k, 4K 17k).
DEPTH_SENTINEL = 4.0


def recompute_derived() -> None:
    """(Re)derive every constant that hangs off the base knobs, with the
    same validation as import time. Called at import AND by
    ops.kernel_knobs.apply() so knobs are settable per-run (SURVEY §5
    config unification) — kernels read the module globals at trace time,
    and the renderer keys its jit caches on kernel_knobs.trace_key()."""
    global NSUB, NQ, MASK_BITS, MASK_WORDS, ZSKIP_SHIFT, ZSKIP_PACK
    global SPAN_X, SPAN_Y, PAIR_BUDGET, DYN_B, DPW, DYN_WORDS
    if CKERN and QGATE:
        raise ValueError("TRIDENT_CKERN=1 and TRIDENT_QGATE=1 are exclusive "
                         "visibility-kernel structures")
    if DYNHIT and (CKERN or QGATE or RECT):
        raise ValueError(
            "TRIDENT_DYNHIT=1 is exclusive with CKERN/QGATE/RECT: the "
            "dynamic hit loop assumes the dense masked-kernel record "
            "layout and whole-tile (NQ=1) sweeps")
    if DYNHIT and not ACC:
        raise ValueError(
            "TRIDENT_DYNHIT=1 requires TRIDENT_ACC=1: the dynamic loop "
            "accumulates into the shared (SUB, npx) scratch")
    if SUB < 1:
        raise ValueError(f"TRIDENT_SUB={SUB} must be >= 1")
    if CHUNK < SUB or CHUNK % SUB != 0:
        raise ValueError(
            f"TRIDENT_CHUNK={CHUNK} must be a positive multiple of "
            f"SUB={SUB}: the kernel splits each chunk into SUB-triangle "
            "sub-blocks")
    NSUB = CHUNK // SUB  # sub-blocks per chunk (hit-maskable unit)
    if DYNHIT and SUB % 8 != 0:
        raise ValueError(
            f"TRIDENT_DYNHIT=1 needs TRIDENT_SUB={SUB} % 8 == 0: the "
            "kernel dynamic-slices SUB record rows at q*SUB, which must "
            "be f32 sublane-aligned")
    if TILE_H < 1 or 128 % TILE_H != 0:
        raise ValueError(
            f"TRIDENT_TILE_H={TILE_H} must divide 128: SPAN_Y = 128//TILE_H "
            "must stay consistent with the binning span")
    if TILE_W < 1 or 256 % TILE_W != 0:
        raise ValueError(
            f"TRIDENT_TILE_W={TILE_W} must divide 256: SPAN_X = 256//TILE_W "
            "must stay consistent with the binning span")
    SPAN_X = 256 // TILE_W   # legacy max small-chunk span (256×128 px):
    SPAN_Y = 128 // TILE_H   # keeps the divisibility contract meaningful
    if SPAN0 < 1:
        raise ValueError(f"TRIDENT_SPAN0={SPAN0} must be >= 1")
    NQ = 4 if QGATE else 1   # tile quarters (8-row row-bands) per tile
    if QGATE and (TILE_H * TILE_W) % (NQ * 128) != 0:
        raise ValueError(
            f"TRIDENT_QGATE=1 needs tile quarters lane-aligned: "
            f"{TILE_W}x{TILE_H} px / {NQ} quarters is not a multiple of 128")
    if QGATE and TILE_H % NQ != 0:
        raise ValueError(f"TRIDENT_TILE_H={TILE_H} must divide into {NQ} "
                         "whole-row quarters for TRIDENT_QGATE=1")
    if CKERN:
        # one SMEM word per pair: the hit COUNT (the bank-1 gate), with
        # the hierarchical-Z bound in the bits above it
        MASK_BITS = max(5, NSUB.bit_length())
        MASK_WORDS = 1
        ZSKIP_SHIFT = MASK_BITS
    elif DYNHIT:
        # word 0: hit COUNT in the low bits (+ the hierarchical-Z bound
        # above, CKERN-style); words 1..DYN_WORDS: the hit sub-block
        # indices in DESCENDING q order, DPW base-DYN_B digits per word
        # (mul/add packing — div/rem unpack in the kernel; bit ops on
        # Mosaic scalars are avoided repo-wide)
        MASK_BITS = max(5, NSUB.bit_length())
        ZSKIP_SHIFT = MASK_BITS
        dyn_bits = max(1, (NSUB - 1).bit_length())
        DYN_B = 1 << dyn_bits
        DPW = 30 // dyn_bits
        DYN_WORDS = -(-NSUB // DPW)
        MASK_WORDS = 1 + DYN_WORDS
    else:
        MASK_BITS = NSUB * NQ   # hit bits per pair (sub-major, NQ-minor)
        MASK_WORDS = -(-MASK_BITS // 30)
                     # hit-mask words per pair: 30 bits ride in each i32
                     # scalar-prefetch word (bit 31 would go negative)
        ZSKIP_SHIFT = MASK_BITS - 30 * (MASK_WORDS - 1)
                     # hit bits used in the last word; the depth bound
                     # packs in the bits above them when they fit
    ZSKIP_PACK = (30 - ZSKIP_SHIFT) >= ZSKIP_BITS
    if MAX_GLOBAL < 1:
        raise ValueError(f"TRIDENT_MAX_GLOBAL={MAX_GLOBAL} must be >= 1")
    if MASK_WORDS > (4 if DYNHIT else 3):
        raise ValueError(
            f"TRIDENT_CHUNK={CHUNK}/TRIDENT_SUB={SUB} with QGATE="
            f"{int(QGATE)} DYNHIT={int(DYNHIT)} needs {MASK_WORDS} "
            f"hit-mask words; at most {4 if DYNHIT else 3} fit the SMEM "
            "scalar-prefetch budget")
    global CK_NBANKS
    if CKERN:
        if CK_BANK < 1:
            raise ValueError(f"TRIDENT_CK_BANK={CK_BANK} must be >= 1")
        CK_NBANKS = -(-NSUB // CK_BANK)
                     # banks of CK_BANK hit subs; bank b>0 runs behind one
                     # nhit > b·CK_BANK branch. Flagship hit distribution
                     # (nhit mean 5.8, P(>4)=.54 P(>8)=.25 P(>12)=.08):
                     # 4 banks of 4 evaluate ~7.4 slices/pair where 2
                     # banks of 8 evaluate ~10.
        if CK_NBANKS > 8:
            raise ValueError(
                f"TRIDENT_CK_BANK={CK_BANK}: {CK_NBANKS} banks for "
                f"NSUB={NSUB} is too branchy; raise CK_BANK")
        if CK_BANK * SUB > 2048:
            raise ValueError(
                f"TRIDENT_CK_BANK={CK_BANK}×SUB={SUB} rows per bank exceed "
                "a reasonable VMEM block")
        # the compact table costs PAIR_BUDGET × 2·CK_BANK·SUB × 64 B of
        # HBM (320 MB at the default); real pair counts are 9-17k on the
        # bench scenes, so the CKERN default budget is tighter — raise
        # the pair_budget knob for extreme scenes (overflow is counted)
        PAIR_BUDGET = (PAIR_BUDGET_OVERRIDE
                       if PAIR_BUDGET_OVERRIDE is not None else 20480)
    else:
        PAIR_BUDGET = (PAIR_BUDGET_OVERRIDE
                       if PAIR_BUDGET_OVERRIDE is not None
                       else {1: 65536, 2: 49152, 3: 40960,
                             4: 32768}[MASK_WORDS])


recompute_derived()


class PallasBins(NamedTuple):
    records: Array      # ((NC+1)*C, 16) f32; chunk slot 0 = empty sentinel
    pair_tile: Array    # (NPAIR,) i32 tile per pair (sorted, tile-major)
    pair_chunk: Array   # (NPAIR,) i32 chunk slot per pair (0 = sentinel)
    pair_mask: tuple    # MASK_WORDS × (NPAIR,) i32, 30 hit bits per word,
                        # bit q·NQ+w = sub-block q hits tile quarter w
                        # (whole-tile bits when QGATE off, NQ=1) — which
                        # SUB-triangle sub-blocks of the chunk have a bbox
                        # touching this pair's tile (quarter). Computed
                        # exactly per (tile, sub) at binning time, so (a) a
                        # tile inside a chunk's union bbox that intersects
                        # no sub-block emits NO pair at all, and (b) the
                        # kernel evaluates only hit sub-blocks on hit
                        # quarters (Morton order keeps them spatially
                        # compact). When ZSKIP & ZSKIP_PACK, the LAST
                        # word's bits above ZSKIP_SHIFT carry the pair's
                        # conservative quantized min depth (see ZSKIP).
    zparams: Array      # (2,) f32 [base, step] — the hierarchical-Z
                        # bound dequantization constants (zeros when unused)
    n_real: Array       # () i32 — real pairs (sorted prefix; rest is padding)
    n_pairs: int        # static capacity (== NPAIR)
    aux: Array          # (2,) i32 — [truncated real pairs, dropped big chunks]
    compact: Array | None = None
                        # CKERN only: (NPAIR, 2·CK_BANK·SUB, 16) f32 —
                        # each pair's hit sub-block record rows gathered
                        # contiguous (padded by duplicating the first hit
                        # sub; bank 1 only evaluated when nhit > CK_BANK),
                        # with the triangle id in column 15. pair_mask is
                        # then a single word: nhit (+ zskip bits above
                        # ZSKIP_SHIFT).


def _build_records(setup: TriangleSetup, tpad: int,
                   setup_cols=None) -> Array:
    t = setup.edge.shape[0]
    if tpad >= (1 << 24):
        # column 15 carries the global triangle id as f32 — exact only
        # below 2^24. BOTH kernels read winner ids from it (the masked
        # kernel since round 4), so the guard applies regardless of CKERN
        # (advisor round-4 finding; the old code derived ids from iota).
        raise ValueError(
            f"{t} triangles: triangle ids ride an f32 record column, "
            "exact only below 2^24 — split the scene across draws")
    valid = setup.valid
    # planar fast path: SetupCols carries the identical column values
    # pre-stack — consuming them here (the corner chain's only edge/z
    # reader besides the resolve records) lets XLA DCE setup.edge/z
    ecol = ((lambda k, c: setup_cols.e[3 * k + c]) if setup_cols is not None
            else (lambda k, c: setup.edge[:, k, c]))
    zcol = ((lambda k: setup_cols.z[k]) if setup_cols is not None
            else (lambda k: setup.z[:, k]))
    wcol = ((lambda k: setup_cols.w[k]) if setup_cols is not None
            else (lambda k: setup.w[:, k]))
    cols = []
    for k in range(3):  # e_k = a*px + b*py + c ; invalid triangles get e ≡ -1
        cols.append(jnp.where(valid, ecol(k, 0), 0.0))
        cols.append(jnp.where(valid, ecol(k, 1), 0.0))
        cols.append(jnp.where(valid, ecol(k, 2), -1.0))
    for k in range(3):
        cols.append(jnp.where(valid, zcol(k), 0.0))
    for k in range(3):
        cols.append(jnp.where(valid, wcol(k), 1.0))
    # column 15: the GLOBAL triangle id (f32-exact below 2^24) — the
    # compact-bank kernel reads winner ids from here; sentinel/padding
    # rows carry -1 (they never cover, so it is never selected)
    cols.append(jnp.arange(t, dtype=jnp.float32))
    rec = jnp.stack(cols, axis=1)                       # (T, 16) row-major
    empty_row = jnp.zeros((16,), rec.dtype)
    empty_row = empty_row.at[2].set(-1.0).at[5].set(-1.0).at[8].set(-1.0)
    empty_row = empty_row.at[12:15].set(1.0).at[15].set(-1.0)
    # sentinel chunk 0 in front + tail padding
    front = jnp.tile(empty_row, (CHUNK, 1))
    tail = jnp.tile(empty_row, (tpad - t, 1)) if tpad != t else None
    parts = [front, rec] + ([tail] if tail is not None else [])
    return jnp.concatenate(parts, axis=0)


def _tiered_emission(nonempty, span_x, span_y, span0, ctx0, cty0, n_chunks,
                     n_tiles, ntx, shift_t, slot_ids, zqc, pack_keys,
                     subblock_hit, sentinel):
    """The pre-round-5 pair emission (default when EXACT_BINS is off):
    small chunks emit span0² bbox-window slots, wider chunks cascade
    through MID_CAPS windowed tiers (stable-argsort compaction), whales
    broadcast against every tile. Returns the UNSORTED slot array plus the
    dropped-whale count. Kept for A/B against the exact-fit emission."""
    small = nonempty & (span_x <= span0) & (span_y <= span0)

    # small chunks → up to span0×span0 (tile, chunk) pairs; a candidate
    # tile no sub-block touches emits nothing (tighter than the union bbox)
    k = span0 * span0
    dx = jnp.arange(k, dtype=jnp.int32) % span0
    dy = jnp.arange(k, dtype=jnp.int32) // span0
    tx = ctx0[:, None] + dx[None, :]
    ty = cty0[:, None] + dy[None, :]
    in_range = small[:, None] & subblock_hit(ty, tx)
    tile_of = ty * ntx + tx
    small_pairs = jnp.where(
        in_range, pack_keys(tile_of, slot_ids[:, None], zqc[:, None]),
        sentinel).astype(jnp.int32)

    # wider chunks cascade through windowed mid tiers (tier k: span up to
    # SPAN0<<(k+1), window anchored at the bbox corner, cap MID_CAPS[k]
    # chunks via stable-argsort compaction), then to global whale slots.
    # Only chunks past the WHALE cap are dropped (counted in aux[1]) —
    # mid-tier overflow just falls through to the next tier.
    parts = [small_pairs.reshape(-1)]
    admitted = small
    # mid-tier windows scale with the SAME resolution factor as the base
    # span: at 4K a chunk one tile over span0 must land in the wide-cap
    # tier 0, not cascade through the narrow caps into whale drops
    wx, wy = span0, span0
    for cap in MID_CAPS:
        wx, wy = wx * 2, wy * 2
        fits = nonempty & ~admitted & (span_x <= wx) & (span_y <= wy)
        order = jnp.argsort(~fits, stable=True).astype(jnp.int32)
        g = min(cap, n_chunks)
        gsel = order[:g]
        gvalid = fits[gsel]
        admitted = admitted | jnp.zeros(
            n_chunks, bool).at[gsel].set(gvalid)
        kk = wx * wy
        dx = jnp.arange(kk, dtype=jnp.int32) % wx
        dy = jnp.arange(kk, dtype=jnp.int32) // wx
        tx = ctx0[gsel][:, None] + dx[None, :]
        ty = cty0[gsel][:, None] + dy[None, :]
        m = gvalid[:, None] & subblock_hit(ty, tx, gsel)
        parts.append(jnp.where(
            m, pack_keys(ty * ntx + tx, slot_ids[gsel][:, None],
                         zqc[gsel][:, None]),
            sentinel).astype(jnp.int32).reshape(-1))

    # whale chunks: broadcast to every tile a sub-block touches. Chunks
    # past the cap are DROPPED (missing geometry) and counted in aux[1].
    gmask = nonempty & ~admitted
    order = jnp.argsort(~gmask, stable=True).astype(jnp.int32)
    g = min(MAX_GLOBAL, n_chunks)
    gsel = order[:g]
    gvalid = gmask[gsel]
    n_big_dropped = (jnp.sum(gmask) - jnp.sum(gvalid)).astype(jnp.int32)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    g_ty = jnp.broadcast_to(tile_ids[None, :] // ntx, (g, n_tiles))
    g_tx = jnp.broadcast_to(tile_ids[None, :] % ntx, (g, n_tiles))
    big_mask = gvalid[:, None] & subblock_hit(g_ty, g_tx, gsel)
    big_pairs = jnp.where(
        big_mask,
        pack_keys(tile_ids[None, :], gsel[:, None] + 1, zqc[gsel][:, None]),
        sentinel).astype(jnp.int32)
    parts.append(big_pairs.reshape(-1))
    return jnp.concatenate(parts), n_big_dropped


def build_bins(setup: TriangleSetup, width: int, height: int,
               setup_cols=None) -> PallasBins:
    t = setup.edge.shape[0]
    n_chunks = max(1, -(-t // CHUNK))
    tpad = n_chunks * CHUNK
    ntx = -(-width // TILE_W)
    nty = -(-height // TILE_H)
    n_tiles = ntx * nty
    # pair keys pack (tile, [quantized chunk depth,] chunk slot) into one
    # sortable non-negative i32; the bit split is computed per (scene,
    # framebuffer) shape — both static under jit
    cbits = max(1, n_chunks.bit_length())     # chunk slots 0..n_chunks
    tbits = max(1, n_tiles.bit_length())      # sentinel tile id == n_tiles
    zbits = min(10, 31 - tbits - cbits) if ZORDER else 0
    if zbits < 2:  # no room for a useful depth key → plain (tile, chunk)
        zbits = 0
    if tbits + cbits > 31:
        raise ValueError(
            f"framebuffer {width}x{height} ({n_tiles} raster tiles) with "
            f"{t} triangles ({n_chunks} chunks) exceeds the 31-bit packed-"
            "pair key. Render in bands (parallel.framebuffer), lower "
            "supersample/resolution, or split the scene across draws.")
    shift_t = zbits + cbits

    records = _build_records(setup, tpad, setup_cols=setup_cols)

    # chunk union bboxes (pixel space, x0/y0 incl, x1/y1 excl)
    bbox = setup.bbox
    valid = setup.valid
    if tpad != t:
        empty = jnp.tile(jnp.asarray([1 << 20, 1 << 20, 0, 0], jnp.int32),
                         (tpad - t, 1))
        bbox = jnp.concatenate([bbox, empty], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros(tpad - t, bool)])
    big = jnp.asarray(1 << 20, jnp.int32)
    x0 = jnp.where(valid, bbox[:, 0], big).reshape(n_chunks, CHUNK).min(axis=1)
    y0 = jnp.where(valid, bbox[:, 1], big).reshape(n_chunks, CHUNK).min(axis=1)
    x1 = jnp.where(valid, bbox[:, 2], 0).reshape(n_chunks, CHUNK).max(axis=1)
    y1 = jnp.where(valid, bbox[:, 3], 0).reshape(n_chunks, CHUNK).max(axis=1)
    nonempty = (x1 > x0) & (y1 > y0)

    ctx0 = jnp.clip(x0 // TILE_W, 0, ntx - 1)
    cty0 = jnp.clip(y0 // TILE_H, 0, nty - 1)
    ctx1 = jnp.clip((x1 - 1) // TILE_W, 0, ntx - 1)
    cty1 = jnp.clip((y1 - 1) // TILE_H, 0, nty - 1)

    # per SUB-block (16 consecutive Morton-ordered triangles) tile bboxes:
    # the emission below tests each candidate tile against these EXACTLY,
    # so the per-pair mask both prunes dead pairs and tells the kernel
    # which sub-blocks to evaluate (empty sub-block = never hits)
    qx0 = jnp.where(valid, bbox[:, 0], big).reshape(
        n_chunks, NSUB, SUB).min(axis=2)
    qy0 = jnp.where(valid, bbox[:, 1], big).reshape(
        n_chunks, NSUB, SUB).min(axis=2)
    qx1 = jnp.where(valid, bbox[:, 2], 0).reshape(
        n_chunks, NSUB, SUB).max(axis=2)
    qy1 = jnp.where(valid, bbox[:, 3], 0).reshape(
        n_chunks, NSUB, SUB).max(axis=2)
    q_nonempty = (qx1 > qx0) & (qy1 > qy0)                       # (NC, NSUB)
    qty0 = jnp.where(q_nonempty, jnp.clip(qy0 // TILE_H, 0, nty - 1), 32767)
    qty1 = jnp.where(q_nonempty, jnp.clip((qy1 - 1) // TILE_H, 0, nty - 1), -1)
    qtx0 = jnp.where(q_nonempty, jnp.clip(qx0 // TILE_W, 0, ntx - 1), 32767)
    qtx1 = jnp.where(q_nonempty, jnp.clip((qx1 - 1) // TILE_W, 0, ntx - 1), -1)
    # pixel-space sub-block y bounds for the quarter masks (empty → miss)
    qpy0 = jnp.where(q_nonempty, qy0, big).astype(jnp.int32)
    qpy1 = jnp.where(q_nonempty, qy1, -1).astype(jnp.int32)

    # conservative per-sub-block min depth hulls, shared by near-to-far
    # ordering (chunk-level) and the hierarchical-Z bound (pair-level).
    # Ratios are hull bounds only when zi has no cancellation, i.e. every
    # corner z >= 0; negative ratios clip to 0 = never skip. Computed only
    # when a consumer exists (the divides + gathers are per-frame binning
    # cost — advisor round-3 finding).
    need_zskip = ZSKIP and ZSKIP_PACK
    need_z = need_zskip or zbits > 0
    if need_z:
        zs = [setup_cols.z[k] if setup_cols is not None else setup.z[:, k]
              for k in range(3)]
        ws_ = [setup_cols.w[k] if setup_cols is not None else setup.w[:, k]
               for k in range(3)]
        if tpad != t:
            zs = [jnp.concatenate([z, jnp.zeros(tpad - t, z.dtype)])
                  for z in zs]
            ws_ = [jnp.concatenate([w_, jnp.ones(tpad - t, w_.dtype)])
                   for w_ in ws_]
        zs = [jnp.where(valid, z, 0.0) for z in zs]
        ws_ = [jnp.where(valid, w_, 1.0) for w_ in ws_]
        w_safe = ((ws_[0] > 1e-6) & (ws_[1] > 1e-6) & (ws_[2] > 1e-6))
        ratio = jnp.minimum(
            jnp.minimum(zs[0] / jnp.maximum(ws_[0], 1e-6),
                        zs[1] / jnp.maximum(ws_[1], 1e-6)),
            zs[2] / jnp.maximum(ws_[2], 1e-6))
        # invalid rows never cover a pixel: exclude them from the sub-block
        # min (2.0 > any accepted depth); unsafe-w rows can cover anywhere
        # in [0,1] → bound 0 (never skip)
        zmin_tri = jnp.where(valid, jnp.where(w_safe, ratio, 0.0), 2.0)
        zmin_sub = zmin_tri.reshape(n_chunks, NSUB, SUB).min(axis=2)
        # frame depth range over real sub-blocks — the quantization grid.
        # Round 3 quantized over fixed [0,1]; at the flagship's ZO far-
        # depth compression (all depths within 4e-5) that grid could not
        # tell any two chunks apart and the skip was dead.
        zvalid = zmin_sub <= 1.0
        any_z = jnp.any(zvalid)
        z_lo = jnp.where(any_z, jnp.min(jnp.where(zvalid, zmin_sub, 2.0)), 0.0)
        z_hi = jnp.where(any_z, jnp.max(jnp.where(zvalid, zmin_sub, -1.0)), 1.0)
        z_hi = jnp.maximum(z_hi, z_lo)
    if zbits > 0:
        zmin_chunk = zmin_sub.min(axis=1)
        ord_step = jnp.maximum((z_hi - z_lo) / ((1 << zbits) - 1), 1e-30)
        zqc = jnp.clip(
            jnp.floor((jnp.where(zmin_chunk <= 1.0, zmin_chunk, z_hi) - z_lo)
                      / ord_step),
            0, (1 << zbits) - 1).astype(jnp.int32)
    else:
        zqc = jnp.zeros((n_chunks,), jnp.int32)

    def pack_keys(tile_arr, slot_col, zq_col):
        """(tile << zbits | chunk-depth) << cbits | slot — sortable i32."""
        return ((((tile_arr << zbits) | zq_col) << cbits)
                | slot_col).astype(jnp.int32)

    def subblock_hit(ty, tx, sel=None):
        """Does ANY sub-block bbox touch the candidate tile? (Pruning only:
        the survivors' per-sub-block masks are recomputed post-sort, so the
        tiers never pack bits — NSUB may exceed one i32's worth.) `sel`
        restricts the test to a compacted chunk subset (mid/whale tiers);
        every tier uses THIS test so they can't drift apart."""
        q0, q1 = (qty0, qty1) if sel is None else (qty0[sel], qty1[sel])
        x0_, x1_ = (qtx0, qtx1) if sel is None else (qtx0[sel], qtx1[sel])
        hit = ((ty[..., None] >= q0[:, None, :])
               & (ty[..., None] <= q1[:, None, :])
               & (tx[..., None] >= x0_[:, None, :])
               & (tx[..., None] <= x1_[:, None, :]))             # (·,K,NSUB)
        return jnp.any(hit, axis=-1)

    span_x = ctx1 - ctx0 + 1
    span_y = cty1 - cty0 + 1

    # The base-tier span scales with the frame's tile extent (static per
    # jit shape): a chunk's pixel footprint grows linearly with render
    # resolution while tiles stay 32px, so the ~2×2-tile chunks SPAN0=2
    # was calibrated on at 1080p (60×34 tiles) become ~4×4 at 4K/SSAA.
    # Without this, 4K cascades thousands of chunks through the capped
    # mid tiers into counted whale drops (measured: 1077 chunks of the
    # ultra4k bench scene). The mid-tier windows stay in SPAN0 units —
    # at high span0 the narrow tiers simply idle.
    f = 1
    while ntx > 68 * f or nty > 40 * f:
        f *= 2
    span0 = SPAN0 * f

    # chunk slot in records = chunk index + 1 (slot 0 is the sentinel)
    slot_ids = jnp.arange(1, n_chunks + 1, dtype=jnp.int32)

    sentinel = jnp.asarray(n_tiles << shift_t, jnp.int32)
    if EXACT_BINS:
        # exact-fit ragged emission (see the EXACT_BINS knob note): chunk c
        # claims slots [starts[c], ends[c]) of one flat pool, slot i within
        # the claim enumerating its bbox tiles row-major. Pool size is
        # static per (scene, frame) shape; chunks past the pool end drop
        # to counted missing geometry exactly like the old whale cap.
        area = jnp.where(nonempty, span_x * span_y, 0).astype(jnp.int32)
        pool = n_chunks * span0 * span0 + EXACT_POOL_PAD
        ends = jnp.cumsum(area).astype(jnp.int32)
        starts = ends - area
        total = ends[-1]
        j = jnp.arange(pool, dtype=jnp.int32)
        cc = jnp.searchsorted(ends, j, side="right").astype(jnp.int32)
        in_pool = (j < total) & (cc < n_chunks)
        cc = jnp.minimum(cc, n_chunks - 1)
        i = j - starts[cc]
        sx = jnp.maximum(span_x[cc], 1)
        tx = ctx0[cc] + i % sx
        ty = cty0[cc] + i // sx
        m = in_pool & subblock_hit(ty[:, None], tx[:, None], cc)[:, 0]
        pairs = jnp.where(
            m, pack_keys(ty * ntx + tx, slot_ids[cc], zqc[cc]),
            sentinel).astype(jnp.int32)
        # chunks whose claim crosses the pool end lose (some) tiles
        n_big_dropped = jnp.sum(nonempty & (ends > pool)).astype(jnp.int32)
    else:
        pairs, n_big_dropped = _tiered_emission(
            nonempty, span_x, span_y, span0, ctx0, cty0, n_chunks, n_tiles,
            ntx, shift_t, slot_ids, zqc, pack_keys, subblock_hit, sentinel)

    # One sort of the full slot array (mostly empty-sentinel slots) orders
    # AND compacts: real pairs form the sorted prefix. The sub-block hit
    # masks are NOT carried through the sort (a key-value sort doubles the
    # sorted bytes on the frame's critical path) — they are recomputed for
    # the ≤PAIR_BUDGET survivors below with one bbox-table gather per
    # pair. Measured note: a cumsum+scatter compaction before a smaller
    # sort looked cheaper on paper but jnp.cumsum over a 1-D ~650k array
    # lowers pathologically on TPU (binning 9.8 → 38 ms at 1M) — XLA's
    # sort is the fast path here. (The EXACT_BINS cumsum is over n_chunks
    # — three orders of magnitude shorter — not that pathological shape.)
    if SORT_PAD and SORT_PAD_MIN < pairs.shape[0] < SORT_PAD_TARGET:
        # see the SORT_PAD knob note: the sort is shape-quantized and
        # SORT_PAD_TARGET is a measured-fast size; extra sentinels are
        # just more empty slots (static shape — pairs.shape[0] is set by
        # the tier layout, not the scene data)
        pairs = jnp.concatenate([
            pairs, jnp.full((SORT_PAD_TARGET - pairs.shape[0],),
                            n_tiles << shift_t, jnp.int32)])
    pairs = jnp.sort(pairs)
    # real pairs form a sorted prefix; padding slots clamp to
    # (last tile, sentinel chunk 0) and sit beyond the dynamic grid bound
    overflow = pairs >= (n_tiles << shift_t)
    n_real_total = jnp.sum(~overflow).astype(jnp.int32)
    pairs = jnp.where(overflow, ((n_tiles - 1) << shift_t), pairs)
    budget = PAIR_BUDGET
    if CKERN and PAIR_BUDGET_OVERRIDE is None:
        # the compact table costs budget × 2·CK_BANK·SUB·64 B to gather,
        # write, and stream — scale the cap with the scene (small scenes
        # emit few base-tier slots; the +4096 headroom absorbs mid/whale
        # tiers). Static per jit shape; overflow stays a counted aux.
        est = n_chunks * span0 * span0 + 4096
        budget = min(PAIR_BUDGET, -(-est // 2048) * 2048)
    if pairs.shape[0] > budget:
        pairs = pairs[:budget]
    n_real = jnp.minimum(n_real_total, pairs.shape[0])
    n_truncated = n_real_total - n_real
    # unpack for the scalar-prefetch index maps (plain array reads lower
    # reliably in Mosaic index maps; bit ops there hung the compiler)
    pair_tile = pairs >> shift_t
    pair_chunk = pairs & ((1 << cbits) - 1)

    # recompute each surviving pair's hit mask: one row gather from the
    # per-chunk bbox table + vector compares (sentinel chunk 0 → all-miss
    # row → mask 0). With QGATE the bits are per (sub-block, quarter):
    # the sub-block's pixel-y bounds against each tile quarter's row band.
    qtab = jnp.concatenate([
        jnp.stack([jnp.full((1, NSUB), 32767, jnp.int32),
                   jnp.full((1, NSUB), -1, jnp.int32),
                   jnp.full((1, NSUB), 32767, jnp.int32),
                   jnp.full((1, NSUB), -1, jnp.int32),
                   jnp.full((1, NSUB), big, jnp.int32),
                   jnp.full((1, NSUB), -1, jnp.int32)], axis=1),
        jnp.stack([qty0, qty1, qtx0, qtx1, qpy0, qpy1],
                  axis=1).astype(jnp.int32),
    ], axis=0)                                       # (NC+1, 6, NSUB)
    rows = qtab[pair_chunk]                          # (NPAIR, 6, NSUB)
    p_ty = (pair_tile // ntx)[:, None]
    p_tx = (pair_tile % ntx)[:, None]
    hit = ((p_ty >= rows[:, 0]) & (p_ty <= rows[:, 1])
           & (p_tx >= rows[:, 2]) & (p_tx <= rows[:, 3]))
    real = jnp.arange(pairs.shape[0], dtype=jnp.int32) < n_real
    compact = None
    if CKERN:
        # (the 2^24 triangle-id guard lives in _build_records now — it
        # applies to BOTH kernels, not just CKERN)
        # compacted hit-sub list per pair (hit subs first, ascending q;
        # padding duplicates the FIRST hit sub — the lexicographic merge
        # is idempotent so duplicates are bit-exactly free; padding PAIRS
        # have the all-miss sentinel row → nothing covers)
        order = jnp.argsort(~hit, axis=1, stable=True).astype(jnp.int32)
        nhit = jnp.sum(hit, axis=1).astype(jnp.int32)
        nbank = CK_NBANKS * CK_BANK
        if NSUB >= nbank:
            take = order[:, :nbank]
        else:
            take = jnp.concatenate(
                [order, jnp.tile(order[:, :1], (1, nbank - NSUB))], axis=1)
        j = jnp.arange(nbank, dtype=jnp.int32)[None, :]
        sel = jnp.where(j < nhit[:, None], take, take[:, :1])
        g = pair_chunk[:, None] * NSUB + sel           # (NPAIR, 2K) sub rows
        # one gather of 1 KB sub-block rows; triangle ids already ride in
        # record column 15 (_build_records), so no post-gather rewrite
        compact = records.reshape((n_chunks + 1) * NSUB, SUB * 16)[g]
        compact = compact.reshape(pairs.shape[0], nbank * SUB, 16)
        masks = [jnp.where(real, nhit, 0)]
    elif DYNHIT:
        # dynamic hit loop: word 0 = hit count (+ zskip bits above),
        # words 1.. = hit sub indices in DESCENDING q, DPW base-DYN_B
        # digits per word. Descending order is what lets the kernel's
        # accumulate resolve within-pair tid ties with one strict <
        # (record ids are monotone in q for a fixed row; see the knob).
        nhit = jnp.sum(hit, axis=1).astype(jnp.int32)
        order_rev = jnp.argsort(~hit[:, ::-1], axis=1,
                                stable=True).astype(jnp.int32)
        qdesc = (NSUB - 1) - order_rev               # hit qs first, desc
        j = jnp.arange(NSUB, dtype=jnp.int32)[None, :]
        digits = jnp.where(j < nhit[:, None], qdesc, 0)
        masks = [jnp.where(real, nhit, 0)]
        for wd in range(DYN_WORDS):
            seg = digits[:, wd * DPW:(wd + 1) * DPW]
            wgt = DYN_B ** jnp.arange(seg.shape[1], dtype=jnp.int32)
            masks.append(jnp.sum(seg * wgt[None, :], axis=-1))
    else:
        if NQ > 1:
            qrows_px = TILE_H // NQ
            band0 = p_ty * TILE_H                    # (NPAIR, 1) global px y
            qh = [hit & (rows[:, 4] < band0 + (wq + 1) * qrows_px)
                  & (rows[:, 5] > band0 + wq * qrows_px)
                  for wq in range(NQ)]
            bits_all = jnp.stack(qh, axis=-1).reshape(  # sub-major, NQ-minor
                hit.shape[0], NSUB * NQ)
        else:
            bits_all = hit
        masks = []
        for wd in range(MASK_WORDS):                 # 30 hit bits per word
            bits = bits_all[:, wd * 30:(wd + 1) * 30]
            w = (1 << jnp.arange(bits.shape[1], dtype=jnp.int32))
            masks.append(jnp.where(
                real, jnp.sum(bits.astype(jnp.int32) * w[None, :], axis=-1),
                0))

    zparams = jnp.zeros((2,), jnp.float32)
    if need_zskip:
        # conservative per-pair min depth → frame-normalized quantized
        # bound in the last mask word's bits above ZSKIP_SHIFT. Floor
        # quantization, the margin, and the decrement-verify (run in the
        # EXACT f32 arithmetic the kernel dequantizes with) all round
        # DOWN, so base + zq·step never exceeds any pixel's real d.
        ztab = jnp.concatenate([jnp.full((1, NSUB), 2.0, jnp.float32),
                                zmin_sub.astype(jnp.float32)], axis=0)
        zrows = ztab[pair_chunk]                     # (NPAIR, NSUB)
        pair_zmin = jnp.min(jnp.where(hit, zrows, 2.0), axis=-1)
        base = (z_lo - ZSKIP_MARGIN).astype(jnp.float32)
        step = jnp.maximum((z_hi - base) / ZSKIP_SCALE,
                           1e-30).astype(jnp.float32)
        target = pair_zmin - ZSKIP_MARGIN
        zq = jnp.clip(jnp.floor((target - base) / step), 0.0,
                      ZSKIP_SCALE).astype(jnp.int32)
        for _ in range(2):
            recon = base + zq.astype(jnp.float32) * step
            zq = jnp.maximum(jnp.where(recon > target, zq - 1, zq), 0)
        has_hit = jnp.any(hit, axis=-1) & real
        # the bound rides the nhit word under DYNHIT/CKERN, else the last
        # bit-mask word's spare high bits
        zt = 0 if DYNHIT else -1
        masks[zt] = masks[zt] + (jnp.where(has_hit, zq, 0)
                                 * (1 << ZSKIP_SHIFT))
        zparams = jnp.stack([base, step])

    if RECPAD:
        # pre-pad to the VMEM lane width so the per-pair block DMA is a
        # contiguous full-bandwidth copy (see the RECPAD knob note).
        # Applied AFTER the CKERN compact gather (which indexes the
        # compact row layout); kernel column reads are unchanged.
        records = jnp.pad(records, ((0, 0), (0, 128 - records.shape[1])))
    if RECT:
        # transposed DENSE layout: (16, N) — each pair's (16, CHUNK)
        # block is sublane/lane dense, so the DMA moves contiguous bytes;
        # the kernel transposes back once per pair (see the RECT note).
        # Applied AFTER the CKERN compact gather.
        records = records.T

    return PallasBins(records=records, pair_tile=pair_tile,
                      pair_chunk=pair_chunk, pair_mask=tuple(masks),
                      zparams=zparams, n_real=n_real,
                      n_pairs=int(pairs.shape[0]),
                      aux=jnp.stack([n_truncated, n_big_dropped]),
                      compact=compact)


def _visibility_kernel(band_ref, zp_ref, pair_tile_ref, pair_chunk_ref,
                       *refs, ntx: int, depth_only: bool = False,
                       fused_cb=None):
    """Layouts chosen for Mosaic: triangles on sublanes (C,1), pixels on
    lanes (1,npx); outputs are flat (1,1,npx) tile rows — no in-kernel
    reshapes or transposes.

    band_ref[0] shifts pixel coordinates by whole tiles: band b of a
    multi-chip framebuffer (parallel/framebuffer.py) evaluates the SAME
    global-pixel arithmetic as a single-chip render of the full frame, so
    band seams are bit-exact. (It is a scalar-prefetch input because under
    shard_map the offset is a traced per-device value, not a constant.)
    zp_ref carries the hierarchical-Z bound dequantization [base, step].

    Each pair evaluates its chunk in NSUB SUB-triangle sub-blocks, each
    gated PER TILE QUARTER (NQ static 8-row lane slices) by the pair's
    precomputed hit mask (build_bins tests each sub-block's bbox against
    this tile's quarters exactly; 30 mask bits per SMEM word, MASK_WORDS
    words) — Morton order makes sub-blocks spatially compact, so a hit
    sub-block's bbox covers only ~8% of its 32×32 tile on the flagship
    scene (tools_dev/stats_visibility.py): quarter gating cuts the swept
    pixels ~2.4× on top of the sub-block mask's triangle pruning.

    The merge is ORDER-INDEPENDENT lexicographic (min depth, max triangle
    id on ties) — exactly the reference pipeline's LESS_OR_EQUAL
    later-draw-wins state (Pipeline.cpp:549-725) for any processing order,
    which frees the binner to order a tile's pairs near-to-far (ZORDER)
    so the hierarchical-Z skip can fire on occluded pairs."""
    # refs = MASK_WORDS mask words (scalar-prefetch), records, depth[, tri]
    # (+ the (SUB, npx) run_d[/run_t] VMEM scratch when ACC). depth_only
    # (static, the shadow-map light pass): no tri output, no tid
    # accumulation — the merge degenerates to a plain min, which is
    # bit-identical to the full kernel's depth plane (ties share a depth).
    mask_refs = refs[:MASK_WORDS]
    tri_out = run_d_ref = run_t_ref = None
    if depth_only:
        if ACC:
            rec_ref, depth_out, run_d_ref = refs[MASK_WORDS:]
        else:
            rec_ref, depth_out = refs[MASK_WORDS:]
    elif ACC:
        rec_ref, depth_out, tri_out, run_d_ref, run_t_ref = refs[MASK_WORDS:]
    else:
        rec_ref, depth_out, tri_out = refs[MASK_WORDS:]
    i = pl.program_id(0)
    tile = pair_tile_ref[i]
    prev = pair_tile_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, tile != prev)
    cid = pair_chunk_ref[i]
    mask_words = [m[i] for m in mask_refs]
    ty = tile // ntx + band_ref[0]
    tx = jax.lax.rem(tile, ntx)

    npx = TILE_H * TILE_W
    qpx = npx // NQ

    @pl.when(first)
    def _():
        depth_out[0] = jnp.full((1, npx), 1.0, jnp.float32)
        if not depth_only:
            tri_out[0] = jnp.full((1, npx), -1, jnp.int32)

    def _reset_scratch():
        # per-pair scratch reset (sentinel never wins the final merge:
        # cmin = 4.0 > any accumulated acc_d ≤ 1.0)
        run_d_ref[...] = jnp.full((SUB, npx), DEPTH_SENTINEL, jnp.float32)
        if not depth_only and TRESET:
            # optional (see the TRESET knob note): stale tids live only
            # under sentinel depth, which the final merge excludes
            run_t_ref[...] = jnp.full((SUB, npx), -1, jnp.int32)

    if ACC and not DYNHIT:
        _reset_scratch()

    if ZSKIP and ZSKIP_PACK:
        # hierarchical-Z: the pair's packed conservative min depth (last
        # mask word, bits above ZSKIP_SHIFT) vs each QUARTER's current max
        # accumulated depth. Reading depth_out AFTER the first-pair reset
        # keeps the test well-defined on a tile's first visit (zmax = 1.0
        # → no skip). Only fires once nearer geometry covered the whole
        # quarter — near-to-far pair order (ZORDER) makes that happen.
        zq = mask_words[0 if DYNHIT else -1] // (1 << ZSKIP_SHIFT)
        zminf = zp_ref[0] + zq.astype(jnp.float32) * zp_ref[1]
        dcur = depth_out[0]
        keep = [zminf <= jnp.max(dcur[:, w * qpx:(w + 1) * qpx])
                for w in range(NQ)]
    else:
        keep = None

    if DYNHIT:
        # ONE dynamic fori_loop over the pair's HIT sub-blocks (indices
        # packed descending-q in mask words 1.., see build_bins) — no
        # untaken @pl.when checks (~40-65 ns each, ~2/3 of sub-blocks on
        # the flagship miss), and the descending order turns the 6-op
        # lexicographic accumulate into 3 ops: record ids are monotone in
        # q for a fixed row, so a strict < keeps the earlier (= higher
        # tid) winner on exact depth ties — identical semantics.
        nhit = jax.lax.rem(mask_words[0], 1 << ZSKIP_SHIFT)
        if keep is not None:
            nhit = jnp.where(keep[0], nhit, 0)
        # hierarchical-Z-skipped (and hitless) pairs skip the scratch
        # reset AND the final reduce+merge below — the record DMA is the
        # only cost they still pay
        work = nhit > 0

        @pl.when(work)
        def _():
            _reset_scratch()

        r = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
        pxf = (tx * TILE_W
               + jax.lax.rem(r, TILE_W)).astype(jnp.float32) + 0.5
        pyf = (ty * TILE_H + r // TILE_W).astype(jnp.float32) + 0.5

        def dyn_body(k, ws):
            q = jax.lax.rem(ws[0], DYN_B)
            rec = rec_ref[pl.ds(q * SUB, SUB), :]

            def col(j):
                return rec[:, j:j + 1]                 # (SUB, 1)

            e0 = col(0) * pxf + col(1) * pyf + col(2)  # (SUB, npx)
            e1 = col(3) * pxf + col(4) * pyf + col(5)
            e2 = col(6) * pxf + col(7) * pyf + col(8)
            # numerics pinned to the oracle — see the static loop's note
            zi = (e0 * col(9) + e1 * col(10)) + e2 * col(11)
            wi = (e0 * col(12) + e1 * col(13)) + e2 * col(14)
            mnn = jnp.minimum(jnp.minimum(e0, e1), jnp.minimum(e2, zi))
            cover = (mnn >= 0.0) & (zi <= wi) & (wi > 1e-12)
            d = zi * pl.reciprocal(jnp.where(cover, wi, 1.0), approx=False)
            dm = jnp.where(cover, d, DEPTH_SENTINEL)
            rd = run_d_ref[...]
            if depth_only:
                run_d_ref[...] = jnp.minimum(rd, dm)
            else:
                tid = col(15).astype(jnp.int32)
                rt = run_t_ref[...]
                btr = dm < rd                          # strict: desc q
                run_d_ref[...] = jnp.where(btr, dm, rd)
                run_t_ref[...] = jnp.where(
                    btr, jnp.broadcast_to(tid, dm.shape), rt)
            # advance the digit stream: shift the current word, rotate to
            # the next word every DPW digits
            adv = (ws[0] // DYN_B,) + ws[1:]
            rot = ws[1:] + (jnp.zeros((), jnp.int32),)
            last = jax.lax.rem(k, DPW) == (DPW - 1)
            return tuple(jnp.where(last, ro, ad)
                         for ro, ad in zip(rot, adv))

        jax.lax.fori_loop(
            0, nhit, dyn_body,
            tuple(mask_words[1 + j] for j in range(DYN_WORDS)))
    if RECT:
        # one relayout per pair restores triangles-on-sublanes from the
        # DMA-dense (16, CHUNK) transposed block
        rec_all = jnp.transpose(rec_ref[...])          # (CHUNK, 16)
    for q in range(NSUB if not DYNHIT else 0):
        for w in range(NQ):
            # mask bit via // and % — bit ops are avoided in Mosaic scalars
            b = q * NQ + w
            hit = jax.lax.rem(mask_words[b // 30] // (1 << (b % 30)), 2) == 1
            if keep is not None:
                hit = jnp.logical_and(hit, keep[w])

            @pl.when(hit)
            def _(q=q, w=w):
                rec = (rec_all[q * SUB:(q + 1) * SUB, :] if RECT
                       else rec_ref[q * SUB:(q + 1) * SUB, :])

                def col(j):
                    return rec[:, j:j + 1]             # (SUB, 1)

                r = jax.lax.broadcasted_iota(
                    jnp.int32, (1, qpx), 1) + w * qpx
                pxf = (tx * TILE_W
                       + jax.lax.rem(r, TILE_W)).astype(jnp.float32) + 0.5
                pyf = (ty * TILE_H + r // TILE_W).astype(jnp.float32) + 0.5

                e0 = col(0) * pxf + col(1) * pyf + col(2)   # (SUB, qpx)
                e1 = col(3) * pxf + col(4) * pyf + col(5)
                e2 = col(6) * pxf + col(7) * pyf + col(8)
                # depth stays the per-pixel RATIONAL zi/wi — the affine
                # Σ e_k·(z_k/det) form is 9 ops cheaper but not
                # self-normalizing and fails catastrophically on subpixel
                # triangles at ZO far depths (see TriangleSetup numerics
                # note; r3hw10 lost 27% of covered pixels to d>1).
                # Association must match raster_ref.visibility_ref exactly.
                zi = (e0 * col(9) + e1 * col(10)) + e2 * col(11)
                wi = (e0 * col(12) + e1 * col(13)) + e2 * col(14)
                # depth range test in cross-multiplied form (no divide):
                # with wi>0, 0 ≤ zi/wi ≤ 1 ⇔ zi ≥ 0 and zi ≤ wi
                # min-tree: all-nonneg of {e0,e1,e2,zi} as ONE
                # compare — exact (minimum propagates NaN; -0.0 >= 0
                # matches the individual compares). zi <= wi stays a
                # direct compare: a (wi-zi >= 0) rewrite would flip on
                # TPU's flush-to-zero when the difference is subnormal.
                mnn = jnp.minimum(jnp.minimum(e0, e1),
                                  jnp.minimum(e2, zi))
                cover = (mnn >= 0.0) & (zi <= wi) & (wi > 1e-12)

                def merge():
                    d = zi * pl.reciprocal(jnp.where(cover, wi, 1.0),
                                           approx=False)
                    dm = jnp.where(cover, d, DEPTH_SENTINEL)
                    sl = slice(w * qpx, (w + 1) * qpx)

                    if depth_only:
                        # min-only merge (no winner id): bit-identical
                        # depth to the lexicographic merge
                        if ACC:
                            run_d_ref[:, sl] = jnp.minimum(
                                run_d_ref[:, sl], dm)
                            return
                        cmin = jnp.min(dm, axis=0, keepdims=True)
                        depth_out[0, :, sl] = jnp.minimum(
                            depth_out[0, :, sl], cmin)
                        return

                    # global ids ride record col 15 (f32-exact < 2^24)
                    tid = col(15).astype(jnp.int32)

                    if ACC:
                        # 6-op elementwise lexicographic accumulate into
                        # the pair's (SUB, npx) scratch — the reductions
                        # + output merge happen ONCE per pair below
                        # (CKERN-v2 transplant; see the ACC knob note)
                        rd = run_d_ref[:, sl]
                        rt = run_t_ref[:, sl]
                        tb = jnp.broadcast_to(tid, dm.shape)
                        btr = (dm < rd) | ((dm == rd) & (tb > rt))
                        run_d_ref[:, sl] = jnp.where(btr, dm, rd)
                        run_t_ref[:, sl] = jnp.where(btr, tb, rt)
                        return

                    cmin = jnp.min(dm, axis=0, keepdims=True)  # (1, qpx)
                    win = jnp.max(jnp.where(dm <= cmin, tid, -1), axis=0,
                                  keepdims=True)

                    acc_d = depth_out[0, :, sl]
                    acc_t = tri_out[0, :, sl]
                    # lexicographic (depth, tid) — identical final result
                    # to draw-order processing, in ANY pair/quarter order
                    better = (win >= 0) & ((cmin < acc_d)
                                           | ((cmin == acc_d)
                                              & (win > acc_t)))
                    depth_out[0, :, sl] = jnp.where(better, cmin, acc_d)
                    tri_out[0, :, sl] = jnp.where(better, win, acc_t)

                if COVER_GATE:
                    # bbox-hit sweeps that cover NO pixel (the conservative
                    # bbox test fires but every edge test misses) skip the
                    # reciprocal + both reductions + the accumulator RMW —
                    # only the edge/z/w setup above was spent
                    pl.when(jnp.any(cover))(merge)
                else:
                    merge()

    if ACC:
        # one reduce + output merge per PAIR (was per sweep): cross-sub
        # min depth, max tid on ties — the same order-independent
        # lexicographic semantics, so the result is bit-identical to the
        # per-sweep merge in any pair/sweep order. Sweeps that never ran
        # (mask miss / hierarchical-Z skip) left sentinel rows, which can
        # never beat acc_d ≤ 1.0. DYNHIT: worked-free pairs (nhit == 0,
        # z-skipped) skip the whole reduce+merge — their scratch was
        # never reset and must not be read.
        def _final_merge():
            rd = run_d_ref[...]
            cmin = jnp.min(rd, axis=0, keepdims=True)      # (1, npx)
            if depth_only:
                depth_out[0] = jnp.minimum(depth_out[0], cmin)
            else:
                rt = run_t_ref[...]
                win = jnp.max(jnp.where(rd <= cmin, rt, -1), axis=0,
                              keepdims=True)
                acc_d = depth_out[0]
                acc_t = tri_out[0]
                better = (win >= 0) & ((cmin < acc_d)
                                       | ((cmin == acc_d) & (win > acc_t)))
                depth_out[0] = jnp.where(better, cmin, acc_d)
                tri_out[0] = jnp.where(better, win, acc_t)
                if fused_cb is not None:
                    # fused resolve (ops/resolve_pallas._fused_kernel):
                    # the pixels where this pair's local winner just took
                    # the accumulator are exactly where its interpolants
                    # belong — attrs merge in lock-step with (depth, tid),
                    # so the final attribute image is the final winner's
                    # in any pair order
                    fused_cb(win, better)

        if DYNHIT:
            pl.when(work)(_final_merge)
        else:
            _final_merge()


def _visibility_kernel_ck(band_ref, zp_ref, pair_tile_ref, pair_chunk_ref,
                          nhit_ref, comp_ref, depth_out, tri_out, *,
                          ntx: int):
    """Compact-bank visibility kernel (CKERN): the binner already gathered
    this pair's hit sub-blocks contiguous, so the body is ONE dense
    (CK_BANK·SUB, npx) evaluation (+ a second bank behind a single
    nhit>CK_BANK branch) — no per-sub-block branch checks (~40 ns each)
    and no per-sub region overhead (~150 ns each), which kbench measured
    as 2/3 of the masked kernel's time (r4kb1.log). Triangle ids ride in
    record column 15; duplicate padding rows merge idempotently."""
    i = pl.program_id(0)
    tile = pair_tile_ref[i]
    prev = pair_tile_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, tile != prev)
    word = nhit_ref[i]
    nhit = jax.lax.rem(word, 1 << ZSKIP_SHIFT)
    ty = tile // ntx + band_ref[0]
    tx = jax.lax.rem(tile, ntx)
    npx = TILE_H * TILE_W
    rows_bank = CK_BANK * SUB

    @pl.when(first)
    def _():
        depth_out[0] = jnp.full((1, npx), 1.0, jnp.float32)
        tri_out[0] = jnp.full((1, npx), -1, jnp.int32)

    r = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    pxf = (tx * TILE_W + jax.lax.rem(r, TILE_W)).astype(jnp.float32) + 0.5
    pyf = (ty * TILE_H + r // TILE_W).astype(jnp.float32) + 0.5

    if ZSKIP and ZSKIP_PACK:
        zq = word // (1 << ZSKIP_SHIFT)
        zminf = zp_ref[0] + zq.astype(jnp.float32) * zp_ref[1]
        keep = zminf <= jnp.max(depth_out[0])
    else:
        keep = None

    def bank(b):
        # straight-line loop over 16-row slices — (SUB, npx) shapes keep
        # Mosaic in vregs (a single dense (CK_BANK·SUB, npx) region
        # spilled its ~0.5 MB intermediates to VMEM and measured 2×
        # SLOWER end-to-end, r4hw2 §2) — with a SHARED lexicographic
        # (depth, tid) accumulator: the per-slice merge+reductions were
        # ~163 of each masked sweep's 260 ns (kbench quarters algebra);
        # here each slice pays only the 6-op elementwise accumulate and
        # the bank reduces + merges ONCE.
        run_d = run_t = None
        for k in range(CK_BANK):
            lo = (b * CK_BANK + k) * SUB
            rec = comp_ref[0, lo:lo + SUB, :]

            def col(j, rec=rec):
                return rec[:, j:j + 1]             # (SUB, 1)

            e0 = col(0) * pxf + col(1) * pyf + col(2)   # (SUB, npx)
            e1 = col(3) * pxf + col(4) * pyf + col(5)
            e2 = col(6) * pxf + col(7) * pyf + col(8)
            # RATIONAL zi/wi, association pinned to the oracle — see the
            # masked kernel's numerics note
            zi = (e0 * col(9) + e1 * col(10)) + e2 * col(11)
            wi = (e0 * col(12) + e1 * col(13)) + e2 * col(14)
            # min-tree all-nonneg — see the masked kernel's note
            mnn = jnp.minimum(jnp.minimum(e0, e1), jnp.minimum(e2, zi))
            cover = (mnn >= 0.0) & (zi <= wi) & (wi > 1e-12)
            d = zi * pl.reciprocal(jnp.where(cover, wi, 1.0), approx=False)
            dm = jnp.where(cover, d, DEPTH_SENTINEL)
            tid = col(15).astype(jnp.int32)        # exact: ids < 2^24
            if run_d is None:
                run_d = dm
                run_t = jnp.broadcast_to(tid, dm.shape)
            else:
                btr = (dm < run_d) | ((dm == run_d) & (tid > run_t))
                run_d = jnp.where(btr, dm, run_d)
                run_t = jnp.where(btr, tid, run_t)

        cmin = jnp.min(run_d, axis=0, keepdims=True)   # (1, npx)
        win = jnp.max(jnp.where(run_d <= cmin, run_t, -1), axis=0,
                      keepdims=True)

        acc_d = depth_out[0]
        acc_t = tri_out[0]
        better = (win >= 0) & ((cmin < acc_d)
                               | ((cmin == acc_d) & (win > acc_t)))
        depth_out[0] = jnp.where(better, cmin, acc_d)
        tri_out[0] = jnp.where(better, win, acc_t)

    if keep is None:
        bank(0)
        for b in range(1, CK_NBANKS):
            pl.when(nhit > b * CK_BANK)(functools.partial(bank, b))
    else:
        pl.when(keep)(lambda: bank(0))
        for b in range(1, CK_NBANKS):
            pl.when(jnp.logical_and(keep, nhit > b * CK_BANK))(
                functools.partial(bank, b))


def untile_frame(flat: Array, ntx: int, nty: int) -> Array:
    """(n_tiles, 1, TH·TW) or (n_tiles, CH, TH·TW) → (H, W[, CH])."""
    if flat.shape[1] == 1:
        return (flat.reshape(nty, ntx, TILE_H, TILE_W)
                .transpose(0, 2, 1, 3).reshape(nty * TILE_H, ntx * TILE_W))
    ch = flat.shape[1]
    return (flat.reshape(nty, ntx, ch, TILE_H, TILE_W)
            .transpose(0, 3, 1, 4, 2)
            .reshape(nty * TILE_H, ntx * TILE_W, ch))


def visibility_pallas_tiled(setup: TriangleSetup, width: int, height: int,
                            interpret: bool = False, tile_y_offset=0,
                            setup_cols=None, depth_only: bool = False):
    """Tile-binned Pallas visibility, keeping the kernel-native tiled
    layout: returns (bins, depth_tiles, tri_tiles, written) with
    depth/tri (n_tiles, 1, TH·TW) and written (n_tiles,) bool — the resolve
    pass (ops/resolve_pallas.py) consumes tri_tiles directly.

    `interpret=True` runs the kernel with the Pallas interpreter (pure XLA)
    so the production binning + kernel logic is testable on CPU.
    `tile_y_offset` (int or traced i32 scalar) renders a horizontal band
    whose top sits tile_y_offset·TILE_H global pixels down: setup.bbox must
    already be in band-local coordinates (ops.vertex.band_slice_setup),
    while edge/z/w stay global — the kernel adds the offset back so its
    arithmetic is bit-identical to the full-frame render."""
    ntx = -(-width // TILE_W)
    nty = -(-height // TILE_H)
    wpad, hpad = ntx * TILE_W, nty * TILE_H

    bins = build_bins(setup, wpad, hpad, setup_cols=setup_cols)

    n_tiles = ntx * nty
    npx = TILE_H * TILE_W
    band = jnp.asarray(tile_y_offset, jnp.int32).reshape(1)
    depth_only = depth_only and not CKERN  # CKERN has no depth-only body
    if CKERN:
        kernel = functools.partial(_visibility_kernel_ck, ntx=ntx)
        rec_in = bins.compact
        rec_spec = pl.BlockSpec((1, CK_NBANKS * CK_BANK * SUB, 16),
                                lambda i, band, zp, tiles, chunks, *masks:
                                (i, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_visibility_kernel, ntx=ntx,
                                   depth_only=depth_only)
        rec_in = bins.records
        if RECT:
            rec_spec = pl.BlockSpec((16, CHUNK),
                                    lambda i, band, zp, tiles, chunks,
                                    *masks: (0, chunks[i]),
                                    memory_space=pltpu.VMEM)
        else:
            rec_spec = pl.BlockSpec((CHUNK, bins.records.shape[1]),
                                    lambda i, band, zp, tiles, chunks,
                                    *masks: (chunks[i], 0),
                                    memory_space=pltpu.VMEM)
    # shared-accumulator scratch (ACC): run_d/run_t persist across the
    # masked kernel's @pl.when sweep regions within a pair
    if ACC and not CKERN:
        scratch = [pltpu.VMEM((SUB, npx), jnp.float32)]
        if not depth_only:
            scratch.append(pltpu.VMEM((SUB, npx), jnp.int32))
    else:
        scratch = []
    out_spec = pl.BlockSpec((1, 1, npx),
                            lambda i, band, zp, tiles, chunks, *masks:
                            (tiles[i], 0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [out_spec] if depth_only else [out_spec, out_spec]
    out_shape = [jax.ShapeDtypeStruct((n_tiles, 1, npx), jnp.float32)]
    if not depth_only:
        out_shape.append(jax.ShapeDtypeStruct((n_tiles, 1, npx), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4 + MASK_WORDS,
        # dynamic: only real pairs execute (≥1 — pair 0 degenerates to the
        # empty sentinel chunk when the frame has no pairs at all)
        grid=(jnp.maximum(bins.n_real, 1),),
        in_specs=[rec_spec],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(band, bins.zparams, bins.pair_tile, bins.pair_chunk, *bins.pair_mask,
      rec_in)
    depth = out[0]
    tri = None if depth_only else out[1]

    # tiles no executed pair touched keep uninitialized VMEM garbage —
    # mask them to background from the pair list itself (one tiny scatter)
    touched_idx = jnp.where(
        jnp.arange(bins.n_pairs, dtype=jnp.int32) < bins.n_real,
        bins.pair_tile, n_tiles)
    written = jnp.zeros((n_tiles + 1,), jnp.bool_).at[touched_idx].set(
        True, mode="drop")[:n_tiles]
    depth = jnp.where(written[:, None, None], depth, 1.0)
    if tri is not None:
        tri = jnp.where(written[:, None, None], tri, -1)
    return bins, depth, tri, written


def visibility_pallas(setup: TriangleSetup, width: int, height: int,
                      interpret: bool = False, tile_y_offset=0) -> GBuffer:
    """Tile-binned Pallas visibility: per-pixel winner triangle + depth."""
    ntx = -(-width // TILE_W)
    nty = -(-height // TILE_H)
    bins, depth, tri, _ = visibility_pallas_tiled(setup, width, height,
                                                  interpret=interpret,
                                                  tile_y_offset=tile_y_offset)
    return GBuffer(tri_id=untile_frame(tri, ntx, nty)[:height, :width],
                   depth=untile_frame(depth, ntx, nty)[:height, :width],
                   aux=bins.aux)
