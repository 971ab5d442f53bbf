"""In-kernel attribute resolve: winner ids → dense per-pixel shading inputs.

Round-1's deferred pass fetched TWO packed plane-table rows per pixel; at
1M triangles those gathers hit a (T,16) table far outside any cache tier
and dominated the frame (PERF.md: deferred grows 76→140 ms with triangle
count at FIXED pixel count). This pass removes per-pixel table gathers
entirely: a second Pallas sweep over the SAME tile/chunk pair list the
visibility kernel used (ops/raster_pallas.py) selects each pixel's winner
plane row with a one-hot MXU matmul against the chunk's (C, RW) record
block — VMEM-streamed, never gathered — then evaluates every interpolant
in-kernel on the VPU:

  * normal / UV as rational screen functions (gA·p)/(g1·p)
  * the trilinear mip level from the analytic UV screen derivatives
    (texture footprint constants ride in the records: zero size lookups)
  * material constants (color factor, metallic/roughness/ambient, slot);
    vertex colors fold straight into the color factor

The output is a dense (H, W, CH) attribute image — the only per-pixel
random access left in the frame is actual texel fetches. Shading math and
semantics are unchanged (reference: Default.frag:69-178); this is the
TPU-native split of the reference's single fragment shader into
"interpolate in the rasterizer, sample+light in a fused XLA pass".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trident_tpu.ops import planes as planes_mod
from trident_tpu.ops import raster_pallas as _rp
from trident_tpu.ops.raster_pallas import PallasBins, untile_frame

Array = jax.Array

import os as _os

# TRIDENT_RESOLVE_HALF=1: run the winner select as two gated half-chunk
# (K=_rp.CHUNK/2) contractions instead of one K=_rp.CHUNK — a dev-sweep knob (a
# K=128 one-hot dot costs half the K=256 one when winners sit in one half)
RESOLVE_HALF = _os.environ.get("TRIDENT_RESOLVE_HALF", "0") == "1"

if RESOLVE_HALF and _rp.CHUNK % 2 != 0:
    # hc = _rp.CHUNK//2 half-blocks would drop the last record row: a winner
    # with rel == _rp.CHUNK-1 matches neither half and keeps its reset zeros
    raise ValueError(
        f"TRIDENT_RESOLVE_HALF=1 requires an even chunk; TRIDENT_CHUNK="
        f"{_rp.CHUNK} leaves the odd last record row outside both halves")

# TRIDENT_RESOLVE_COMPACT=1 enables the owning-pair compaction (A/B knob):
# the resolve grid then runs only over pairs whose chunk actually WON at
# least one pixel of its tile — loser pairs (the majority: every tile's
# pairs lose to its few front chunks) each still pay a (C, RW) record
# DMA and a grid step despite the in-kernel winner-skip. One fused XLA
# gather+any over the winner map finds the owners and a stable sort keeps
# them tile-major (draw order within a tile is irrelevant post-visibility;
# only 'first pair of tile' reset semantics matter). Default OFF: at 32x32
# tiles the winner-map gather + sort costs more than the skipped grid
# steps save (1M/1080p v5e sweep: 19.71 FPS off vs 18.87 on; also faster
# off at 64-wide tiles, 16.96 vs 16.5).
RESOLVE_COMPACT = _os.environ.get("TRIDENT_RESOLVE_COMPACT", "0") == "1"

# TRIDENT_RESOLVE_SKIP=1: the loser fast-path (PERF.md roadmap item 9).
# Same owner detection as COMPACT (the gather fuses into a compare+any;
# no (NPAIR, npx) intermediate) but WITHOUT the argsort that made
# compaction a loss: the grid keeps one step per pair, and every loser
# step's record/tri/out BLOCK INDICES are aliased to the previous owning
# pair's — Pallas skips re-fetch when consecutive steps use the same
# block index, so loser steps cost bare grid-step overhead instead of a
# (C, RW) record DMA + winner-skip reduction. Tile-reset semantics move
# from "first pair of tile" to "first OWNING pair of tile" (won == 2),
# carried in by a fourth scalar-prefetch array.
RESOLVE_SKIP = _os.environ.get("TRIDENT_RESOLVE_SKIP", "0") == "1"

# Winner-select contract precision. Mosaic lowers Precision.DEFAULT to its
# own default contract precision and only HIGHEST maps to an explicit
# #tpu.contract_precision<fp32> (jax/_src/pallas/mosaic/lowering.py) — if
# the default is a single bf16 pass, the f32 plane records would quantize
# to 8 mantissa bits INSIDE the select (UV/normal/denominator wobble the
# CPU interpreter can never see: it computes plain f32). Three modes
# (TRIDENT_RESOLVE_PREC) for the hardware A/B:
#   split (DEFAULT) — records pre-split XLA-side into 3 bf16 planes
#     (hi = bf16(r), mid = bf16(r−hi), lo = bf16(r−hi−mid); 3×8
#     significand bits cover f32's 24, so hi+mid+lo == r exactly and the
#     f32 accumulator reassembles it; 3 single-pass bf16 dots instead of
#     ~6). EXACT on hardware since the optimization_barrier fix below:
#     without the barriers, XLA:TPU's bf16 precision propagation demoted
#     the f32 subtraction chain (its only consumers are bf16 kernel
#     operands) and split silently collapsed to hi-only == raw bf16
#     quantization — found by r3hw9's layout×precision diag, proven
#     fixed by r3hw11's (split ≡ fp32 bit-exact on chip, both layouts).
#     Measured 22.28 vs 21.88 FPS fp32 at 1M/1080p (r3hw11, honest);
#   fp32 — pin contract_precision<fp32>: exact, worst case ~6 bf16 MXU
#     passes;
#   bf16 — raw DEFAULT pass on the f32 records: cheapest (22.62 FPS with
#     TR), records round to 8 mantissa bits — golden/oracle gates forbid
#     it as a default.
_PREC_MODE = _os.environ.get("TRIDENT_RESOLVE_PREC", "split")
if _PREC_MODE not in ("fp32", "split", "bf16"):
    raise ValueError(f"TRIDENT_RESOLVE_PREC={_PREC_MODE!r}: "
                     "expected fp32 | split | bf16")
_PREC = jax.lax.Precision.HIGHEST if _PREC_MODE == "fp32" else None


def _oh_dtype():
    """One-hot element type: bf16 in split mode (0/1 are bf16-exact and
    building it bf16 at the compare saves a (K, npx) cast per step)."""
    return jnp.bfloat16 if _PREC_MODE == "split" else jnp.float32


def _winner_select(rec_ref, oh, tr, rows=slice(None)):
    """One-hot contraction of the record block ref's `rows` triangle slice
    (static, RESOLVE_HALF) against the (K, npx) one-hot — the precision
    strategy lives only here. Lane-major layout (tr=False): rec_ref is
    the (1, C, RW) block ref ((1, 3, C, RW) bf16 planes in split mode).
    Transposed layout (tr=True, planes.RESOLVE_TR): (RW, C) with
    triangles on LANES ((3, RW, C) in split mode) — the contraction just
    moves to the other operand side and RESOLVE_HALF's triangle slice
    becomes a (_rp.CHUNK/2)-aligned lane slice."""
    dims = ((((1,) if tr else (0,)), (0,)), ((), ()))

    def blk(k=None):
        if tr:
            r = rec_ref[...] if k is None else rec_ref[k]
            return r[:, rows]
        return rec_ref[0, rows] if k is None else rec_ref[0, k, rows]

    if _PREC_MODE != "split":
        return jax.lax.dot_general(blk(), oh, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=_PREC)

    def part(k):
        return jax.lax.dot_general(blk(k), oh, dims,
                                   preferred_element_type=jnp.float32)

    # sum order matters for exactness: hi+mid is ≤17 significand bits
    # (exact), and the true total equals the representable original r
    return (part(0) + part(1)) + part(2)


def _cumsum_i32(x: Array, rows: int = 256) -> Array:
    """Inclusive 1-D running sum with the same 2-D restructuring as
    _cummax_i32 (1-D scans over ~65k elements lower pathologically)."""
    n = x.shape[0]
    if n <= rows:
        return jnp.cumsum(x)
    cols = -(-n // rows)
    xp = jnp.pad(x, (0, rows * cols - n)).reshape(rows, cols)
    within = jnp.cumsum(xp, axis=1)
    prev = jnp.cumsum(within[:, -1])
    prev = jnp.concatenate([jnp.zeros((1,), x.dtype), prev[:-1]])
    return (within + prev[:, None]).reshape(-1)[:n]


def _cummax_i32(x: Array, rows: int = 256) -> Array:
    """Inclusive 1-D running max, reshaped 2-D first: plain 1-D cumulative
    scans over ~65k elements lower pathologically on TPU (PERF.md: a 650k
    jnp.cumsum took the binner 9.8 → 38 ms), so scan short rows and
    combine with an exclusive scan of the per-row maxima."""
    n = x.shape[0]
    if n <= rows:
        return jax.lax.cummax(x, axis=0)
    cols = -(-n // rows)
    xp = jnp.pad(x, (0, rows * cols - n), constant_values=jnp.iinfo(x.dtype).min)
    xp = xp.reshape(rows, cols)
    within = jax.lax.cummax(xp, axis=1)
    prev_rows = jax.lax.cummax(within[:, -1], axis=0)
    prev_rows = jnp.concatenate(
        [jnp.full((1,), jnp.iinfo(x.dtype).min, x.dtype), prev_rows[:-1]])
    return jnp.maximum(within, prev_rows[:, None]).reshape(-1)[:n]

# attribute-image channel layout (CH = 16): everything deferred shading
# needs per pixel except the texels themselves
CH_NX, CH_NY, CH_NZ = 0, 1, 2    # world normal (unnormalized)
CH_U, CH_V = 3, 4                # atlas-transformed UV
CH_MIP = 5                       # trilinear mip level
CH_CF = 6                        # color factor rgba → 6..9
CH_MET, CH_ROUGH, CH_AMB = 10, 11, 12
CH_BASE8 = 13                    # texture flat base >> 8 (f32-exact)
CH_TSX, CH_TSY = 14, 15          # mip-0 texture (w,h); with the base these
                                 # make the sampler's level geometry fully
                                 # gather-free (pow2 edge = bit-smear(max))
CHANNELS = 16


def _eval_interpolants(sel, pxf, pyf, vertex_colors: bool):
    """Every deferred-shading interpolant from the selected (RW, npx)
    record rows at pixel centers (pxf, pyf) → (CHANNELS, npx) f32.
    Shared by the standalone resolve kernel and the fused
    visibility+resolve kernel — identical math means bit-identical
    attribute images (tested)."""

    def row(j):
        return sel[j:j + 1]                    # (1, npx)

    def plane(j):                              # g·(px,py,1)
        return row(j) * pxf + row(j + 1) * pyf + row(j + 2)

    P = planes_mod
    denom = plane(P.RR_G1)
    inv = pl.reciprocal(
        jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom), approx=False)

    nx = plane(P.RR_NX) * inv
    ny = plane(P.RR_NY) * inv
    nz = plane(P.RR_NZ) * inv
    u_num = plane(P.RR_U)
    v_num = plane(P.RR_V)
    u = u_num * inv
    v = v_num * inv

    # analytic UV screen derivatives → mip (matches ops/deferred.py)
    g1x, g1y = row(P.RR_G1), row(P.RR_G1 + 1)
    du_dx = (row(P.RR_U) - u * g1x) * inv
    du_dy = (row(P.RR_U + 1) - u * g1y) * inv
    dv_dx = (row(P.RR_V) - v * g1x) * inv
    dv_dy = (row(P.RR_V + 1) - v * g1y) * inv
    tsx, tsy = row(P.RR_TSX), row(P.RR_TSY)
    rho = jnp.maximum(
        jnp.square(du_dx * tsx) + jnp.square(dv_dx * tsy),
        jnp.square(du_dy * tsx) + jnp.square(dv_dy * tsy))
    mip = 0.5 * jnp.log2(jnp.maximum(rho, 1e-12))

    cf_r, cf_g, cf_b = row(P.RR_CF), row(P.RR_CF + 1), row(P.RR_CF + 2)
    if vertex_colors:
        cf_r = cf_r * plane(P.RR_COL) * inv
        cf_g = cf_g * plane(P.RR_COL + 3) * inv
        cf_b = cf_b * plane(P.RR_COL + 6) * inv

    return jnp.concatenate([
        nx, ny, nz, u, v, mip,
        cf_r, cf_g, cf_b, row(P.RR_CF + 3),
        row(P.RR_MET), row(P.RR_ROUGH), row(P.RR_AMB), row(P.RR_BASE8),
        tsx, tsy,
    ], axis=0)                                 # (CHANNELS, npx)


def _prep_records(records: Array):
    """Resolve-record precision prep → (records, tr, rw). Transposed
    records (planes.RESOLVE_TR builders) are 2-D (RW, (NC+1)·C); the
    lane-major legacy layout is (NC+1, C, RW). split mode: exact 3-way
    bf16 decomposition — each subtraction cancels the already-captured
    high bits, so it is exact in f32 and hi+mid+lo reconstructs records
    bit-exactly. Planes stack on a LEADING axis (per-step slicing stays
    off the lane dim). optimization_barrier: with the planes' ONLY
    consumers being bf16 kernel operands, XLA:TPU's bf16 precision
    propagation is free to demote the f32 intermediates (records/r1) to
    bf16 — then r1 = r − r ≡ 0 and the decomposition silently collapses
    to hi-only (the r3hw9 hardware finding). The barriers keep the
    subtraction chain f32-real."""
    tr = records.ndim == 2
    rw = records.shape[0] if tr else records.shape[2]
    if _PREC_MODE == "split":
        hi = records.astype(jnp.bfloat16)
        records, hi = jax.lax.optimization_barrier((records, hi))
        r1 = records - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        r1, mid = jax.lax.optimization_barrier((r1, mid))
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        records = jnp.stack([hi, mid, lo], axis=0 if tr else 1)
        # tr: (3, RW, (NC+1)·C); legacy: (NC+1, 3, C, RW)
    return records, tr, rw


# TRIDENT_FUSE=1: fused visibility+resolve — ONE pair-grid pass streams
# the visibility records AND the resolve records per pair; the attribute
# image merges in lock-step with the (depth, tid) lexicographic merge
# (raster_pallas._visibility_kernel's fused_cb hook). Removes the second
# pass's per-pair floor (grid step + tri-block read + winner reduction)
# if the two operand copies pipeline (kbench `dual` probe). Requires the
# ACC scratch accumulator and the transposed record layout.
FUSE = _os.environ.get("TRIDENT_FUSE", "0") == "1"


def _fused_kernel(band_ref, zp_ref, pair_tile_ref, pair_chunk_ref, *refs,
                  ntx: int, vertex_colors: bool, tr: bool):
    """refs = MASK_WORDS mask words, vis records block, resolve records
    block, depth/tri/attr outputs, run_d/run_t scratch."""
    mw = _rp.MASK_WORDS
    masks = refs[:mw]
    vis_rec, res_rec, depth_out, tri_out, attr_out = refs[mw:mw + 5]
    scratch = refs[mw + 5:]
    i = pl.program_id(0)
    tile = pair_tile_ref[i]
    prev = pair_tile_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, tile != prev)
    cid = pair_chunk_ref[i]
    ty = tile // ntx + band_ref[0]
    tx = jax.lax.rem(tile, ntx)
    npx = _rp.TILE_H * _rp.TILE_W

    @pl.when(first)
    def _():
        attr_out[0] = jnp.zeros((CHANNELS, npx), jnp.float32)

    def cb(win, better):
        # win: this pair's local winner ids (in the chunk's id range
        # wherever >= 0); better: pixels where it just took the
        # accumulator. One one-hot MXU select + interpolant eval, only
        # when the pair won anything (front-to-back ZORDER makes most
        # later pairs skip here, like the standalone resolve's
        # winner-skip).
        @pl.when(jnp.any(better))
        def _():
            rel = win - (cid - 1) * _rp.CHUNK
            oh = jnp.where(
                better,
                (jax.lax.broadcasted_iota(jnp.int32, (_rp.CHUNK, npx), 0)
                 == rel).astype(_oh_dtype()), 0)
            sel = _winner_select(res_rec, oh, tr)
            r = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
            pxf = (tx * _rp.TILE_W
                   + jax.lax.rem(r, _rp.TILE_W)).astype(jnp.float32) + 0.5
            pyf = (ty * _rp.TILE_H + r // _rp.TILE_W).astype(
                jnp.float32) + 0.5
            new = _eval_interpolants(sel, pxf, pyf, vertex_colors)
            attr_out[0] = jnp.where(better, new, attr_out[0])

    _rp._visibility_kernel(band_ref, zp_ref, pair_tile_ref, pair_chunk_ref,
                           *masks, vis_rec, depth_out, tri_out, *scratch,
                           ntx=ntx, fused_cb=cb)


def fused_visibility_resolve_pallas(setup, records: Array, width: int,
                                    height: int, vertex_colors: bool = False,
                                    interpret: bool = False,
                                    tile_y_offset=0, setup_cols=None):
    """One Pallas pass over the pair grid producing visibility AND the
    attribute image: returns (bins, depth_tiles, tri_tiles, attrs_tiles,
    written) — drop-in for visibility_pallas_tiled + resolve_attrs_pallas
    with bit-identical outputs (tested). `records` is the resolve record
    table (planes.build_resolve_records, transposed layout required)."""
    if not (_rp.ACC and not _rp.CKERN and not _rp.RECT):
        raise ValueError("fuse=True requires acc=True, ckern=False, "
                         "rect=False")
    ntx = -(-width // _rp.TILE_W)
    nty = -(-height // _rp.TILE_H)
    wpad, hpad = ntx * _rp.TILE_W, nty * _rp.TILE_H
    bins = _rp.build_bins(setup, wpad, hpad, setup_cols=setup_cols)
    n_tiles = ntx * nty
    npx = _rp.TILE_H * _rp.TILE_W
    band = jnp.asarray(tile_y_offset, jnp.int32).reshape(1)

    records, tr, rw = _prep_records(records)
    if not tr:
        raise ValueError("fuse=True requires resolve_tr=True records")

    kernel = functools.partial(_fused_kernel, ntx=ntx,
                               vertex_colors=vertex_colors, tr=tr)
    vis_spec = pl.BlockSpec((_rp.CHUNK, bins.records.shape[1]),
                            lambda i, band, zp, tiles, chunks, *masks:
                            (chunks[i], 0),
                            memory_space=pltpu.VMEM)
    res_spec = (
        pl.BlockSpec((3, rw, _rp.CHUNK),
                     lambda i, band, zp, tiles, chunks, *masks:
                     (0, 0, chunks[i]),
                     memory_space=pltpu.VMEM)
        if _PREC_MODE == "split" else
        pl.BlockSpec((rw, _rp.CHUNK),
                     lambda i, band, zp, tiles, chunks, *masks:
                     (0, chunks[i]),
                     memory_space=pltpu.VMEM))
    tile_spec = pl.BlockSpec((1, 1, npx),
                             lambda i, band, zp, tiles, chunks, *masks:
                             (tiles[i], 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4 + _rp.MASK_WORDS,
        grid=(jnp.maximum(bins.n_real, 1),),
        in_specs=[vis_spec, res_spec],
        out_specs=[
            tile_spec, tile_spec,
            pl.BlockSpec((1, CHANNELS, npx),
                         lambda i, band, zp, tiles, chunks, *masks:
                         (tiles[i], 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((_rp.SUB, npx), jnp.float32),
                        pltpu.VMEM((_rp.SUB, npx), jnp.int32)],
    )
    depth, tri, attrs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, npx), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, npx), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, CHANNELS, npx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(band, bins.zparams, bins.pair_tile, bins.pair_chunk, *bins.pair_mask,
      bins.records, records)

    # untouched tiles hold uninitialized VMEM garbage (same contract as
    # the split passes): mask from the pair list
    touched_idx = jnp.where(
        jnp.arange(bins.n_pairs, dtype=jnp.int32) < bins.n_real,
        bins.pair_tile, n_tiles)
    written = jnp.zeros((n_tiles + 1,), jnp.bool_).at[touched_idx].set(
        True, mode="drop")[:n_tiles]
    depth = jnp.where(written[:, None, None], depth, 1.0)
    tri = jnp.where(written[:, None, None], tri, -1)
    attrs = jnp.where(written[:, None, None], attrs, 0.0)
    return bins, depth, tri, attrs, written


def _resolve_kernel(band_ref, pair_tile_ref, pair_chunk_ref, won_ref,
                    rec_ref, tri_ref, out_ref, *, ntx: int,
                    vertex_colors: bool, skip: bool, tr: bool):
    i = pl.program_id(0)
    tile = pair_tile_ref[i]
    cid = pair_chunk_ref[i]
    if skip:
        # won_ref[i] ∈ {0 loser, 1 owner, 2 first owner of its tile}: loser
        # steps alias the previous owner's blocks (no DMA happened) and
        # must not touch them — everything below is gated on won > 0.
        won = won_ref[i]
        reset = won == 2
    else:
        prev = pair_tile_ref[jnp.maximum(i - 1, 0)]
        won = None
        reset = jnp.logical_or(i == 0, tile != prev)
    # band_ref[0]: whole-tile y offset for multi-chip banded rendering —
    # global pixel coords keep band arithmetic bit-identical to single-chip
    ty = tile // ntx + band_ref[0]
    tx = jax.lax.rem(tile, ntx)
    npx = _rp.TILE_H * _rp.TILE_W

    @pl.when(reset)
    def _():
        out_ref[0] = jnp.zeros((CHANNELS, npx), jnp.float32)

    win = tri_ref[0]                               # (1, npx) i32 winner ids
    base = (cid - 1) * _rp.CHUNK
    rel = win - base
    mine = (win >= 0) & (rel >= 0) & (rel < _rp.CHUNK)  # (1, npx)

    def interpolants(sel, write_mask):
        """Evaluate every interpolant from the selected (RW, npx) record
        rows and merge into the output on `write_mask` pixels."""
        r = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
        pxf = (tx * _rp.TILE_W + jax.lax.rem(r, _rp.TILE_W)).astype(jnp.float32) + 0.5
        pyf = (ty * _rp.TILE_H + r // _rp.TILE_W).astype(jnp.float32) + 0.5
        new = _eval_interpolants(sel, pxf, pyf, vertex_colors)
        acc = out_ref[0]
        out_ref[0] = jnp.where(write_mask, new, acc)

    # winner-skip: most pairs lose the whole tile to another chunk (or the
    # background) — the per-pair cost then collapses to the tri-block read
    # + this reduction, and the one-hot matmul/interpolant eval never runs.
    #
    # One-hot select of the winner's record row on the MXU: contract the
    # triangle dim of the (C, RW) block against the (C, npx) one-hot —
    # records stay in their natural row layout (no relayout). MEASURED dead
    # end (round 3): gating this per 16-triangle sub-block
    # (scratch-accumulated (SUB,RW)·(SUB,npx) dots) was 3× SLOWER — a
    # one-hot select's MXU time scales with the OUTPUT columns, not the
    # contraction dim, and winners average ~5 sub-blocks per owning pair,
    # so 5 small dots lose to one big one. RESOLVE_HALF (K=C/2, exactly one
    # MXU contraction tile at _rp.CHUNK=256) is the one grain where gating can
    # still pay; dev-sweep knob.
    if RESOLVE_HALF:
        hc = _rp.CHUNK // 2
        for h in (0, 1):
            mine_h = mine & (rel // hc == h)
            run_h = jnp.any(mine_h) if not skip else \
                jnp.logical_and(won > 0, jnp.any(mine_h))

            @pl.when(run_h)
            def _(h=h, mine_h=mine_h):
                oh = jnp.where(
                    mine_h,
                    (jax.lax.broadcasted_iota(jnp.int32, (hc, npx), 0)
                     == rel - h * hc).astype(_oh_dtype()), 0.0)
                interpolants(_winner_select(rec_ref, oh, tr,
                                            slice(h * hc, (h + 1) * hc)),
                             mine_h)
    else:
        # skip mode gates on the SCALAR owner flag alone: owners have
        # any(mine) true by construction (owns below IS any(mine)), and
        # losers then skip even the vector reduction
        run = jnp.any(mine) if not skip else won > 0

        @pl.when(run)
        def _():
            oh = (jax.lax.broadcasted_iota(jnp.int32, (_rp.CHUNK, npx), 0)
                  == rel).astype(_oh_dtype())
            interpolants(_winner_select(rec_ref, oh, tr), mine)


def resolve_attrs_pallas(bins: PallasBins, tri_tiles: Array, records: Array,
                         width: int, height: int,
                         vertex_colors: bool = False,
                         interpret: bool = False,
                         tile_y_offset=0, skip: bool | None = None,
                         tiled: bool = False) -> Array:
    """Run the resolve sweep → (height, width, CHANNELS) f32 attribute
    image. `tri_tiles` is the visibility kernel's tiled winner map
    ((n_tiles, 1, TH·TW), from visibility_pallas_tiled); `records` comes
    from planes.build_resolve_records. `tile_y_offset` (int or traced i32):
    whole-tile y offset for banded multi-chip rendering (must match the
    visibility pass's). `skip` overrides the TRIDENT_RESOLVE_SKIP loser
    fast-path flag (tests exercise both paths explicitly)."""
    if skip is None:
        skip = RESOLVE_SKIP
    ntx = -(-width // _rp.TILE_W)
    nty = -(-height // _rp.TILE_H)
    n_tiles = ntx * nty
    npx = _rp.TILE_H * _rp.TILE_W
    records, tr, rw = _prep_records(records)
    pair_tile, pair_chunk, n_grid = bins.pair_tile, bins.pair_chunk, bins.n_real
    idx = jnp.arange(bins.n_pairs, dtype=jnp.int32)
    # scalar-prefetch arrays live in the ~1MB SMEM budget: the full-size
    # won array (256KB at PAIR_BUDGET=65536) only rides along when the
    # skip kernel actually reads it — the default path gets a 1-element
    # dummy (the kernel's won_ref access is behind a STATIC `if skip`)
    won = jnp.zeros((bins.n_pairs if skip else 1,), jnp.int32)
    if skip:
        # exact owners: does any winner id in the pair's tile fall in its
        # chunk's range? XLA fuses the gather into the compare+any — the
        # (NPAIR, npx) intermediate never materializes.
        rows = tri_tiles[pair_tile, 0, :]              # (NPAIR, npx) i32
        rel = rows - ((pair_chunk - 1) * _rp.CHUNK)[:, None]
        owns = ((rows >= 0) & (rel >= 0) & (rel < _rp.CHUNK)).any(axis=1)
        owns &= idx < n_grid
        # first owning pair of each tile does the tile reset (won == 2)
        first_of_tile = jnp.full((n_tiles + 1,), bins.n_pairs, jnp.int32).at[
            jnp.where(owns, pair_tile, n_tiles)].min(idx, mode="drop")
        won = jnp.where(owns,
                        jnp.where(first_of_tile[pair_tile] == idx, 2, 1),
                        0).astype(jnp.int32)
        # alias each loser step's blocks to the previous owner's (the
        # loser-prefix before the first owner aliases the FIRST owner:
        # its uninitialized out block is then reset by that owner's
        # won==2 step before any index change can flush it)
        prev_own = _cummax_i32(jnp.where(owns, idx, -1))
        first_own = jnp.min(jnp.where(owns, idx, bins.n_pairs))
        src = jnp.where(prev_own >= 0, prev_own,
                        jnp.minimum(first_own, bins.n_pairs - 1))
        pair_tile = jnp.where(won > 0, pair_tile, pair_tile[src])
        pair_chunk = jnp.where(won > 0, pair_chunk, pair_chunk[src])
    elif RESOLVE_COMPACT:
        # owning-pair compaction: a pair owns pixels iff some winner id in
        # its tile falls in its chunk's id range. The gather feeds straight
        # into the compare+any reduction (XLA fuses it; the (NPAIR, npx)
        # intermediate never materializes). v2 (round-3 hardware finding):
        # the original stable ARGSORT over the full PAIR_BUDGET array cost
        # ~65 ns/key ≈ 4 ms — more than the skipped loser steps saved, a
        # consistent −0.4..−0.9 FPS. A cumsum of the owner flags gives
        # each owner its destination slot directly (order-preserving, so
        # the kernel's first-pair-of-tile reset is unchanged) and two
        # 1-D scatters replace the sort. Slots past the owner count keep
        # zeros — the grid stops at n_grid and never reads them.
        rows = tri_tiles[pair_tile, 0, :]              # (NPAIR, npx) i32
        rel = rows - ((pair_chunk - 1) * _rp.CHUNK)[:, None]
        owns = ((rows >= 0) & (rel >= 0) & (rel < _rp.CHUNK)).any(axis=1)
        owns &= jnp.arange(bins.n_pairs, dtype=jnp.int32) < bins.n_real
        dst = jnp.where(owns, _cumsum_i32(owns.astype(jnp.int32)) - 1,
                        bins.n_pairs)
        pair_tile = jnp.zeros_like(pair_tile).at[dst].set(
            pair_tile, mode="drop")
        pair_chunk = jnp.zeros_like(pair_chunk).at[dst].set(
            pair_chunk, mode="drop")
        n_grid = jnp.sum(owns).astype(jnp.int32)

    band = jnp.asarray(tile_y_offset, jnp.int32).reshape(1)
    kernel = functools.partial(_resolve_kernel, ntx=ntx,
                               vertex_colors=vertex_colors, skip=skip, tr=tr)
    if tr:
        # chunk c = lanes [c·C, (c+1)·C) of the one 2-D column table —
        # block starts are always _rp.CHUNK-aligned (_rp.CHUNK is a 128 multiple)
        rec_spec = (
            pl.BlockSpec((3, rw, _rp.CHUNK),
                         lambda i, band, tiles, chunks, won:
                         (0, 0, chunks[i]),
                         memory_space=pltpu.VMEM)
            if _PREC_MODE == "split" else
            pl.BlockSpec((rw, _rp.CHUNK),
                         lambda i, band, tiles, chunks, won: (0, chunks[i]),
                         memory_space=pltpu.VMEM))
    else:
        rec_spec = (
            pl.BlockSpec((1, 3, _rp.CHUNK, rw),
                         lambda i, band, tiles, chunks, won:
                         (chunks[i], 0, 0, 0),
                         memory_space=pltpu.VMEM)
            if _PREC_MODE == "split" else
            pl.BlockSpec((1, _rp.CHUNK, rw),
                         lambda i, band, tiles, chunks, won: (chunks[i], 0, 0),
                         memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(jnp.maximum(n_grid, 1),),
        in_specs=[
            rec_spec,
            pl.BlockSpec((1, 1, npx),
                         lambda i, band, tiles, chunks, won: (tiles[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CHANNELS, npx),
                         lambda i, band, tiles, chunks, won: (tiles[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    (attrs,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, CHANNELS, npx), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(band, pair_tile, pair_chunk, won, records, tri_tiles)

    # untouched tiles hold garbage; deferred masks them via tri_id == -1,
    # but zero them anyway so NaNs can't leak through masked selects.
    # skip mode: only OWNED tiles were written (touched-but-unowned tiles
    # are all background and their steps aliased another tile's blocks)
    if skip:
        touched_idx = jnp.where(won > 0, pair_tile, n_tiles)
    else:
        touched_idx = jnp.where(idx < n_grid, pair_tile, n_tiles)
    written = jnp.zeros((n_tiles + 1,), jnp.bool_).at[touched_idx].set(
        True, mode="drop")[:n_tiles]
    attrs = jnp.where(written[:, None, None], attrs, 0.0)
    if tiled:
        # kernel-native (n_tiles, CHANNELS, npx) — profiler probe for the
        # untile relayout cost (a (H,W,16) channel-last untile moves
        # ~128 MB at 1080p)
        return attrs
    return untile_frame(attrs, ntx, nty)[:height, :width]
