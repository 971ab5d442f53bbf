"""Per-triangle attribute interpolation planes.

For homogeneous rasterization, any vertex attribute A interpolates as a
rational screen function: A(p) = (gA·p)/(g1·p) with p=(px,py,1), where
gA = Σ_k A_k·edge_k and g1 = Σ_k edge_k are per-TRIANGLE constants. Folding
per-draw shading state (color factor, material, texture slot) in as plane
constants lets the deferred pass fetch everything it needs about a pixel's
winning triangle with TWO packed row gathers — per-pixel gathers are the
dominant cost on TPU (~8ns each), so this replaces the naive
edge-row + vertex-ids + 3 attribute rows + draw-row fetch chain.

Plane table layout, split into two (T,16) tables:
  A: g1(3) | gN.x(3) | gN.y(3) | gN.z(3) | gU(3) | pad
  B: gV(3) | color_factor(4) | metallic | roughness | ambient | slot |
     anchor_x | anchor_y | pad(3)
(vertex colors, when enabled, get a third table C: gR(3) gG(3) gB(3) pad)

The deferred pass evaluates every plane at p' = (px−anchor, py−anchor, 1).
In f32 mode the anchors are 0 (absolute pixels). f16 mode (measured 36%
faster deferred at 1M tris on v5e — 64B→32B gather rows) re-anchors each
triangle at its bbox corner snapped to 16px (exact in f16) and rescales all
six g-vectors by a shared per-triangle 1/max|component| — the rational
forms A(p)=gA·p/g1·p and the UV screen derivatives are invariant to a
common scale, and anchoring bounds the |p'| lever arm so f16's 10-bit
mantissa cancellation error stays at the sub-LSB level.

Structure note (measured on v5e): per-attribute plane builds are explicit
elementwise fma chains (_plane_parts — einsum's dot_general rounding is
output-layout-dependent on TPU, the round-3 flavor-drift bug); a combined
batched matmul over an attribute stack (`einsum("tka,tkc->tac")`) lowers
3× slower, and materializing a shared (T,3,16) corner gather breaks
cross-stage fusion entirely. XLA CSEs repeated attrs[tri_vtx] gathers.
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from trident_tpu.ops.vertex import TriangleSetup, VertexStageOut

Array = jax.Array


class AttributePlanes(NamedTuple):
    table_a: Array            # (T,16) f32
    table_b: Array            # (T,16) f32
    table_c: Optional[Array]  # (T,16) f32 or None (no vertex colors)


def _plane_parts(attr: Array, edge: Array) -> list:
    """Interpolation-plane coefficients out[t,c] = Σ_k attr[t,k]·edge[t,k,c]
    as three (T,) columns, association fixed at (k0·e0 + k1·e1) + k2·e2.

    Deliberately ELEMENTWISE, not einsum: a k=3 einsum goes through
    dot_general, whose TPU rounding is contract-precision- and (in
    principle) output-layout-dependent, while IEEE mul/add in one fixed
    association is layout- and backend-independent by construction — and
    it skips the MXU's k:3→128 padding waste. Hardware note (r3hw8.log):
    the HIGHEST-pinned einsums this replaced measured BIT-IDENTICAL
    golden flavors, so the row/col builders were already drift-free on
    v5e; this form just makes that a guarantee instead of an
    observation."""
    return [(attr[:, 0] * edge[:, 0, c] + attr[:, 1] * edge[:, 1, c])
            + attr[:, 2] * edge[:, 2, c] for c in range(3)]


def _g1_parts(edge: Array) -> list:
    """Σ_k edge[t,k,c] as three (T,) columns, association (e0+e1)+e2 —
    the denominator plane (attr ≡ 1), same fixed-order rationale as
    _plane_parts."""
    return [(edge[:, 0, c] + edge[:, 1, c]) + edge[:, 2, c]
            for c in range(3)]


def build_planes(setup: TriangleSetup, verts: VertexStageOut, tri_vtx: Array,
                 tri_draw: Array, shade_table: Array,
                 vertex_colors: bool = False,
                 f16: bool = False) -> AttributePlanes:
    corners = verts.attrs[tri_vtx]                 # gathers CSE'd by XLA
    return build_planes_corners(
        setup, corners[..., 3:6], corners[..., 6:8], tri_draw, shade_table,
        corner_col=corners[..., 8:11] if vertex_colors else None, f16=f16)


def build_planes_corners(setup: TriangleSetup, corner_nrm: Array,
                         corner_uv: Array, tri_draw: Array,
                         shade_table: Array,
                         corner_col: Optional[Array] = None,
                         f16: bool = False) -> AttributePlanes:
    """build_planes from pre-gathered per-corner attributes — pure
    per-triangle math, shardable over the triangle dim (multi-chip
    geometry phase)."""
    edge = setup.edge                              # (T,3,3)
    t = edge.shape[0]
    vertex_colors = corner_col is not None

    def plane(attr_per_vertex):                    # (T,3) values → (T,3) plane
        return jnp.stack(_plane_parts(attr_per_vertex, edge), axis=1)

    g1 = jnp.stack(_g1_parts(edge), axis=1)        # (T,3)

    gs = [g1, plane(corner_nrm[..., 0]), plane(corner_nrm[..., 1]),
          plane(corner_nrm[..., 2]),
          plane(corner_uv[..., 0]), plane(corner_uv[..., 1])]
    if vertex_colors:
        gs += [plane(corner_col[..., 0]), plane(corner_col[..., 1]),
               plane(corner_col[..., 2])]

    if f16:
        # re-anchor at the bbox corner (16px-snapped: exact in f16) and
        # rescale by a SHARED per-triangle factor — ratios are invariant.
        # Kept as per-vector elementwise chains (no (T,K,3) stack) so XLA
        # fuses the shift/abs/max/scale into the plane einsums instead of
        # round-tripping a materialized stack through HBM.
        ax = (setup.bbox[:, 0] // 16 * 16).astype(edge.dtype)   # (T,)
        ay = (setup.bbox[:, 1] // 16 * 16).astype(edge.dtype)
        gs = [jnp.concatenate(
            [g[:, 0:2],
             (g[:, 2] + g[:, 0] * ax + g[:, 1] * ay)[:, None]], axis=1)
            for g in gs]
        m = gs[0][:, 0] * 0.0
        for g in gs:
            m = jnp.maximum(m, jnp.max(jnp.abs(g), axis=1))
        s = 1.0 / jnp.maximum(m, 1e-30)                         # (T,)
        gs = [g * s[:, None] for g in gs]
        store = jnp.float16
    else:
        ax = ay = jnp.zeros((t,), edge.dtype)
        store = edge.dtype

    g1, g_nx, g_ny, g_nz, g_u, g_v = gs[:6]
    draw = shade_table[tri_draw]                   # (T,8)

    pad1 = jnp.zeros((t, 1), edge.dtype)
    table_a = jnp.concatenate([g1, g_nx, g_ny, g_nz, g_u, pad1], axis=1)
    table_b = jnp.concatenate(
        [g_v, draw, ax[:, None], ay[:, None],
         jnp.zeros((t, 3), edge.dtype)], axis=1)

    table_c = None
    if vertex_colors:
        table_c = jnp.concatenate(
            [gs[6], gs[7], gs[8], jnp.zeros((t, 7), edge.dtype)], axis=1)
        table_c = table_c.astype(store)
    return AttributePlanes(table_a=table_a.astype(store),
                           table_b=table_b.astype(store), table_c=table_c)


# resolve-record row layout (see build_resolve_records): plane g-vectors
# first (3 rows each), then per-draw shading constants (the shade table +
# the texture row: w, h, base>>8, pow2 edge), then optional vertex-color
# planes. Indices are shared with ops/resolve_pallas.py.
RR_G1, RR_NX, RR_NY, RR_NZ, RR_U, RR_V = 0, 3, 6, 9, 12, 15
RR_CF, RR_MET, RR_ROUGH, RR_AMB, RR_SLOT = 18, 22, 23, 24, 25
RR_TSX, RR_TSY, RR_BASE8, RR_EDGE = 26, 27, 28, 29
RR_COL = 30
RR_WIDTH, RR_WIDTH_VCOLOR = 32, 40


def build_resolve_rows(setup: TriangleSetup, corner_nrm: Array,
                       corner_uv: Array, tri_draw: Array, draw_consts: Array,
                       corner_col: Optional[Array] = None,
                       consts_rows: Optional[Array] = None) -> Array:
    """Unchunked (T, RW) resolve rows: all interpolation planes + shading
    constants per triangle. Pure per-triangle math — shardable over the
    triangle dim (multi-chip geometry phase, parallel/framebuffer.py).

    corner_nrm/(uv)/(col): (T,3,3|2|3) per-corner vertex attributes;
    draw_consts: (D, 12) f32 — color_factor rgba, metallic, roughness,
    ambient_strength, texture slot, then the texture sizes row (w, h,
    base>>8, pow2 edge) — so the kernel computes mip levels AND the
    sampler's flat addressing with zero per-pixel table gathers.
    """
    edge = setup.edge

    def plane(attr_per_vertex):
        return jnp.stack(_plane_parts(attr_per_vertex, edge), axis=1)

    g1 = jnp.stack(_g1_parts(edge), axis=1)
    # corner-major callers pass pre-gathered consts (they ride in the one
    # draw-row gather); otherwise ONE (T,12) gather here
    consts = draw_consts[tri_draw] if consts_rows is None else consts_rows
    cols = [g1, plane(corner_nrm[..., 0]), plane(corner_nrm[..., 1]),
            plane(corner_nrm[..., 2]),
            plane(corner_uv[..., 0]), plane(corner_uv[..., 1]), consts]
    rw = RR_WIDTH
    if corner_col is not None:
        cols += [plane(corner_col[..., 0]), plane(corner_col[..., 1]),
                 plane(corner_col[..., 2])]
        rw = RR_WIDTH_VCOLOR
    rows = jnp.concatenate(cols, axis=1)           # (T, 30|39)
    return jnp.pad(rows, ((0, 0), (0, rw - rows.shape[1])))


def chunk_resolve_rows(rows: Array, chunk: int) -> Array:
    """(T, RW) rows → (NC+1, C, RW) chunked records; chunk block 0 is the
    empty sentinel. The layout is a pure reshape of the row table (a
    transposed (NC, RW, C) layout measured 14 ms of pure relayout at 1M
    triangles); the kernel's one-hot matmul contracts the triangle dim in
    place."""
    t, rw = rows.shape
    n_chunks = max(1, -(-t // chunk))
    rows = jnp.pad(rows, ((0, n_chunks * chunk - t), (0, 0)))
    rec = rows.reshape(n_chunks, chunk, rw)
    sentinel = jnp.zeros((1, chunk, rw), rows.dtype)
    return jnp.concatenate([sentinel, rec], axis=0)


# TRIDENT_RESOLVE_TR=1 (default): transposed resolve records. The lane-
# major (NC+1, C, RW) layout DMAs a (C=256, RW→128-lane-pad) f32 block
# per resolve grid step — 128 KB of which 3/4 is lane padding (RW=32).
# Column-major (RW, (NC+1)·C) keeps triangles on lanes: the per-step
# block is (RW, C) = 32 KB, chunk windows are 256-lane-aligned BlockSpec
# slices of ONE 2-D array (no 3-D reshape, no sentinel concat per chunk
# dim), and the winner one-hot contraction simply contracts the other
# operand side. Built COLUMN-NATIVE below (the shared elementwise plane
# chains stack straight onto the leading row axis) — building (T, RW)
# and transposing measured 14 ms of pure relayout at 1M triangles.
RESOLVE_TR = _os.environ.get("TRIDENT_RESOLVE_TR", "1") == "1"

# TRIDENT_PLANAR=1 (default): keep the corner-stage → record-builder
# chain PLANAR end to end (SetupCols/CornerCols column vectors) instead
# of stacking (T,3,3)/(T,3,2) intermediates that the builders immediately
# re-slice — bit-identical values (same fma chains), purely a layout
# change; knob exists for the hardware A/B.
PLANAR = _os.environ.get("TRIDENT_PLANAR", "1") == "1"


def build_resolve_cols(setup: TriangleSetup, corner_nrm: Array,
                       corner_uv: Array, tri_draw: Array, draw_consts: Array,
                       corner_col: Optional[Array] = None,
                       consts_rows: Optional[Array] = None) -> Array:
    """Column-major twin of build_resolve_rows: (RW, T) with the SAME row
    index layout (RR_*) — row r here equals column r there, bit-exactly:
    both builders evaluate the shared _plane_parts/_g1_parts elementwise
    chains, so the scalar arithmetic is identical on every backend and
    only the assembly axis differs (stacking (T,) lanes on a NEW leading
    axis is a contiguous copy, not a transpose)."""
    edge = setup.edge
    t = edge.shape[0]

    consts = draw_consts[tri_draw] if consts_rows is None else consts_rows
    parts = _g1_parts(edge)
    for attr in (corner_nrm[..., 0], corner_nrm[..., 1], corner_nrm[..., 2],
                 corner_uv[..., 0], corner_uv[..., 1]):
        parts += _plane_parts(attr, edge)
    parts += [consts[:, j] for j in range(consts.shape[1])]
    rw = RR_WIDTH
    if corner_col is not None:
        for attr in (corner_col[..., 0], corner_col[..., 1],
                     corner_col[..., 2]):
            parts += _plane_parts(attr, edge)
        rw = RR_WIDTH_VCOLOR
    cols = jnp.stack(parts, axis=0)                # (30|39, T)
    return jnp.pad(cols, ((0, rw - cols.shape[0]), (0, 0)))


def build_resolve_cols_planar(cc) -> Array:
    """build_resolve_cols from the corner stage's PLANAR columns
    (ops/corner.CornerCols) — bit-identical output (the same
    _plane_parts/_g1_parts fma chains on the same column values), but no
    (T,3,3)/(T,3,2) corner stacks and no setup.edge round-trip anywhere
    between the corner math and the (RW, T) record table: with this as
    the only consumer, XLA dead-code-eliminates the stacked forms."""
    e = cc.setup.e

    def g1_cols():
        return [(e[c] + e[3 + c]) + e[6 + c] for c in range(3)]

    def plane_cols(a0, a1, a2):
        # == _plane_parts with attr[:, k] = (a0, a1, a2)[k]
        return [(a0 * e[c] + a1 * e[3 + c]) + a2 * e[6 + c]
                for c in range(3)]

    parts = g1_cols()
    for c in range(3):                                 # nx, ny, nz
        parts += plane_cols(cc.nrm[c], cc.nrm[3 + c], cc.nrm[6 + c])
    for j in range(2):                                 # u, v
        parts += plane_cols(cc.uv[j], cc.uv[2 + j], cc.uv[4 + j])
    parts += list(cc.consts)
    rw = RR_WIDTH
    if cc.col is not None:
        for c in range(3):
            parts += plane_cols(cc.col[c], cc.col[3 + c], cc.col[6 + c])
        rw = RR_WIDTH_VCOLOR
    cols = jnp.stack(parts, axis=0)                    # (30|39, T)
    return jnp.pad(cols, ((0, rw - cols.shape[0]), (0, 0)))


def chunk_resolve_cols(cols: Array, chunk: int) -> Array:
    """(RW, T) columns → (RW, (NC+1)·C) chunked records, chunk 0 the
    zero sentinel: pure lane-dim padding — the resolve BlockSpec windows
    chunk c as lanes [c·C, (c+1)·C), always 256-aligned."""
    rw, t = cols.shape
    n_chunks = max(1, -(-t // chunk))
    return jnp.pad(cols, ((0, 0), (chunk, n_chunks * chunk - t)))


def build_resolve_records(setup: TriangleSetup, verts: VertexStageOut,
                          tri_vtx: Array, tri_draw: Array,
                          draw_consts: Array, chunk: int,
                          vertex_colors: bool = False) -> Array:
    """Chunked records for the in-kernel resolve pass (ops/resolve_pallas.py):
    build + chunk over gathered corner attrs, in the layout RESOLVE_TR
    selects (the kernel dispatches on ndim)."""
    corners = verts.attrs[tri_vtx]                 # gathers CSE'd by XLA
    col = corners[..., 8:11] if vertex_colors else None
    if RESOLVE_TR:
        return chunk_resolve_cols(
            build_resolve_cols(setup, corners[..., 3:6], corners[..., 6:8],
                               tri_draw, draw_consts, col), chunk)
    return chunk_resolve_rows(
        build_resolve_rows(setup, corners[..., 3:6], corners[..., 6:8],
                           tri_draw, draw_consts, col),
        chunk)
