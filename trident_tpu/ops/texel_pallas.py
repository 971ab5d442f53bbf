"""Texel fetch as windowed one-hot MXU selects (no per-pixel gather).

The forward path's last per-pixel random access is the bilinear texel
quad fetch: ONE (…,4)-u32 gather per pixel (ops/shading._bilinear_flat).
XLA lowers it to ~8 ns/row dynamic slices (PERF.md "XLA gather ≈ 8 ns/row"
— overhead-bound, not bandwidth-bound), which is ~16.6 ms of the 1M/1080p
frame all by itself: the entire remaining shade hides in its shadow.

This kernel replaces the gather with MXU one-hot contractions against a
VMEM-resident texel table — the TPU-native pattern for small-table
lookups (reference behavior: plain texture sampling, Default.frag:69-75):

  1. (XLA, build_texel_table) tex.quads (Q,4 u32, one RGBA8 texel per
     word) unpacks to a (Qpad,16) bf16 channel table [t00.rgba, t10.rgba,
     t01.rgba, t11.rgba]. Byte values 0..255 and one-hot 0/1 are EXACT in
     bf16, and the MXU accumulates in f32, so selection is exact — no
     quantization anywhere.
  2. The (H,W) quad-index image (idx = flat pyramid entry per pixel,
     -1 on uncovered pixels whose interpolants are stale garbage) tiles
     into (nb, 1, P) pixel blocks. Per block the kernel reduces the
     covered-index min/max, then loops over only the ≤⌈range/512⌉
     512-entry table slabs the block actually addresses ("windowed"):
     most blocks sample one texture at 1-2 adjacent mip levels, so the
     window is a handful of slabs instead of the whole table. Per slab:
     one (512,P) iota-compare builds the one-hot and one
     (512,16)·(512,P) → (16,P) MXU dot accumulates the selected texels
     (a pixel's idx lies in exactly one slab; all other slabs contribute
     exact zeros). Uncovered pixels' one-hot is all-zero → black, masked
     by `covered` downstream exactly like the gather path.
  3. The bilinear lerp (same expression order as _bilinear_flat) runs
     in-kernel on the VPU; the block writes (1,4,P) — 4 output channels,
     not 16.

Cost model (why this wins): a full-table one-hot costs P·Q·C MACs — the
invariant for ANY dense-matmul gather — but the windowed form costs
P·(trips·512)·C with trips ≈ 1-6 measured on the flagship scene, putting
the MXU work at ~0.2-1 TFLOP-equivalent ≈ 1-3 ms and the VPU compare work
at ~trips·0.5 ms, vs 16.6 ms of serialized gather rows. Default ON since
the round-3 hardware A/B (19.29 vs 18.5 FPS at 1M/1080p; exact, parity-
tested vs the gather path); TRIDENT_TEXEL_MXU=0 restores the gather when
the table exceeds the VMEM budget (also falls back automatically).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TEXEL_MXU = _os.environ.get("TRIDENT_TEXEL_MXU", "1") == "1"

TEXEL_MXU_MAX_PIX = int(_os.environ.get("TRIDENT_TEXEL_MAX_PIX",
                                        str(4 * 1024 * 1024)))
                             # frame-pixel ceiling for the default-on
                             # heuristic (ops/deferred._shade_common):
                             # ≥4K frames sit at low mip levels where the
                             # level-0 table region widens the per-block
                             # slab windows — measured 8.23 vs 8.82 FPS
                             # at ultra4k on v5e; every ≤2.1 Mpix bench
                             # config wins with the sampler on

SLAB = int(_os.environ.get("TRIDENT_TEXEL_SLAB", "512"))
                             # table rows per one-hot contraction: smaller
                             # slabs → finer occupancy skipping (a block's
                             # touched entries cluster per (slot,mip)
                             # region) but more loop iterations; dev-sweep
                             # knob, must be a multiple of the bf16 VMEM
                             # tile's 16-sublane granularity (the kernel
                             # takes dynamic-start sublane slices of the
                             # bf16 table; an unaligned start is a Mosaic
                             # hazard)
if SLAB < 16 or SLAB % 16 != 0:
    raise ValueError(f"TRIDENT_TEXEL_SLAB={SLAB} must be a multiple of 16")
BR = int(_os.environ.get("TRIDENT_TEXEL_BR", "8"))
BC = int(_os.environ.get("TRIDENT_TEXEL_BC", "256"))
                             # pixel-block shape (rows, cols): P = BR·BC
                             # lanes per block. Smaller blocks → tighter
                             # index windows (fewer slabs) but less MXU
                             # utilization per dot; dev-sweep knob.
MAX_TABLE_ENTRIES = int(_os.environ.get("TRIDENT_TEXEL_MAX_Q", "32768"))
                             # the resident (Qpad,16) bf16 table is
                             # lane-PADDED to 128 in VMEM — a row costs
                             # 128·2 = 256 B, not 32 B — so 32768 entries
                             # occupy 8 MB next to the (SLAB,P) one-hot
                             # (2 MB at defaults) + accumulator; bigger
                             # atlases fall back to the XLA gather path.
                             # (The bench scenes' table is 24.3k entries
                             # ≈ 6.2 MB padded.)


def build_texel_table(quads: Array) -> Array:
    """(Q,4) u32 packed-RGBA8 quads → (Qpad,16) bf16 channel table.

    Channel layout: [t00.r g b a, t10.rgba, t01.rgba, t11.rgba] — the
    exact values ops/shading._unpack_rgba8 produces (0..255, bf16-exact).
    Qpad rounds up to SLAB so the kernel's slab windows never run off the
    table (padding rows are zero → never selected: idx < Q)."""
    q = quads.shape[0]
    qpad = -(-q // SLAB) * SLAB
    ch = []
    for t in range(4):
        v = quads[:, t]
        for shift in (0, 8, 16, 24):
            ch.append(((v >> shift) & 0xFF).astype(jnp.bfloat16))
    table = jnp.stack(ch, axis=1)                       # (Q, 16)
    if qpad != q:
        table = jnp.concatenate(
            [table, jnp.zeros((qpad - q, 16), jnp.bfloat16)], axis=0)
    return table


def _texel_kernel(idx_ref, fx_ref, fy_ref, table_ref, out_ref, *, p: int):
    idx = idx_ref[0]                                    # (1, P) i32
    fx = fx_ref[0]                                      # (1, P) f32
    fy = fy_ref[0]
    qpad = table_ref.shape[0]

    covered = idx >= 0
    mn = jnp.min(jnp.where(covered, idx, qpad))
    mx = jnp.max(idx)                                   # -1 if none covered
    st0 = (mn // SLAB) * SLAB
    trips = jnp.where(mx >= 0, (mx - st0) // SLAB + 1, 0)

    def body(k, acc):
        start = st0 + k * SLAB
        rel = idx - start                               # (1, P)
        # the [mn,mx] window is contiguous but a block's indices cluster
        # at its few (slot, mip) regions — gap slabs between clusters
        # (e.g. the jump from a level-0 row span to level 1) pass through
        # for the cost of this scalar occupancy test instead of a full
        # (SLAB,P) compare + MXU dot. Uncovered pixels (idx = -1) fail
        # rel >= 0 for every slab.
        occupied = jnp.any((rel >= 0) & (rel < SLAB))

        def hit():
            tslab = table_ref[pl.ds(start, SLAB), :]    # (SLAB, 16) bf16
            oh = (jax.lax.broadcasted_iota(jnp.int32, (SLAB, p), 0)
                  == rel).astype(jnp.bfloat16)          # exact 0/1
            sel = jax.lax.dot_general(tslab, oh, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            return acc + sel                            # (16, P)

        return jax.lax.cond(occupied, hit, lambda: acc)

    g = jax.lax.fori_loop(0, trips, body,
                          jnp.zeros((16, p), jnp.float32))

    # bilinear lerp, same expression order as shading._bilinear_flat so
    # results agree to fma-fusion noise (≤1 ulp)
    def texel(t):                                       # (4, P) rgba rows
        return g[t * 4:(t + 1) * 4]

    top = texel(0) * (1.0 - fx) + texel(1) * fx
    bot = texel(2) * (1.0 - fx) + texel(3) * fx
    out_ref[0] = (top * (1.0 - fy) + bot * fy) * (1.0 / 255.0)


def sample_bilinear_mxu(table: Array, idx: Array, fx: Array, fy: Array,
                        interpret: bool = False) -> Array:
    """Windowed one-hot texel sampling.

    table: (Qpad,16) bf16 from build_texel_table. idx: (H,W) i32 flat
    quad-pyramid entry per pixel, -1 where uncovered (excluded from the
    block window; sampled black). fx/fy: (H,W) f32 bilinear fractions.
    Returns (H,W,4) f32 in [0,1] — matches shading._bilinear_flat.
    """
    h, w = idx.shape
    p = BR * BC
    hp, wp = -(-h // BR) * BR, -(-w // BC) * BC

    def tile(a, fill):
        a = jnp.pad(a, ((0, hp - h), (0, wp - w)), constant_values=fill)
        return (a.reshape(hp // BR, BR, wp // BC, BC)
                .transpose(0, 2, 1, 3).reshape(-1, 1, p))

    idx_t = tile(idx, -1)
    fx_t = tile(fx, 0.0)
    fy_t = tile(fy, 0.0)
    nb = idx_t.shape[0]

    kernel = functools.partial(_texel_kernel, p=p)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole table resident: same block every step → fetched once
            pl.BlockSpec((table.shape[0], 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 4, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(idx_t, fx_t, fy_t, table)

    img = (out.reshape(hp // BR, wp // BC, 4, BR, BC)
           .transpose(0, 3, 1, 4, 2)
           .reshape(hp, wp, 4))
    return img[:h, :w]


def sample_bilinear_mxu_tiled(table: Array, idx: Array, fx: Array, fy: Array,
                              interpret: bool = False) -> Array:
    """Tiled-layout twin of sample_bilinear_mxu: idx/fx/fy come as
    (n_tiles, npx) planes (the resolve pass's kernel-native pixel order)
    and the output is (n_tiles, 4, npx) — one raster tile per block, so
    there is NO tile/untile relayout on either side (the (H,W) entry
    point pays two). Same kernel, same windowed one-hot math, and a
    single tile's pixels are spatially tighter than the (8,256) blocks,
    so the slab windows only shrink."""
    nt, npx = idx.shape

    def r3(a):
        return a.reshape(nt, 1, npx)                # pure reshape

    kernel = functools.partial(_texel_kernel, p=npx)
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, npx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((table.shape[0], 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, npx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, 4, npx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(r3(idx), r3(fx), r3(fy), table)
