"""Tile-local temporal warp: windowed one-hot MXU fetch of the history.

aibench on hardware (r5hw3.log, 1080p→4K): even with the V2 block-layout
history (no space-to-depth), the temporal warp's per-pixel row gather
measures 66.4 ms — ~33 ns × 2M rows — and dominates the AI-upscale
frame. This kernel replaces it with the texel/shadow-sampler pattern
(ops/texel_pallas.py, ops/shadow_pallas.py), adapted to a source too
big for VMEM (the (h, w, 12) uint8 history is ~25 MB; bf16 planes would
be 50 MB):

  * XLA prepares CHANNEL-PLANE history (12, hpad, wpad) bf16 (uint8
    values 0..255 are bf16-exact → selection is exact) and, per 8×256
    pixel block, the 32-row BAND index holding the block's minimum
    source row (scalar-prefetch array — the same mechanism the
    rasterizer's pair grid uses).
  * The kernel streams TWO stacked (12, 32, wpad) band blocks per grid
    step via prefetch-driven BlockSpec index maps — consecutive screen
    blocks reuse the same bands, so Pallas re-fetches only on change —
    covering any per-block source-row span ≤ 33. Blocks with larger
    spans (strong parallax / depth edges) drop those pixels to
    validity 0, the exact spatial-fallback contract the net is trained
    with (UpscalerNet's temporal layout: zero blocks + valid=0).
  * Per block the kernel walks the bx range in 256-lane windows with a
    scalar occupancy gate; per occupied window one (256, P) one-hot and
    12 (32, 256)·(256, P) MXU dots per covering band fetch the 12
    channels; a 32-row masked reduce lands them.

The kernel is a pure FETCH (bytes out, f32); in_bounds/validity/scaling
stay in ai/upscaler.warp_from_blocks, shared with the gather path —
outputs are bit-identical wherever both paths are valid (tested), and
the band-dropped class is measured (<~2% on rotating-camera frames).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

WARP_MXU = _os.environ.get("TRIDENT_WARP_MXU", "1") == "1"

BR = 8                      # pixel-block rows
BC = 256                    # pixel-block cols (P = BR·BC)
BAND = 32                   # source rows per band block (sublane-tile
                            # aligned for bf16); two stacked bands cover
                            # a ≤33-row per-block source span
CW = 256                    # bx window width (128-lane aligned)


def build_warp_planes(blocks_u8: Array):
    """(h, w, 12) uint8 history → ((12, hpad, wpad) bf16, h, w).
    hpad adds one spare band so the k+1 band block always exists; wpad
    rounds to the lane window."""
    h, w, _ = blocks_u8.shape
    hpad = -(-h // BAND) * BAND + BAND
    wpad = -(-w // CW) * CW
    planes = jnp.transpose(blocks_u8, (2, 0, 1)).astype(jnp.bfloat16)
    return (jnp.pad(planes, ((0, 0), (0, hpad - h), (0, wpad - w))),
            h, w)


def _warp_kernel(kband_ref, by_ref, bx_ref, band0_ref, band1_ref, out_ref,
                 *, p: int):
    i = pl.program_id(0)
    by = by_ref[0]                                   # (1, P) i32, -1 skip
    bx = bx_ref[0]
    wpad = band0_ref.shape[2]
    rel = by - kband_ref[i] * BAND                   # row within band 0/1
    valid = bx >= 0

    xmin = jnp.min(jnp.where(valid, bx, wpad))
    xmax = jnp.max(jnp.where(valid, bx, -1))
    xs0 = (xmin // CW) * CW
    xtr = jnp.where(xmax >= 0, (xmax - xs0) // CW + 1, 0)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (CW, p), 0)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (BAND, p), 0)

    def xbody(j, acc):
        xs = xs0 + j * CW
        xin = valid & (bx >= xs) & (bx < xs + CW)

        def xhit(acc):
            ohx = (iota_c == (bx - xs)).astype(jnp.bfloat16)
            for b, bref in ((0, band0_ref), (1, band1_ref)):
                rb = rel - b * BAND
                binm = xin & (rb >= 0) & (rb < BAND)
                use = jnp.any(binm)

                def bhit(acc=acc, rb=rb, bref=bref):
                    ohy = (iota_r == rb).astype(jnp.float32)
                    new = list(acc)
                    for c in range(12):
                        m = bref[c, :, pl.ds(xs, CW)]        # (BAND, CW)
                        q = jax.lax.dot_general(
                            m, ohx, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        new[c] = new[c] + jnp.sum(q * ohy, axis=0,
                                                  keepdims=True)
                    return tuple(new)

                acc = jax.lax.cond(use, bhit, lambda acc=acc: acc)
            return acc

        return jax.lax.cond(jnp.any(xin), xhit, lambda a: a, acc)

    zero = jnp.zeros((1, p), jnp.float32)
    acc = jax.lax.fori_loop(0, xtr, xbody, (zero,) * 12)
    for c in range(12):
        out_ref[0, c] = acc[c][0]


def warp_fetch_mxu(planes: Array, by: Array, bx: Array,
                   interpret: bool = False) -> Array:
    """planes: (12, hpad, wpad) bf16 from build_warp_planes. by/bx:
    (H, W) i32 source indices, -1 where the pixel must not widen the
    window OR falls outside its block's two-band row span (the caller
    pre-masks with band_ok — see warp_from_blocks). Returns (H, W, 12)
    f32 byte values (0..255); -1 pixels return 0."""
    h, w = by.shape
    p = BR * BC
    hp, wp = -(-h // BR) * BR, -(-w // BC) * BC
    nbh, nbw = hp // BR, wp // BC
    maxk = planes.shape[1] // BAND - 2

    def tile(a):
        a = jnp.pad(a, ((0, hp - h), (0, wp - w)), constant_values=-1)
        return (a.reshape(nbh, BR, nbw, BC)
                .transpose(0, 2, 1, 3).reshape(-1, 1, p))

    by_t = tile(by)
    bx_t = tile(bx)
    # per-block band base (the same reduction the caller used for
    # band_ok — recomputed here from the tiled layout, one min per block)
    bymin = jnp.min(jnp.where(by_t[:, 0] >= 0, by_t[:, 0],
                              planes.shape[1]), axis=-1)
    kband = jnp.clip(bymin // BAND, 0, maxk).astype(jnp.int32)

    nb = nbh * nbw
    kernel = functools.partial(_warp_kernel, p=p)
    blk = pl.BlockSpec((1, 1, p), lambda i, kb: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    band_shape = (12, BAND, planes.shape[2])
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                blk, blk,
                pl.BlockSpec(band_shape, lambda i, kb: (0, kb[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(band_shape, lambda i, kb: (0, kb[i] + 1, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 12, p), lambda i, kb: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 12, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(kband, by_t, bx_t, planes, planes)

    img = (out.reshape(nbh, nbw, 12, BR, BC)
           .transpose(0, 3, 1, 4, 2)
           .reshape(hp, wp, 12))
    return img[:h, :w]


def band_ok_mask(by: Array, in_bounds: Array, hpad: int) -> Array:
    """(H, W) bool: pixels whose source row fits the block's two-band
    window [32k, 32k+64) with k = the block's min valid row // 32 —
    the kernel's coverage contract. Computed XLA-side so the validity
    channel and the fetch agree exactly."""
    h, w = by.shape
    hp, wp = -(-h // BR) * BR, -(-w // BC) * BC
    byp = jnp.pad(jnp.where(in_bounds, by, hpad), ((0, hp - h),
                                                   (0, wp - w)),
                  constant_values=hpad)
    blocks = byp.reshape(hp // BR, BR, wp // BC, BC).transpose(0, 2, 1, 3)
    bymin = jnp.min(blocks.reshape(hp // BR, wp // BC, -1), axis=-1)
    k = jnp.clip(bymin // BAND, 0, hpad // BAND - 2)
    kpix = jnp.repeat(jnp.repeat(k, BR, axis=0), BC, axis=1)[:h, :w]
    return in_bounds & (by >= kpix * BAND) & (by < (kpix + 2) * BAND)
