"""Shadow-map taps as windowed one-hot MXU selects (no per-pixel gather).

shbench on hardware (tools_dev/r5hw2.log, shadows1080): the per-pixel
shadow-map lookup `shadow.depth[yi, xi]` — 2M scalar 2D gathers from the
1024² map — measured 110.6 ms hard / 86.1 ms PCF in isolation (random
addresses; in-frame coherent addresses are cheaper but still the
dominant shadow cost: the light-pass render itself is only 5.9 ms).
This kernel replaces the gather with the texel-sampler pattern
(ops/texel_pallas.py), adapted to a dense 2D map:

  1. The map's f32 depth BITS split into four 8-bit planes, stored bf16
     (bytes 0..255 are bf16-EXACT; bf16 cannot represent general f32
     depths — 8 mantissa bits would quantize the compare — and even a
     HIGHEST-precision f32 one-hot dot is only ~2^-16-accurate on the
     MXU, so selection happens in the integer domain and the comparison
     becomes i32 `test_bits > map_bits`, which is order-equivalent to
     the f32 compare for the non-negative depths both sides hold; NaN /
     negative test depths land on pixels the `inside` mask already
     forces lit, identically to the gather path).
  2. Per (8·256)-pixel block the kernel reduces the tap-index min/max
     into a 2D window and loops its 16-row × 256-col cells with a scalar
     occupancy gate (screen-coherent blocks touch 1-4 cells; silhouette
     blocks pass gap cells for the cost of the gate). Per occupied cell:
     one (256,P) iota-compare one-hot per x-tap, a (16,256)·(256,P) MXU
     dot per (chunk, x-tap), and a 16-row masked reduce per (tap, chunk)
     — each tap's bits accumulate from exactly ONE cell, everything
     else contributes exact zeros.
  3. The kernel returns raw per-tap map BITS; the f32 comparison, the
     PCF lerp, and the inside/enabled masking all stay in
     ops/shadow.shadow_factor's XLA code, shared verbatim with the
     gather path — the two paths differ only in how the map value is
     fetched, and that fetch is exact (bit-equality tested).

Reference behavior: the shadow-map sample + compare of Default.frag's
shadow term; the factor semantics live in ops/shadow.py.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

SHADOW_MXU = _os.environ.get("TRIDENT_SHADOW_MXU", "1") == "1"

BR = 8                      # pixel-block rows
BC = 256                    # pixel-block cols (P = BR·BC lanes)
RW = 16                     # map window rows per cell — the bf16 VMEM
                            # tile is (16, 128): dynamic sublane starts
                            # must be 16-aligned
CW = 256                    # map window cols per cell (128-lane aligned)
MAX_MAP_VMEM = 9 * 1024 * 1024
                            # chunk-plane budget: (4, s, s) bf16 resident
                            # next to the pixel blocks; s=1024 → 8 MB,
                            # s=2048 would need 32 MB → XLA fallback


def supported(size: int) -> bool:
    """Map sizes the kernel handles: window cells must tile the map."""
    return (size % RW == 0 and size % CW == 0
            and 4 * size * size * 2 <= MAX_MAP_VMEM)


def build_shadow_chunks(depth_map: Array) -> Array:
    """(s, s) f32 map → (4, s, s) bf16: byte j of the depth's i32 BITS.
    Bytes are bf16-exact; reconstruction in the kernel is
    c0 + 256·(c1 + 256·(c2 + 256·c3)) in i32 — exact."""
    bits = jax.lax.bitcast_convert_type(depth_map, jnp.int32)
    return jnp.stack(
        [((bits >> (8 * j)) & 0xFF).astype(jnp.bfloat16) for j in range(4)],
        axis=0)


def _taps_kernel(y0_ref, x0_ref, y1_ref, x1_ref, chunks_ref, out_ref, *,
                 p: int, ntaps: int):
    y0 = y0_ref[0]                                  # (1, P) i32, -1 = skip
    x0 = x0_ref[0]
    y1 = y1_ref[0]
    x1 = x1_ref[0]
    s = chunks_ref.shape[1]
    valid = y0 >= 0

    # tap-index bounds over valid pixels (y1 ≥ y0, x1 ≥ x0 by clipping)
    ymin = jnp.min(jnp.where(valid, y0, s))
    ymax = jnp.max(jnp.where(valid, y1, -1))
    xmin = jnp.min(jnp.where(valid, x0, s))
    xmax = jnp.max(jnp.where(valid, x1, -1))
    ys0 = (ymin // RW) * RW
    xs0 = (xmin // CW) * CW
    ytr = jnp.where(ymax >= 0, (ymax - ys0) // RW + 1, 0)
    xtr = jnp.where(xmax >= 0, (xmax - xs0) // CW + 1, 0)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (CW, p), 0)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (RW, p), 0)

    def ybody(i, acc):
        ys = ys0 + i * RW
        yin0 = valid & (y0 >= ys) & (y0 < ys + RW)
        yin1 = valid & (y1 >= ys) & (y1 < ys + RW)

        def xbody(j, acc):
            xs = xs0 + j * CW
            xin0 = (x0 >= xs) & (x0 < xs + CW)
            xin1 = (x1 >= xs) & (x1 < xs + CW)
            occupied = jnp.any((yin0 | yin1) & (xin0 | xin1))

            def hit():
                ohy0 = (iota_r == (y0 - ys)).astype(jnp.float32)
                ohx = [(iota_c == (x0 - xs)).astype(jnp.bfloat16)]
                ohy = [ohy0]
                if ntaps == 4:
                    ohx.append((iota_c == (x1 - xs)).astype(jnp.bfloat16))
                    ohy.append((iota_r == (y1 - ys)).astype(jnp.float32))
                new = list(acc)
                for t in range(ntaps):
                    ty, tx = (0, 0) if ntaps == 1 else (t // 2, t % 2)
                    bits = None
                    for c in range(3, -1, -1):
                        m = chunks_ref[c, pl.ds(ys, RW), pl.ds(xs, CW)]
                        q = jax.lax.dot_general(
                            m, ohx[tx], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (RW, P)
                        # exactly one row selected per pixel → the masked
                        # sum IS the chunk byte (0..255, f32-exact)
                        sel = jnp.sum(q * ohy[ty], axis=0,
                                      keepdims=True).astype(jnp.int32)
                        bits = sel if bits is None else bits * 256 + sel
                    new[t] = new[t] + bits   # one cell owns each tap
                return tuple(new)

            return jax.lax.cond(occupied, hit, lambda: acc)

        return jax.lax.fori_loop(0, xtr, xbody, acc)

    zero = jnp.zeros((1, p), jnp.int32)
    acc = jax.lax.fori_loop(0, ytr, ybody, (zero,) * ntaps)
    for t in range(ntaps):
        out_ref[0, t] = acc[t][0]


def shadow_tap_bits(chunks: Array, y0: Array, x0: Array,
                    y1: Array = None, x1: Array = None,
                    interpret: bool = False) -> Array:
    """Windowed one-hot shadow-map fetch.

    chunks: (4, s, s) bf16 from build_shadow_chunks. y0/x0 (and y1/x1
    for the 4-tap PCF footprint): (H, W) i32 map indices, -1 where the
    pixel must not widen the block window (outside the light frustum).
    Returns (H, W, ntaps) i32 — the map depth's raw f32 BITS per tap
    (taps ordered (y0,x0), (y0,x1), (y1,x0), (y1,x1)); -1-indexed
    pixels return 0, masked by the caller's `inside` exactly like the
    gather path's clipped reads."""
    pcf = y1 is not None
    ntaps = 4 if pcf else 1
    if not pcf:
        y1, x1 = y0, x0
    h, w = y0.shape
    p = BR * BC
    hp, wp = -(-h // BR) * BR, -(-w // BC) * BC

    def tile(a):
        a = jnp.pad(a, ((0, hp - h), (0, wp - w)), constant_values=-1)
        return (a.reshape(hp // BR, BR, wp // BC, BC)
                .transpose(0, 2, 1, 3).reshape(-1, 1, p))

    nb = (hp // BR) * (wp // BC)
    kernel = functools.partial(_taps_kernel, p=p, ntaps=ntaps)
    blk = pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[blk, blk, blk, blk,
                  # whole map resident: same block every step
                  pl.BlockSpec(chunks.shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ntaps, p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, ntaps, p), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tile(y0), tile(x0), tile(y1), tile(x1), chunks)

    img = (out.reshape(hp // BR, wp // BC, ntaps, BR, BC)
           .transpose(0, 3, 1, 4, 2)
           .reshape(hp, wp, ntaps))
    return img[:h, :w]
