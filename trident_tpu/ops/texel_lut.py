"""VMEM texel LUT: Pallas lane-local gather for small resident texture sets.

The XLA texel fetch is ROW-RATE bound (~8 ns/gathered row — PERF.md): at
1080p bilinear it is ~15 ms/frame, the last per-pixel random access in the
pipeline. Mosaic lowers 2-D `jnp.take_along_axis(table, idx, axis=0)` to
`tpu.dynamic_gather` — a per-(sublane,lane) VMEM gather running at vector
speed, with the constraint that `idx.shape == table.shape`: each call
fetches exactly table.shape elements, each lane gathering from its own
column.

So: replicate the engine's flat texel buffer (render/textures.py quads[:,0]
— the quad's own texel; gutter rows/cols make +1/+stride neighbor
addressing valid) across the 128 lanes once per texture version, reshape
the frame's per-pixel texel addresses into (G, N, 128) chunks, and one
pallas_call fetches every texel of the frame. The index arithmetic
(mip level geometry, wrap, corner offsets) stays in XLA exactly as
ops/shading.py computes it — only the gather moves into the kernel.

Eligible when the texture buffer has ≤ LUT_MAX_ROWS entries (a 64² slot
with full mip chain ≈ 5.7k; table VMEM = rows × 512 B). Callers fall back
to the XLA path otherwise (render/renderer.py checks eligibility
host-side per texture version).

Reference parity: this is the same sampling math as
Trident/src/Shaders/Default.frag's texture() calls — only the fetch
mechanism is TPU-specific.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

import os as _os

LUT_MAX_ROWS = int(_os.environ.get("TRIDENT_LUT_ROWS", "6144"))
                     # table VMEM = rows×512 B (3 MB at 6144); one 64² mip
                     # pyramid with gutters ≈ 5.7k rows
LANES = 128


def lut_table(texel_col: Array, rows: int = 0) -> Array:
    """(N,) u32/i32 flat texel buffer → (Npad, 128) lane-replicated LUT.
    Build once per texture version and keep device-resident."""
    n = texel_col.shape[0]
    npad = rows or -(-n // 8) * 8
    col = jnp.pad(texel_col.astype(jnp.int32), (0, npad - n))
    return jnp.broadcast_to(col[:, None], (npad, LANES))


def _gather_kernel(idx_ref, tab_ref, out_ref):
    out_ref[0] = jnp.take_along_axis(tab_ref[...], idx_ref[0], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lut_gather(table: Array, idx: Array, interpret: bool = False) -> Array:
    """Fetch texels for arbitrary-shaped i32 address array `idx` (values in
    [0, table rows)) → same-shaped i32 texels. Addresses are chunked to the
    table's (N, 128) shape; the pad tail gathers row 0 (harmless)."""
    n, lanes = table.shape
    flat = idx.reshape(-1)
    total = flat.shape[0]
    per = n * lanes
    g = max(1, -(-total // per))
    flat = jnp.pad(flat, (0, g * per - total))
    chunks = flat.reshape(g, n, lanes)
    out = pl.pallas_call(
        _gather_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, lanes), jnp.int32),
        interpret=interpret,
    )(chunks, table)
    return out.reshape(-1)[:total].reshape(idx.shape)
