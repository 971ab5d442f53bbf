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
  B: gV(3) | color_factor(4) | metallic | roughness | ambient | slot | pad(3)
(vertex colors, when enabled, get a third table C: gR(3) gG(3) gB(3) pad)

Inputs come pre-gathered: `corners` is the (T,3,16) packed per-corner rows
(VertexStageOut.packed[tri_vtx]) shared with triangle setup — corner
gathers are done ONCE per frame.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from trident_tpu.ops.vertex import TriangleSetup

Array = jax.Array

# packed corner row layout (VertexStageOut.packed)
_NRM = slice(4, 7)
_UV = slice(7, 9)
_COL = slice(9, 12)


class AttributePlanes(NamedTuple):
    table_a: Array            # (T,16) f32
    table_b: Array            # (T,16) f32
    table_c: Optional[Array]  # (T,16) f32 or None (no vertex colors)


def build_planes(setup: TriangleSetup, corners: Array, tri_draw: Array,
                 shade_table: Array, vertex_colors: bool = False) -> AttributePlanes:
    edge = setup.edge                              # (T,3,3)
    t = edge.shape[0]

    # plane of a per-corner attribute stack (T,3,A): Σ_k attr[:,k,:]·edge[:,k,c]
    def planes_of(attr):                           # (T,3,A) → (T,A,3)
        return jnp.einsum("tka,tkc->tac", attr, edge)

    g1 = jnp.sum(edge, axis=1)                     # (T,3)

    nrm_uv = planes_of(corners[..., 4:9])          # normals(3)+uv(2) → (T,5,3)
    g_n = nrm_uv[:, 0:3].reshape(t, 9)
    g_u = nrm_uv[:, 3]
    g_v = nrm_uv[:, 4]

    draw = shade_table[tri_draw]                   # (T,8)

    pad1 = jnp.zeros((t, 1), edge.dtype)
    table_a = jnp.concatenate([g1, g_n, g_u, pad1], axis=1)
    table_b = jnp.concatenate([g_v, draw, jnp.zeros((t, 5), edge.dtype)], axis=1)

    table_c = None
    if vertex_colors:
        g_c = planes_of(corners[..., _COL]).reshape(t, 9)
        table_c = jnp.concatenate([g_c, jnp.zeros((t, 7), edge.dtype)], axis=1)
    return AttributePlanes(table_a=table_a, table_b=table_b, table_c=table_c)
