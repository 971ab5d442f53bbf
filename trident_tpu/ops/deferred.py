"""Deferred resolve: winner-triangle GBuffer → shaded RGBA8 frame.

The reference shades every fragment inside the raster pass; on TPU we shade
exactly once per pixel AFTER visibility, in one fused XLA pass. Per-pixel
random access is the cost driver on TPU, so every gather fetches ONE packed
row: the winner's edge row (9f), its vertex-id triple, three packed vertex
attribute rows (world/normal/uv/color, 12f), one draw-shade row
(color-factor/metallic/roughness/ambient/texture-slot, 8f), and u32 texels.
Then: perspective-correct barycentrics, attribute interpolation, mip level
from the triangle's screen-space UV footprint, bilinear/trilinear texture
sample, Cook-Torrance PBR, skybox background, Reinhard+gamma, AI blend.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from trident_tpu.ops import shading
from trident_tpu.ops.vertex import TriangleSetup, VertexStageOut
from trident_tpu.render.types import (
    AiBlend,
    CameraParams,
    GBuffer,
    LightParams,
    SkyboxCube,
    TextureArrays,
)

Array = jax.Array


def _background(camera: CameraParams, skybox: Optional[SkyboxCube],
                width: int, height: int, clear_color) -> Array:
    """Skybox (sampled by world-space view ray) or clear color. The
    reference draws a view-rotation-only cube (Skybox.vert); the equivalent
    ray here is inverse-projected pixel direction rotated into world space."""
    clear = jnp.broadcast_to(
        jnp.asarray(clear_color[:3], jnp.float32), (height, width, 3))
    if skybox is None:
        return clear

    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ny, nx = jnp.meshgrid(ys, xs, indexing="ij")

    proj = camera.proj
    p00 = proj[0, 0]
    p11 = proj[1, 1]
    x_v = nx / p00
    y_v = ny / p11
    dir_view = jnp.stack([x_v, y_v, -jnp.ones_like(x_v)], axis=-1)
    rot = camera.view[:3, :3]
    dir_world = dir_view @ rot  # R^T @ d per pixel
    sky = shading.sample_skybox(skybox.faces, dir_world)
    return jnp.where(skybox.valid, sky, clear)


def deferred_shade(gbuffer: GBuffer, setup: TriangleSetup,
                   verts: VertexStageOut, tri_vtx: Array, tri_draw: Array,
                   shade_table: Array, textures: TextureArrays,
                   camera: CameraParams, lights: LightParams,
                   width: int, height: int,
                   clear_color=(0.05, 0.05, 0.08, 1.0),
                   skybox: Optional[SkyboxCube] = None,
                   ai: Optional[AiBlend] = None) -> Array:
    """Shade the frame. `shade_table` is (D,8): color_factor rgba
    (material base-color × tint), metallic, roughness, ambient_strength,
    texture slot (as f32). Returns (H,W,4) float32 in [0,1]."""
    tri = gbuffer.tri_id                                  # (H,W)
    covered = tri >= 0
    tri_safe = jnp.maximum(tri, 0)

    # --- one row gather each: edge coefficients, vertex ids, draw row ------
    edge = setup.edge[tri_safe]                           # (H,W,3,3) — 9f row
    vids = tri_vtx[tri_safe]                              # (H,W,3)
    draw_row = shade_table[tri_draw[tri_safe]]            # (H,W,8)

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    e = (edge[..., 0] * px[..., None]
         + edge[..., 1] * py[..., None]
         + edge[..., 2])                                  # (H,W,3)
    e_sum = jnp.sum(e, axis=-1, keepdims=True)
    inv_sum = 1.0 / jnp.where(jnp.abs(e_sum) < 1e-20, 1e-20, e_sum)
    b = e * inv_sum                                       # clip-space bary

    # --- three packed attribute rows, interpolated --------------------------
    a3 = verts.attrs[vids]                                # (H,W,3,12)
    interp = jnp.sum(a3 * b[..., None], axis=-2)          # (H,W,12)
    world = interp[..., 0:3]
    normal = shading._normalize(interp[..., 3:6])
    uv = interp[..., 6:8]
    vcolor = interp[..., 8:11]

    color_factor = draw_row[..., 0:4]
    metallic = draw_row[..., 4:5]
    roughness = draw_row[..., 5:6]
    ambient_strength = draw_row[..., 6:7]
    slot = draw_row[..., 7].astype(jnp.int32)

    # --- mip level from the triangle's screen-space UV gradient ------------
    uv3 = a3[..., 6:8]                                    # (H,W,3,2)
    a_coef = edge[..., 0]                                 # (H,W,3) de/dx
    b_coef = edge[..., 1]                                 # (H,W,3) de/dy
    duv_dx = (jnp.sum(a_coef[..., None] * uv3, axis=-2)
              - jnp.sum(a_coef, axis=-1, keepdims=True) * uv) * inv_sum
    duv_dy = (jnp.sum(b_coef[..., None] * uv3, axis=-2)
              - jnp.sum(b_coef, axis=-1, keepdims=True) * uv) * inv_sum
    tex_size = textures.sizes[slot].astype(jnp.float32)   # (H,W,2)
    rho = jnp.maximum(
        jnp.sum(jnp.square(duv_dx * tex_size), axis=-1),
        jnp.sum(jnp.square(duv_dy * tex_size), axis=-1),
    )
    mip = 0.5 * jnp.log2(jnp.maximum(rho, 1e-12))
    sampled = shading.sample_texture_mip(textures, slot, uv, mip)

    albedo = sampled[..., :3] * color_factor[..., :3] * vcolor
    alpha = color_factor[..., 3:4] * sampled[..., 3:4]

    lit = shading.shade_pbr(world, normal, albedo, metallic, roughness,
                            ambient_strength, camera.position, lights)
    shaded = shading.tonemap_reinhard_gamma(lit)

    background = _background(camera, skybox, width, height, clear_color)
    rgb = jnp.where(covered[..., None], shaded, background)
    a = jnp.where(covered[..., None], alpha, clear_color[3])
    out = jnp.concatenate([rgb, a], axis=-1)

    if ai is not None:
        blend = jnp.clip(ai.blend, 0.0, 1.0)
        ai_rgba = jnp.concatenate(
            [ai.image, jnp.ones((*ai.image.shape[:2], 1), jnp.float32)], axis=-1)
        out = out * (1.0 - blend) + ai_rgba * blend

    return jnp.clip(out, 0.0, 1.0)


def pack_rgba8(frame: Array) -> Array:
    return jnp.round(frame * 255.0).astype(jnp.uint8)
