"""Deferred resolve: winner-triangle GBuffer → shaded RGBA8 frame.

The reference shades every fragment inside the raster pass; on TPU we shade
exactly once per pixel AFTER visibility, in one fused XLA pass: gather the
winning triangle's attributes, recompute perspective-correct barycentrics,
interpolate, sample the material texture (mip level from the triangle's
screen-space UV footprint), evaluate PBR, fill background with skybox/clear,
tonemap, optionally AI-blend, and pack to uint8.
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
    DrawParams,
    GBuffer,
    LightParams,
    MaterialTable,
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
    # invert the projective xy terms: ndc.x = p00 * x_view / (-z_view)
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
                   params: DrawParams, materials: MaterialTable,
                   textures: TextureArrays, camera: CameraParams,
                   lights: LightParams, width: int, height: int,
                   clear_color=(0.05, 0.05, 0.08, 1.0),
                   skybox: Optional[SkyboxCube] = None,
                   ai: Optional[AiBlend] = None) -> Array:
    """Shade the frame. Returns (H,W,4) float32 in [0,1] (post-tonemap)."""
    tri = gbuffer.tri_id                                  # (H,W)
    covered = tri >= 0
    tri_safe = jnp.maximum(tri, 0)

    # --- recompute perspective-correct barycentrics at pixel centers -------
    edge = setup.edge[tri_safe]                           # (H,W,3,3)
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    e = (edge[..., 0] * px[..., None]
         + edge[..., 1] * py[..., None]
         + edge[..., 2])                                  # (H,W,3)
    e_sum = jnp.sum(e, axis=-1, keepdims=True)
    b = e / jnp.where(jnp.abs(e_sum) < 1e-20, 1e-20, e_sum)  # clip-space bary

    # --- gather + interpolate vertex attributes ----------------------------
    vids = tri_vtx[tri_safe]                              # (H,W,3)

    def interp(attr: Array) -> Array:
        vals = attr[vids]                                 # (H,W,3,A)
        return jnp.sum(vals * b[..., None], axis=-2)

    world = interp(verts.world)
    normal = shading._normalize(interp(verts.normal))
    uv = interp(verts.uv)
    vcolor = interp(verts.color)

    # --- per-draw / material state -----------------------------------------
    draw = tri_draw[tri_safe]                             # (H,W)
    tint = params.tint[draw]                              # (H,W,4)
    mat_idx = params.material_index[draw]
    mat = materials.params[mat_idx]                       # (H,W,8)
    slot = params.texture_slot[draw]                      # (H,W)

    # --- mip level from the triangle's screen-space UV gradient ------------
    # Affine per-triangle approximation: duv/dpixel from the edge-function
    # derivative of the barycentrics (constant over the triangle).
    uv3 = verts.uv[vids]                              # (H,W,3,2)
    a_coef = edge[..., 0]                             # (H,W,3) de/dx
    b_coef = edge[..., 1]                             # (H,W,3) de/dy
    inv_sum = 1.0 / jnp.where(jnp.abs(e_sum) < 1e-20, 1e-20, e_sum)
    duv_dx = (jnp.sum(a_coef[..., None] * uv3, axis=-2)
              - jnp.sum(a_coef, axis=-1, keepdims=True) * uv) * inv_sum
    duv_dy = (jnp.sum(b_coef[..., None] * uv3, axis=-2)
              - jnp.sum(b_coef, axis=-1, keepdims=True) * uv) * inv_sum
    tex_size = textures.sizes[slot].astype(jnp.float32)  # (H,W,2)
    rho = jnp.maximum(
        jnp.sum(jnp.square(duv_dx * tex_size), axis=-1),
        jnp.sum(jnp.square(duv_dy * tex_size), axis=-1),
    )
    mip = 0.5 * jnp.log2(jnp.maximum(rho, 1e-12))
    sampled = shading.sample_texture_mip(textures, slot, uv, mip)

    albedo = sampled[..., :3] * mat[..., :3] * tint[..., :3] * vcolor
    alpha = mat[..., 3:4] * tint[..., 3:4] * sampled[..., 3:4]
    metallic = mat[..., 4:5]
    roughness = mat[..., 5:6]
    ambient_strength = mat[..., 6:7]

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
