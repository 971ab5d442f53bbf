"""Tiled (channel-planar) deferred shading: shade in the rasterizer's
native layout, untile only the final RGBA.

The legacy path (ops/deferred.deferred_shade_attrs) consumes a channel-
LAST (H, W, 16) attribute image: the resolve pass must first untile its
(n_tiles, CHANNELS, npx) output — a ~128 MB relayout measured at
~4.1 ms/frame at 1M/1080p (PERF.md r3hw11, the `resolve_tiled` profiler
stop) — and every `attrs[..., c]` slice after that is a minor-dim
strided access. Here every per-pixel quantity stays a (n_tiles, npx)
PLANE (a free leading-axis slice of the resolve output), all math runs
planar on full lanes, the texel fetch uses the tile-native sampler
(ops/texel_pallas.sample_bilinear_mxu_tiled — one raster tile per
block, no relayout on either side), and only the final (n_tiles, 4,
npx) frame pays an untile — a quarter of the bytes.

Same math as ops/deferred._shade_common + ops/shading.shade_pbr
(reference: Default.frag:69-178), reassociated elementwise — results
agree with the legacy path to fma-fusion noise (gated by
tests/test_deferred_tiled.py and the golden suite, which runs this
path by default).

Scope: the bilinear + one-hot-MXU sampler + built-in Cook-Torrance
configuration (the production forward path). Trilinear/nearest
sampling, user shader hooks, and oversized texel tables fall back to
the legacy channel-last path (ops/deferred.py decides — see
renderer._visibility_and_shade).
"""

from __future__ import annotations

import os as _os
from typing import Optional

import jax
import jax.numpy as jnp

from trident_tpu.ops import shading
from trident_tpu.ops import texel_pallas as tp
from trident_tpu.ops import raster_pallas as _rp
from trident_tpu.render.types import CameraParams, LightParams, TextureArrays

Array = jax.Array

# TRIDENT_TILED_SHADE=0 (default): the tiled (channel-planar) shade path
# was built to delete the ~4.1 ms attrs-untile relayout, but the round-3
# closing A/B (tools_dev/r3hw14.log) measured the FULL frame ~1.7 FPS
# SLOWER with it ON at 1M/1080p (21.94 OFF vs 20.28 ON) and 4K (9.13 vs
# 8.94) — whatever the tiled layout costs downstream exceeds the untile
# saving. Default OFF; knob kept for re-measurement if the layout changes.
TILED_SHADE = _os.environ.get("TRIDENT_TILED_SHADE", "0") == "1"


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize3(x, y, z, eps: float = 1e-8):
    inv = jax.lax.rsqrt(jnp.maximum(_dot3(x, y, z, x, y, z), eps))
    return x * inv, y * inv, z * inv


def _pbr_light(lx, ly, lz, rad_r, rad_g, rad_b, nx, ny, nz, vx, vy, vz,
               al_r, al_g, al_b, metallic, roughness,
               f0_r, f0_g, f0_b):
    """Planar twin of shading.evaluate_pbr_light (one light's
    contribution, Default.frag EvaluatePBRLighting)."""
    hx, hy, hz = _normalize3(vx + lx, vy + ly, vz + lz)
    ndoth = jnp.maximum(_dot3(nx, ny, nz, hx, hy, hz), 0.0)
    a = roughness * roughness
    a2 = a * a
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    ndf = a2 / (shading.PI * denom * denom)

    ndotv = jnp.maximum(_dot3(nx, ny, nz, vx, vy, vz), 0.0)
    ndotl = jnp.maximum(_dot3(nx, ny, nz, lx, ly, lz), 0.0)
    r1 = roughness + 1.0
    k = (r1 * r1) / 8.0
    geom = (ndotv / jnp.maximum(ndotv * (1.0 - k) + k, 1e-4)) \
        * (ndotl / jnp.maximum(ndotl * (1.0 - k) + k, 1e-4))

    hdotv = jnp.maximum(_dot3(hx, hy, hz, vx, vy, vz), 0.0)
    fres_p = jnp.power(jnp.clip(1.0 - hdotv, 0.0, 1.0), 5.0)
    fr = f0_r + (1.0 - f0_r) * fres_p
    fg = f0_g + (1.0 - f0_g) * fres_p
    fb = f0_b + (1.0 - f0_b) * fres_p

    spec_den = jnp.maximum(4.0 * ndotv * ndotl, 1e-4)
    ng = ndf * geom / spec_den
    kd = (1.0 - metallic)
    inv_pi = 1.0 / shading.PI
    out_r = ((1.0 - fr) * kd * al_r * inv_pi + ng * fr) * rad_r * ndotl
    out_g = ((1.0 - fg) * kd * al_g * inv_pi + ng * fg) * rad_g * ndotl
    out_b = ((1.0 - fb) * kd * al_b * inv_pi + ng * fb) * rad_b * ndotl
    return out_r, out_g, out_b


def _shadow_factor_planar(shadow, wx, wy, wz, pcf: bool):
    """Planar twin of ops/shadow.shadow_factor."""
    s = shadow.depth.shape[0]
    m = shadow.light_vp
    cx = m[0, 0] * wx + m[0, 1] * wy + m[0, 2] * wz + m[0, 3]
    cy = m[1, 0] * wx + m[1, 1] * wy + m[1, 2] * wz + m[1, 3]
    cz = m[2, 0] * wx + m[2, 1] * wy + m[2, 2] * wz + m[2, 3]
    cw = m[3, 0] * wx + m[3, 1] * wy + m[3, 2] * wz + m[3, 3]
    safe_w = jnp.where(jnp.abs(cw) < 1e-12, 1e-12, cw)
    u = (cx / safe_w + 1.0) * 0.5
    v = (cy / safe_w + 1.0) * 0.5
    depth = cz / safe_w
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (depth <= 1.0)
    test_depth = depth - shadow.bias

    if not pcf:
        xi = jnp.clip((u * s).astype(jnp.int32), 0, s - 1)
        yi = jnp.clip((v * s).astype(jnp.int32), 0, s - 1)
        lit = jnp.where(test_depth > shadow.depth[yi, xi], 0.0, 1.0)
    else:
        fx = u * s - 0.5
        fy = v * s - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        wxf = fx - x0.astype(jnp.float32)
        wyf = fy - y0.astype(jnp.float32)
        x0c, x1c = jnp.clip(x0, 0, s - 1), jnp.clip(x0 + 1, 0, s - 1)
        y0c, y1c = jnp.clip(y0, 0, s - 1), jnp.clip(y0 + 1, 0, s - 1)

        def tap(yi, xi):
            return jnp.where(test_depth > shadow.depth[yi, xi], 0.0, 1.0)

        lit = ((tap(y0c, x0c) * (1 - wxf) + tap(y0c, x1c) * wxf) * (1 - wyf)
               + (tap(y1c, x0c) * (1 - wxf) + tap(y1c, x1c) * wxf) * wyf)

    lit = jnp.where(inside, lit, 1.0)
    return jnp.where(shadow.enabled, lit, 1.0)


def shade_attrs_tiled(tri_tiles: Array, depth_tiles: Array, attrs_t: Array,
                      textures: TextureArrays, camera: CameraParams,
                      lights: LightParams, width: int, height: int,
                      shadow=None, shadow_pcf: bool = False,
                      tonemap: bool = True, tile_y_offset=0,
                      full_height: Optional[int] = None,
                      interpret: bool = False) -> Array:
    """(n_tiles, CHANNELS, npx) resolved attrs → (n_tiles, 4, npx) frame:
    tonemapped (or linear HDR when tonemap=False) lit rgb + raw alpha.
    Background / alpha clear / AI blend compose AFTER the 4-channel
    untile in the caller (they need (H,W) space anyway)."""
    from trident_tpu.ops import resolve_pallas as rp

    nt, _, npx = attrs_t.shape
    ntx = -(-width // _rp.TILE_W)

    def a(c):
        return attrs_t[:, c, :]                          # free plane slice

    covered = tri_tiles[:, 0, :] >= 0
    depth = depth_tiles[:, 0, :]

    nx, ny, nz = _normalize3(a(rp.CH_NX), a(rp.CH_NY), a(rp.CH_NZ))
    u, v = a(rp.CH_U), a(rp.CH_V)
    mip = a(rp.CH_MIP)
    cf_r, cf_g, cf_b, cf_a = (a(rp.CH_CF), a(rp.CH_CF + 1),
                              a(rp.CH_CF + 2), a(rp.CH_CF + 3))
    metallic = jnp.clip(a(rp.CH_MET), 0.0, 1.0)
    roughness = jnp.clip(a(rp.CH_ROUGH), 0.045, 1.0)
    ambient_strength = jnp.clip(a(rp.CH_AMB), 0.0, 1.0)
    w0 = a(rp.CH_TSX).astype(jnp.int32)
    h0 = a(rp.CH_TSY).astype(jnp.int32)
    base8 = a(rp.CH_BASE8).astype(jnp.int32)
    m = jnp.maximum(jnp.maximum(w0, h0), 1) - 1
    for shift_k in (1, 2, 4, 8, 16):
        m = m | (m >> shift_k)
    size_hint = (w0, h0, base8, m + 1)

    # texel fetch — index math shared verbatim with shading.bilinear_index
    mip_c = jnp.clip(mip, 0.0, textures.max_level.astype(jnp.float32))
    mip_i = jnp.round(mip_c).astype(jnp.int32)
    lw, lh, stride, base = shading._level_geom(textures, None, mip_i,
                                               size_hint)
    x = u * lw.astype(jnp.float32) - 0.5
    y = v * lh.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    idx = (base + jnp.mod(y0.astype(jnp.int32), lh) * stride
           + jnp.mod(x0.astype(jnp.int32), lw))
    idx = jnp.where(covered, idx, -1)
    sampled = tp.sample_bilinear_mxu_tiled(
        tp.build_texel_table(textures.quads), idx, fx, fy,
        interpret=interpret)                             # (nt, 4, npx)
    al_r = sampled[:, 0, :] * cf_r
    al_g = sampled[:, 1, :] * cf_g
    al_b = sampled[:, 2, :] * cf_b
    alpha = cf_a * sampled[:, 3, :]

    # world position from depth, in tiled pixel coordinates (global rows
    # for banded rendering — same arithmetic as the legacy meshgrid)
    fh = height if full_height is None else full_height
    r = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    tid = jnp.arange(nt, dtype=jnp.int32)[:, None]
    band = jnp.asarray(tile_y_offset, jnp.int32)
    px = ((tid % ntx) * _rp.TILE_W + jax.lax.rem(r, _rp.TILE_W)
          ).astype(jnp.float32) + 0.5
    py = ((tid // ntx + band) * _rp.TILE_H + r // _rp.TILE_W
          ).astype(jnp.float32) + 0.5
    hp = jax.lax.Precision.HIGHEST
    vp_inv = jnp.linalg.inv(jnp.matmul(camera.proj, camera.view,
                                       precision=hp))
    ndc_x = px * (2.0 / width) - 1.0
    ndc_y = py * (2.0 / fh) - 1.0

    def wrow(c):
        return (vp_inv[c, 0] * ndc_x + vp_inv[c, 1] * ndc_y
                + vp_inv[c, 2] * depth + vp_inv[c, 3])

    wh = wrow(3)
    inv_wh = 1.0 / jnp.where(jnp.abs(wh) < 1e-20, 1e-20, wh)
    wx, wy, wz = wrow(0) * inv_wh, wrow(1) * inv_wh, wrow(2) * inv_wh

    dir_shadow = None
    if shadow is not None:
        dir_shadow = _shadow_factor_planar(shadow, wx, wy, wz, shadow_pcf)

    # Cook-Torrance sum (shading.shade_pbr, planar)
    vx, vy, vz = _normalize3(camera.position[0] - wx,
                             camera.position[1] - wy,
                             camera.position[2] - wz)
    f0_r = 0.04 * (1.0 - metallic) + al_r * metallic
    f0_g = 0.04 * (1.0 - metallic) + al_g * metallic
    f0_b = 0.04 * (1.0 - metallic) + al_b * metallic

    dir_on = (lights.dir_count > 0).astype(jnp.float32)
    ld = shading._normalize(-lights.dir_direction)
    rad = lights.dir_color[:3] * lights.dir_color[3]
    dr, dg, db = _pbr_light(
        jnp.broadcast_to(ld[0], wx.shape), ld[1], ld[2],
        rad[0], rad[1], rad[2], nx, ny, nz, vx, vy, vz,
        al_r, al_g, al_b, metallic, roughness, f0_r, f0_g, f0_b)
    if dir_shadow is not None:
        dr, dg, db = dr * dir_shadow, dg * dir_shadow, db * dir_shadow
    out_r, out_g, out_b = dir_on * dr, dir_on * dg, dir_on * db

    max_points = lights.point_pos_range.shape[0]
    for i in range(max_points):
        on = (i < lights.point_count).astype(jnp.float32)
        tx = lights.point_pos_range[i, 0] - wx
        ty = lights.point_pos_range[i, 1] - wy
        tz = lights.point_pos_range[i, 2] - wz
        dist = jnp.sqrt(jnp.maximum(_dot3(tx, ty, tz, tx, ty, tz), 1e-12))
        near_zero = dist <= 1e-4
        inv_d = 1.0 / jnp.where(near_zero, 1.0, dist)
        lx, ly, lz = tx * inv_d, ty * inv_d, tz * inv_d
        radius = jnp.maximum(lights.point_pos_range[i, 3], 1e-4)
        atten = (1.0 - jnp.clip(dist / radius, 0.0, 1.0)) ** 2
        ci = lights.point_color_intensity[i]
        pr, pg, pb = _pbr_light(
            lx, ly, lz, ci[0] * ci[3] * atten, ci[1] * ci[3] * atten,
            ci[2] * ci[3] * atten, nx, ny, nz, vx, vy, vz,
            al_r, al_g, al_b, metallic, roughness, f0_r, f0_g, f0_b)
        zero = jnp.where(near_zero, 0.0, 1.0) * on
        out_r += zero * pr
        out_g += zero * pg
        out_b += zero * pb

    amb = lights.ambient[:3] * lights.ambient[3]
    out_r += amb[0] * al_r * ambient_strength
    out_g += amb[1] * al_g * ambient_strength
    out_b += amb[2] * al_b * ambient_strength

    if tonemap:
        def tm(c):
            return jnp.power(jnp.maximum(c / (c + 1.0), 0.0), 1.0 / 2.2)

        out_r, out_g, out_b = tm(out_r), tm(out_g), tm(out_b)

    return jnp.stack([out_r, out_g, out_b, alpha], axis=1)  # (nt, 4, npx)
