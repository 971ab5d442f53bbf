#!/usr/bin/env python
"""Shade-side cost decomposition on hardware (round 5, VERDICT item 3).

The resolve+shade side is ~16-21 ms at 1M/1080p and has never been
decomposed the way kbench split the visibility kernel. This times the
pieces of deferred_shade_attrs on the REAL flagship attribute image
(chained device-side, one readback at the end):

  index   — size-hint bit-smear + bilinear_index (per-pixel texel math)
  texel   — build_texel_table + windowed one-hot MXU sampler (production)
  gather  — shading.sample_texture XLA row-gather path (the alternative)
  world   — ndc→world 4×4 matmul chain at HIGHEST precision (2 Mpix)
  pbr     — shade_pbr Cook-Torrance on precomputed inputs
  tail    — tonemap + background + select + concat + clip
  full    — deferred_shade_attrs end-to-end (sanity vs the sum)
  tiled   — resolve(tiled) + shade_attrs_tiled + untile4: the TILED_SHADE
            1080p loss (-1.7 FPS despite deleting the 4.1 ms untile) has
            never been located; vs `full`+resolve(untiled) says where.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/sbench.py
Env: SB_W/SB_H/SB_GRID (default 1920x1080 grid=36 — the 1M flagship),
     SB_ITERS=30, SB_CONFIGS comma list (default all above).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from profile_stages import build_scene
    from trident_tpu.ops import shading
    from trident_tpu.ops import texel_pallas as tp
    from trident_tpu.ops import resolve_pallas as rp
    from trident_tpu.ops.deferred import _background, deferred_shade_attrs
    from trident_tpu.ops.planes import build_resolve_records
    from trident_tpu.ops.raster_pallas import (
        CHUNK, TILE_H, TILE_W, untile_frame, visibility_pallas_tiled,
    )
    from trident_tpu.ops.resolve_pallas import resolve_attrs_pallas
    from trident_tpu.ops.vertex import triangle_setup, vertex_stage
    from trident_tpu.render.frame import (
        build_draw_params, gather_mesh_draws, geometry_to_device,
    )
    from trident_tpu.render.lights import gather_lights
    from trident_tpu.render.types import AiBlend, CameraParams, SkyboxCube
    from trident_tpu.ops.deferred_tiled import shade_attrs_tiled

    width = int(os.environ.get("SB_W", "1920"))
    height = int(os.environ.get("SB_H", "1080"))
    grid = int(os.environ.get("SB_GRID", "36"))
    iters = int(os.environ.get("SB_ITERS", "30"))
    interp = jax.default_backend() == "cpu"
    print(f"backend={jax.default_backend()} {width}x{height} grid={grid} "
          f"iters={iters}", flush=True)

    r, reg = build_scene(width, height, grid)
    packed = r.geometry.packed()
    geo = geometry_to_device(packed)
    recs = gather_mesh_draws(reg, r.geometry)
    plan, tri_draw = r._plan_cache.plan(packed, recs, r.geometry.version)
    params, palette, shade_c = build_draw_params(
        recs, plan.num_draws, material_table=r.geometry.material_table())
    lights = gather_lights(reg)
    tex = r.textures.device_arrays()
    cam = r.editor_camera.params()
    sky = SkyboxCube(faces=jnp.zeros((6, 1, 1, 3), jnp.float32),
                     valid=jnp.asarray(False))
    verts = vertex_stage(geo, plan, params,
                         CameraParams(cam.view, cam.proj, cam.position),
                         palette, skinned=False)
    setup = triangle_setup(verts.clip, plan.tri_vtx, plan.tri_valid,
                           width, height)
    tex_wh = tex.sizes[params.texture_slot].astype(jnp.float32)
    draw_consts = jnp.concatenate([shade_c, tex_wh], axis=1)
    records = build_resolve_records(setup, verts, plan.tri_vtx, tri_draw,
                                    draw_consts, CHUNK)
    bins, depth_tiles, tri_tiles, _ = jax.jit(
        lambda s: visibility_pallas_tiled(s, width, height,
                                          interpret=interp))(setup)
    ntx, nty = -(-width // TILE_W), -(-height // TILE_H)
    from trident_tpu.render.types import GBuffer

    gbuf = GBuffer(tri_id=untile_frame(tri_tiles, ntx, nty)[:height, :width],
                   depth=untile_frame(depth_tiles, ntx, nty)[:height, :width],
                   aux=bins.aux)
    attrs = jax.jit(lambda tt, rec: resolve_attrs_pallas(
        bins, tt, rec, width, height, interpret=interp))(tri_tiles, records)
    print(f"pairs={int(bins.n_real)} covered="
          f"{(np.asarray(gbuf.tri_id) >= 0).sum()}", flush=True)

    covered = gbuf.tri_id >= 0
    normal = shading._normalize(attrs[..., rp.CH_NX:rp.CH_NZ + 1])
    uv = attrs[..., rp.CH_U:rp.CH_V + 1]
    mip = attrs[..., rp.CH_MIP]
    color_factor = attrs[..., rp.CH_CF:rp.CH_CF + 4]
    metallic = attrs[..., rp.CH_MET:rp.CH_MET + 1]
    roughness = attrs[..., rp.CH_ROUGH:rp.CH_ROUGH + 1]
    ambient = attrs[..., rp.CH_AMB:rp.CH_AMB + 1]

    def size_hint_of(a):
        w0 = a[..., rp.CH_TSX].astype(jnp.int32)
        h0 = a[..., rp.CH_TSY].astype(jnp.int32)
        base8 = a[..., rp.CH_BASE8].astype(jnp.int32)
        m = jnp.maximum(jnp.maximum(w0, h0), 1) - 1
        for k in (1, 2, 4, 8, 16):
            m = m | (m >> k)
        return (w0, h0, base8, m + 1)

    def index_math(a, tok):
        a = a + tok
        sh = size_hint_of(a)
        mip_c = jnp.clip(a[..., rp.CH_MIP], 0.0,
                         tex.max_level.astype(jnp.float32))
        mip_i = jnp.round(mip_c).astype(jnp.int32)
        idx, fx, fy = shading.bilinear_index(
            tex, None, a[..., rp.CH_U:rp.CH_V + 1], mip_i, sh)
        return (idx.ravel()[0].astype(jnp.float32) + fx.ravel()[0]
                + fy.ravel()[0]) * 0.0

    sh0 = size_hint_of(attrs)
    mip_i0 = jnp.round(jnp.clip(mip, 0.0, tex.max_level.astype(
        jnp.float32))).astype(jnp.int32)
    idx0, fx0, fy0 = shading.bilinear_index(tex, None, uv, mip_i0, sh0)
    idx0 = jnp.where(covered, idx0, -1)
    table = tp.build_texel_table(tex.quads)

    hp = jax.lax.Precision.HIGHEST
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    vp_inv = jnp.linalg.inv(jnp.matmul(cam.proj, cam.view, precision=hp))

    def world_of(depth, tok):
        ndc = jnp.stack([px * (2.0 / width) - 1.0,
                         py * (2.0 / height) - 1.0,
                         depth + tok, jnp.ones_like(px)], axis=-1)
        wh = jnp.matmul(ndc, vp_inv.T, precision=hp)
        return wh[..., :3] / jnp.where(jnp.abs(wh[..., 3:4]) < 1e-20,
                                       1e-20, wh[..., 3:4])

    world0 = world_of(gbuf.depth, 0.0)
    sampled0 = jnp.ones((height, width, 4), jnp.float32) * 0.5
    albedo0 = sampled0[..., :3] * color_factor[..., :3]

    def timed(label, f, *args):
        out = f(*args, jnp.zeros((), jnp.float32))
        np.asarray(out)
        t0 = time.perf_counter()
        tok = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            tok = f(*args, tok)
        np.asarray(tok)
        print(f"{label}: {(time.perf_counter() - t0) / iters * 1000.0:.2f}"
              f" ms/call", flush=True)

    cfgs = os.environ.get(
        "SB_CONFIGS",
        "index,texel,gather,world,pbr,tail,full,tiled,resolve,resolve_tiled"
    ).split(",")

    if "index" in cfgs:
        timed("index", jax.jit(index_math), attrs)
    if "texel" in cfgs:
        timed("texel(mxu)", jax.jit(lambda i, x, y, tok: tp.
                                    sample_bilinear_mxu(
                                        table, i, x + tok, y,
                                        interpret=interp).ravel()[0] * 0.0),
              idx0, fx0, fy0)
    if "gather" in cfgs:
        timed("texel(gather)", jax.jit(lambda u, m, tok: shading.
                                       sample_texture(
                                           tex, None, u + tok, m,
                                           mode="bilinear",
                                           size_hint=sh0).ravel()[0] * 0.0),
              uv, mip)
    if "world" in cfgs:
        timed("world", jax.jit(lambda d, tok: world_of(d, tok)
                               .ravel()[0] * 0.0), gbuf.depth)
    if "pbr" in cfgs:
        timed("pbr", jax.jit(lambda w, n_, a, tok: shading.shade_pbr(
            w + tok, n_, a, metallic, roughness, ambient, cam.position,
            lights, dir_shadow=None).ravel()[0] * 0.0),
            world0, normal, albedo0)
    if "tail" in cfgs:
        def tail(lit, a_cf, tok):
            shaded = shading.tonemap_reinhard_gamma(lit + tok)
            bg = _background(cam, sky, width, height,
                             (0.05, 0.05, 0.08, 1.0))
            rgb = jnp.where(covered[..., None], shaded, bg)
            a_out = jnp.where(covered[..., None], a_cf[..., 3:4], 1.0)
            return jnp.clip(jnp.concatenate([rgb, a_out], -1),
                            0.0, 1.0).ravel()[0] * 0.0

        timed("tail", jax.jit(tail), world0, color_factor)
    if "full" in cfgs:
        timed("full(shade_attrs)", jax.jit(lambda g, a, tok:
                                           deferred_shade_attrs(
            g._replace(depth=g.depth + tok), a, tex, cam, lights, width,
            height, skybox=sky, ai=None, sampling="bilinear")
            .ravel()[0] * 0.0), gbuf, attrs)
    if "resolve" in cfgs:
        timed("resolve(untiled)", jax.jit(lambda tt, rec, tok:
                                          resolve_attrs_pallas(
            bins, tt, rec + tok, width, height, interpret=interp)
            .ravel()[0] * 0.0), tri_tiles, records)
    if "resolve_tiled" in cfgs:
        timed("resolve(tiled)", jax.jit(lambda tt, rec, tok:
                                        resolve_attrs_pallas(
            bins, tt, rec + tok, width, height, interpret=interp,
            tiled=True).ravel()[0] * 0.0), tri_tiles, records)
    if "fused" in cfgs:
        # TRIDENT_FUSE stage probe (both rebuild bins per call, so their
        # DIFFERENCE is the fused pass's marginal resolve cost; compare
        # that against resolve(tiled) = the standalone second pass)
        timed("visbins(bins+vis)", jax.jit(lambda s, tok:
                                           (lambda o: o[1].ravel()[0]
                                            + o[2].ravel()[0]
                                            .astype(jnp.float32))(
            visibility_pallas_tiled(
                s._replace(edge=s.edge + tok), width, height,
                interpret=interp)) * 0.0), setup)
        timed("fused(bins+vis+resolve,tiled)", jax.jit(
            lambda s, rec, tok: (lambda o: o[1].ravel()[0]
                                 + o[3].ravel()[0])(
                rp.fused_visibility_resolve_pallas(
                    s._replace(edge=s.edge + tok), rec, width, height,
                    interpret=interp)) * 0.0), setup, records)
    if "tiled" in cfgs:
        def tiled_chain(tt, dt, rec, tok):
            at = resolve_attrs_pallas(bins, tt, rec + tok, width, height,
                                      interpret=interp, tiled=True)
            rgba_t = shade_attrs_tiled(tt, dt, at, tex, cam, lights,
                                       width, height, interpret=interp)
            return untile_frame(rgba_t, ntx, nty)[:height, :width] \
                .ravel()[0] * 0.0

        timed("tiled(resolve+shade+untile4)", jax.jit(tiled_chain),
              tri_tiles, depth_tiles, records)


if __name__ == "__main__":
    main()
