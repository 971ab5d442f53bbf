"""Multi-chip SPMD rendering: sort-middle over a device mesh.

The reference is single-GPU; the TPU-native scaling axes are pixels AND
triangles. `shard_map` over a 1-D mesh axis runs the frame in three phases:

  1. geometry phase, sharded over VERTICES then TRIANGLES: each device
     transforms TV/n vertices (skinning + MVP) and sets up T/n triangles
     (edge functions, attribute-plane rows) in FULL-FRAME pixel
     coordinates, then `all_gather`s the compact per-triangle results over
     ICI — geometry work scales 1/n instead of being replicated per band.
  2. band cull: every device keeps the full setup but clips triangle
     bboxes to its horizontal framebuffer band (ops.vertex.band_slice_setup)
     — off-band triangles go invalid and the binner never emits pairs for
     them, so raster work scales with band height.
  3. band raster + shade: the UNCHANGED single-chip kernels run per band
     with a whole-tile y offset, evaluating the SAME global-pixel
     arithmetic as a single-chip render — bands agree with single-chip to
     ≤1 ulp (the residual is XLA's shape-dependent FMA fusion, not seam
     structure). Bands concatenate on the sharded output axis.

Screen-space post (bloom / supersample resolve / AI blend) happens OUTSIDE
the shard_map on the row-sharded arrays, where XLA's SPMD partitioner
inserts halo exchanges for the blur automatically.

Works on any 1-D mesh axis; the driver validates it on a virtual CPU mesh
(tests/test_parallel.py, parallel/dryrun.py) and the same code runs on real
ICI-connected chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7 public API
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from trident_tpu.render.types import DrawPlan, FrameOutput

Array = jax.Array


def _pad_to(x: Array, m: int, value=0):
    pad = -x.shape[0] % m
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=value)


def _sharded_geometry(axis: str, geometry, vtx_src, vtx_draw, tri_vtx,
                      tri_valid, params, camera, palette, *, num_draws: int,
                      rw: int, rh: int, skinned: bool):
    """Vertex + triangle setup with the work sharded over the mesh axis:
    each device transforms its vertex slice, all_gathers the packed rows,
    sets up its triangle slice, and all_gathers the setup. Returns the
    FULL (packed, corners_slice, setup) where `corners_slice` is this
    device's (T/n,3,16) corner rows (for building plane/record rows
    sharded) and `setup` is the gathered full-frame TriangleSetup."""
    from trident_tpu.ops.vertex import triangle_setup, vertex_stage

    plan_v = DrawPlan(vtx_src=vtx_src, vtx_draw=vtx_draw, tri_vtx=tri_vtx,
                      tri_valid=tri_valid, num_draws=num_draws)
    verts = vertex_stage(geometry, plan_v, params, camera, palette,
                         skinned=skinned)
    packed = jax.lax.all_gather(verts.packed, axis, axis=0, tiled=True)
    corners = packed[tri_vtx]                       # (T/n, 3, 16)
    setup_sl = triangle_setup(corners[..., 0:4], None, tri_valid, rw, rh)
    setup = jax.tree.map(
        lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True), setup_sl)
    return packed, corners, setup_sl, setup


def render_frame_banded(mesh: Mesh, axis: str, geometry, plan, tri_draw,
                        params, palette, shade_table, camera, lights,
                        textures, skybox, ai, light_camera=None,
                        corner_t=None, *,
                        width: int, height: int, clear_color, raster: str,
                        skinned: bool, chunk: int = 64,
                        sampling: str = "bilinear",
                        vertex_colors: bool = False,
                        plane_f16: bool = False,
                        forward_shading: bool = True,
                        shadow_size: int = 0, shadow_bias: float = 2e-3,
                        shadow_pcf: bool = False, supersample: int = 1,
                        bloom: bool = False, bloom_threshold: float = 1.0,
                        bloom_strength: float = 0.6,
                        upscale_params=None, prev=None,
                        shader_fn=None) -> FrameOutput:
    """Render (height, width) split into `mesh.shape[axis]` row bands with
    the geometry phase sharded — the full render_frame feature set
    (shadows, SSAA, bloom, f16 planes, forward kernel shading).

    `upscale_params`/`prev` mirror render_frame's neural-2× mode: width/
    height are then the HALF-res render dims and the output frame is full
    size. The upscaler runs OUTSIDE the shard_map on the row-sharded
    frame — XLA's SPMD partitioner halo-exchanges the convolutions."""
    from trident_tpu.ops import post
    from trident_tpu.ops.deferred import apply_ai_blend, pack_rgba8
    from trident_tpu.ops.raster_pallas import TILE_H
    from trident_tpu.ops.shading import tonemap_reinhard_gamma

    n = mesh.shape[axis]
    ss = max(int(supersample), 1)
    rw, rh = width * ss, height * ss
    if rh % n:
        raise ValueError(f"render height {rh} not divisible by {n} bands")
    band_h = rh // n
    if raster == "pallas" and band_h % TILE_H:
        raise ValueError(f"band height {band_h} not a multiple of raster "
                         f"tile height {TILE_H}")
    if band_h % ss:
        raise ValueError(f"band height {band_h} not a multiple of "
                         f"supersample {ss}")
    use_kernel_shading = raster == "pallas" and forward_shading

    # shard the work arrays: pad the vertex/triangle dims to multiples of n
    # (pad vertices reference row 0 / draw 0; pad triangles are invalid)
    vtx_src = _pad_to(plan.vtx_src, n)
    vtx_draw = _pad_to(plan.vtx_draw, n)
    tri_vtx = _pad_to(plan.tri_vtx, n)
    tri_valid = _pad_to(plan.tri_valid, n, value=False)
    tri_draw_p = _pad_to(tri_draw, n)
    use_corner = corner_t is not None and not skinned
    if use_corner and corner_t.shape[1] % n:
        use_corner = False      # bucketed T is pow2 >= 16, so never hit
    corner_arg = corner_t if use_corner else None

    # shadow map banding: divide light-space rows over the same axis when
    # they split evenly; otherwise each device renders the full map
    do_shadow = bool(shadow_size) and light_camera is not None
    sband_h = shadow_size // n if do_shadow else 0
    shadow_banded = (do_shadow and shadow_size % n == 0
                     and (raster != "pallas" or sband_h % TILE_H == 0))

    def band_render(vtx_src, vtx_draw, tri_vtx, tri_valid, tri_draw,
                    geometry, params, palette, shade_table, camera, lights,
                    textures, skybox, light_camera, corner_sl,
                    shadow_bias_v):
        from trident_tpu.ops.planes import (
            build_planes_corners, build_resolve_rows, chunk_resolve_rows)
        from trident_tpu.ops.raster_pallas import visibility_pallas
        from trident_tpu.ops.raster_ref import visibility_ref
        from trident_tpu.ops.vertex import band_slice_setup
        from trident_tpu.render.renderer import _visibility_and_shade
        from trident_tpu.render.types import ShadowParams

        interpret = jax.default_backend() == "cpu"
        idx = jax.lax.axis_index(axis)

        def gather_tree(x):
            return jax.tree.map(
                lambda v: jax.lax.all_gather(v, axis, axis=0, tiled=True), x)

        draw_consts = None
        if use_kernel_shading:
            tex_row = textures.sizes[params.texture_slot].astype(jnp.float32)
            draw_consts = jnp.concatenate([shade_table, tex_row], axis=1)

        # ---- phase 1: sharded geometry (full-frame coordinates) ----
        cs = None
        if use_corner:
            # corner-major (ops/corner.py): the static corner table is
            # sharded over triangles; no vertex phase at all
            from trident_tpu.ops.corner import build_draw_rows, corner_stage

            draw_rows = build_draw_rows(params, camera, rw, rh,
                                        draw_consts=draw_consts)
            cs = corner_stage(corner_sl, draw_rows, tri_draw, tri_valid,
                              rw, rh, vertex_colors=vertex_colors)
            setup_sl, c_nrm, c_uv, c_col = (cs.setup, cs.corner_nrm,
                                            cs.corner_uv, cs.corner_col)
            setup = gather_tree(setup_sl)
        else:
            packed, corners, setup_sl, setup = _sharded_geometry(
                axis, geometry, vtx_src, vtx_draw, tri_vtx, tri_valid, params,
                camera, palette, num_draws=plan.num_draws, rw=rw, rh=rh,
                skinned=skinned)
            c_nrm, c_uv = corners[..., 4:7], corners[..., 7:9]
            c_col = corners[..., 9:12] if vertex_colors else None

        records = planes = None
        if use_kernel_shading:
            from trident_tpu.ops import planes as _planes_mod
            from trident_tpu.ops.raster_pallas import CHUNK as _KCHUNK

            # the resolve pass walks the SAME pair list as the visibility
            # kernel — records must chunk at its (env-overridable) CHUNK,
            # not the ref-path `chunk` argument (renderer.py does the same)
            crows = None if cs is None else cs.consts
            if _planes_mod.RESOLVE_TR:
                # transposed records shard on the TRIANGLE (lane) dim —
                # the gather tiles along axis 1
                cols_sl = _planes_mod.build_resolve_cols(
                    setup_sl, c_nrm, c_uv, tri_draw, draw_consts, c_col,
                    consts_rows=crows)
                cols = jax.lax.all_gather(cols_sl, axis, axis=1, tiled=True)
                records = _planes_mod.chunk_resolve_cols(cols, _KCHUNK)
            else:
                rows_sl = build_resolve_rows(
                    setup_sl, c_nrm, c_uv, tri_draw, draw_consts, c_col,
                    consts_rows=crows)
                rows = jax.lax.all_gather(rows_sl, axis, axis=0, tiled=True)
                records = chunk_resolve_rows(rows, _KCHUNK)
        else:
            planes_sl = build_planes_corners(
                setup_sl, c_nrm, c_uv, tri_draw, shade_table,
                corner_col=c_col, f16=plane_f16)
            planes = gather_tree(planes_sl)

        # ---- shadow pass (light-space rows banded over the same axis) ----
        shadow = None
        if do_shadow:
            if use_corner:
                light_rows = build_draw_rows(params, light_camera,
                                             shadow_size, shadow_size)
                setup_l = gather_tree(corner_stage(
                    corner_sl, light_rows, tri_draw, tri_valid,
                    shadow_size, shadow_size).setup)
            else:
                _, _, _, setup_l = _sharded_geometry(
                    axis, geometry, vtx_src, vtx_draw, tri_vtx, tri_valid,
                    params, light_camera, palette, num_draws=plan.num_draws,
                    rw=shadow_size, rh=shadow_size, skinned=skinned)
            if shadow_banded:
                ly0 = idx * sband_h
                s_band = band_slice_setup(setup_l, ly0, sband_h)
                if raster == "pallas":
                    g_l = visibility_pallas(s_band, shadow_size, sband_h,
                                            interpret=interpret,
                                            tile_y_offset=ly0 // TILE_H)
                else:
                    g_l = visibility_ref(s_band, shadow_size, sband_h,
                                         y_offset=ly0)
                depth_map = jax.lax.all_gather(g_l.depth, axis, axis=0,
                                               tiled=True)
            else:
                if raster == "pallas":
                    g_l = visibility_pallas(setup_l, shadow_size,
                                            shadow_size, interpret=interpret)
                else:
                    g_l = visibility_ref(setup_l, shadow_size, shadow_size)
                depth_map = g_l.depth
            shadow = ShadowParams(
                depth=depth_map,
                light_vp=jnp.matmul(light_camera.proj, light_camera.view,
                                    precision=jax.lax.Precision.HIGHEST),
                enabled=jnp.asarray(True),
                bias=shadow_bias_v)

        # ---- phases 2+3: band cull, raster + shade at global pixels ----
        y0 = idx * band_h
        s_band = band_slice_setup(setup, y0, band_h)
        frame, gbuf = _visibility_and_shade(
            s_band, records, planes, textures, camera, lights, skybox,
            width=rw, height=band_h, clear_color=clear_color, raster=raster,
            chunk=chunk, sampling=sampling, vertex_colors=vertex_colors,
            forward_shading=forward_shading, shadow=shadow,
            shadow_pcf=shadow_pcf, tonemap=not bloom, interpret=interpret,
            y_offset=y0, full_height=rh, shader_fn=shader_fn)
        if raster == "pallas":
            return frame, gbuf.depth, gbuf.tri_id, gbuf.aux
        return frame, gbuf.depth, gbuf.tri_id

    in_specs = (P(axis), P(axis), P(axis), P(axis), P(axis),
                P(), P(), P(), P(), P(), P(), P(), P(), P(),
                P(None, axis) if use_corner else P(), P())
    out_specs = (P(axis), P(axis), P(axis)) + (
        (P(axis),) if raster == "pallas" else ())
    # check_vma=False: pallas_call out_shapes don't carry varying-mesh-axis
    # metadata, and every output here is explicitly band-varying anyway
    fn = shard_map(band_render, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    out = fn(vtx_src, vtx_draw, tri_vtx, tri_valid, tri_draw_p,
             geometry, params, palette, shade_table, camera, lights,
             textures, skybox, light_camera, corner_arg,
             jnp.asarray(shadow_bias, jnp.float32))
    frame, depth, tri_id = out[:3]
    aux = out[3] if raster == "pallas" else None

    # ---- screen-space post on the row-sharded full frame ----
    if bloom:
        hdr = post.bloom(frame[..., :3], bloom_threshold, bloom_strength)
        frame = jnp.concatenate(
            [tonemap_reinhard_gamma(hdr), frame[..., 3:4]], axis=-1)
    frame = post.resolve_supersample(frame, ss)
    depth_out = depth[::ss, ::ss]
    tri_out = tri_id[::ss, ::ss]
    if upscale_params is not None:
        # neural 2× reconstruction on the row-sharded half-res frame
        # (semantics identical to render_frame's single-chip block)
        from trident_tpu.ai.upscaler import apply_upscaler, temporal_from_prev

        temporal = temporal_from_prev(upscale_params, prev, depth_out,
                                      camera, width * 2, height * 2)
        rgb = apply_upscaler(upscale_params, frame[..., :3], temporal,
                             depth=depth_out)
        alpha = jnp.repeat(jnp.repeat(frame[..., 3:4], 2, axis=0), 2, axis=1)
        frame = jnp.concatenate([rgb, alpha], axis=-1)
        depth_out = jnp.repeat(jnp.repeat(depth_out, 2, axis=0), 2, axis=1)
        tri_out = jnp.repeat(jnp.repeat(tri_out, 2, axis=0), 2, axis=1)
    frame = jnp.clip(apply_ai_blend(frame, ai), 0.0, 1.0)
    return FrameOutput(color=pack_rgba8(frame),
                       depth=depth_out, tri_id=tri_out,
                       aux=aux)


def render_frame_banded_bundled(mesh: Mesh, axis: str, geometry, plan,
                                tri_draw, f32, i32, textures, skybox,
                                ai_image, corner_t=None, upscale_params=None,
                                prev=None, *, shape,
                                width: int, height: int, clear_color,
                                raster: str, skinned: bool, chunk: int = 64,
                                sampling: str = "bilinear",
                                vertex_colors: bool = False,
                                plane_f16: bool = False,
                                forward_shading: bool = True,
                                shadow_size: int = 0,
                                shadow_pcf: bool = False,
                                supersample: int = 1, bloom: bool = False,
                                bloom_threshold: float = 1.0,
                                bloom_strength: float = 0.6,
                                shader_fn=None, kcfg=None) -> FrameOutput:
    """render_frame_banded with every per-frame host value arriving in the
    TWO packed blobs of render/bundle.py — the interactive multi-chip
    path. The unbundled variant was shipping ~13 separate host arrays per
    frame; at the measured ~0.6 ms/upload that is ~8 ms of pure upload
    the single-chip path had already eliminated (CLAUDE.md dispatch
    finding). Unpacking is free slicing inside the jitted graph; shadow
    bias and the AI blend arrive traced (shadow_bias enters the shard_map
    as an explicit replicated arg)."""
    from trident_tpu.render.bundle import unpack_frame
    from trident_tpu.render.types import AiBlend

    (params, palette, shade_table, camera, lights, light_cam, ai_blend,
     shadow_bias) = unpack_frame(f32, i32, shape)
    ai = AiBlend(image=ai_image, blend=ai_blend)
    return render_frame_banded(
        mesh, axis, geometry, plan, tri_draw, params, palette, shade_table,
        camera, lights, textures, skybox, ai,
        light_camera=light_cam if shadow_size else None,
        corner_t=corner_t, width=width, height=height,
        clear_color=clear_color, raster=raster, skinned=skinned,
        chunk=chunk, sampling=sampling, vertex_colors=vertex_colors,
        plane_f16=plane_f16, forward_shading=forward_shading,
        shadow_size=shadow_size, shadow_bias=shadow_bias,
        shadow_pcf=shadow_pcf, supersample=supersample, bloom=bloom,
        bloom_threshold=bloom_threshold, bloom_strength=bloom_strength,
        upscale_params=upscale_params, prev=prev, shader_fn=shader_fn)
