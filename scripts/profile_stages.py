"""Per-stage pipeline profiler for the tunneled TPU.

Timing methodology: the axon backend evaluates lazily and each host
readback costs a ~25 ms tunnel RTT, so neither `block_until_ready` nor
per-iteration forcing measures compute. Stages are therefore CHAINED on
device (iteration i's input depends on iteration i-1's output token) and
forced ONCE at the end. See PERF.md for the numbers this produced.

    PYTHONPATH=.:$PYTHONPATH python scripts/profile_stages.py [--scale {small,mid,large,all}]
"""
from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit_chain(name, f, token_out, *args, n=10):
    tok = jnp.zeros((), jnp.float32)
    np.asarray(token_out(f(tok, *args)))          # compile + run once
    t0 = time.perf_counter()
    tok = jnp.zeros((), jnp.float32)
    for _ in range(n):
        tok = token_out(f(tok, *args))
    np.asarray(tok)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"  {name}: {ms:.2f} ms/iter (chained x{n})", flush=True)


def build_scene(width, height, grid):
    from trident_tpu.core.config import EngineConfig, RenderConfig
    from trident_tpu.ecs import (
        MeshComponent, Registry, TextureComponent, TransformComponent,
    )
    from trident_tpu.geometry.primitives import PrimitiveType
    from trident_tpu.io.image import checkerboard
    from trident_tpu.render.renderer import Renderer

    r = Renderer(EngineConfig(render=RenderConfig(
        width=width, height=height, texture_size=128)))
    reg = Registry()
    r.set_active_registry(reg)
    slot = r.acquire_texture("checker", checkerboard(128, 8))
    mesh_idx = r.ensure_primitive(PrimitiveType.SPHERE)
    for i in range(grid):
        for j in range(grid):
            e = reg.create()
            t = reg.add(e, TransformComponent())
            t.position = np.array(
                [(i - grid / 2) * 1.4, (j - grid / 2) * 1.4, 0], np.float32)
            reg.add(e, MeshComponent(mesh_index=mesh_idx))
            reg.add(e, TextureComponent(path="checker", slot=slot))
    r.editor_camera.set_position([0, 0, grid * 1.1 + 2])
    r.editor_camera.look_at_target([0, 0, 0])
    return r, reg


def profile(width, height, grid, label, n=10):
    from trident_tpu.ops.deferred import deferred_shade
    from trident_tpu.ops.planes import build_planes
    from trident_tpu.ops.raster_pallas import build_bins, visibility_pallas
    from trident_tpu.ops.vertex import triangle_setup, vertex_stage
    from trident_tpu.render.frame import (
        build_draw_params, gather_mesh_draws, geometry_to_device,
    )
    from trident_tpu.render.lights import gather_lights
    from trident_tpu.render.renderer import render_frame
    from trident_tpu.render.types import AiBlend, CameraParams, SkyboxCube

    r, reg = build_scene(width, height, grid)
    packed = r.geometry.packed()
    geo = geometry_to_device(packed)
    records = gather_mesh_draws(reg, r.geometry)
    plan, tri_draw = r._plan_cache.plan(packed, records, r.geometry.version)
    params, palette, shade = build_draw_params(
        records, plan.num_draws, material_table=r.geometry.material_table())
    lights = gather_lights(reg)
    tex = r.textures.device_arrays()
    cam = r.editor_camera.params()
    sky = SkyboxCube(faces=jnp.zeros((6, 1, 1, 3), jnp.float32),
                     valid=jnp.asarray(False))
    ai = AiBlend(image=jnp.zeros((1, 1, 3), jnp.float32),
                 blend=jnp.asarray(0.0, jnp.float32))
    print(f"--- {label}: tris(pad)={plan.tri_vtx.shape[0]} "
          f"TV={plan.vtx_src.shape[0]} ---", flush=True)

    f1 = jax.jit(lambda tok, g, p, pr, c, pa: vertex_stage(
        g, p, pr, CameraParams(c.view, c.proj, c.position + tok * 0), pa,
        skinned=False))
    timeit_chain("vertex", f1, lambda o: o.clip[0, 0] * 0,
                 geo, plan, params, cam, palette, n=n)
    verts = f1(jnp.zeros(()), geo, plan, params, cam, palette)

    f2 = jax.jit(lambda tok, c, tv, va: triangle_setup(
        c + tok * 0, tv, va, width, height))
    timeit_chain("setup", f2, lambda o: o.edge[0, 0, 0] * 0,
                 verts.clip, plan.tri_vtx, plan.tri_valid, n=n)
    setup = f2(jnp.zeros(()), verts.clip, plan.tri_vtx, plan.tri_valid)

    f3 = jax.jit(lambda tok, s: build_bins(
        s._replace(edge=s.edge + tok * 0), width, height))
    timeit_chain("bins", f3, lambda o: o.pair_tile[0].astype(jnp.float32) * 0,
                 setup, n=n)
    b = f3(jnp.zeros(()), setup)
    print(f"  pairs={int(b.n_real)}/{b.n_pairs} aux={np.asarray(b.aux)}",
          flush=True)

    f4 = jax.jit(lambda tok, s: visibility_pallas(
        s._replace(edge=s.edge + tok * 0), width, height))
    timeit_chain("visibility(incl bins)", f4, lambda o: o.depth[0, 0] * 0,
                 setup, n=n)
    gbuf = f4(jnp.zeros(()), setup)

    fpl = jax.jit(lambda tok, s: build_planes(
        s._replace(edge=s.edge + tok * 0), verts, plan.tri_vtx, tri_draw, shade))
    timeit_chain("planes", fpl, lambda o: o.table_a[0, 0] * 0, setup, n=n)
    planes = fpl(jnp.zeros(()), setup)

    for mode in ("bilinear", "nearest"):
        f5 = jax.jit(lambda tok, g, p, _m=mode: deferred_shade(
            g._replace(depth=g.depth + tok * 0), p, tex, cam, lights,
            width, height, skybox=sky, ai=ai, sampling=_m))
        timeit_chain(f"deferred[{mode}]", f5, lambda o: o[0, 0, 0] * 0,
                     gbuf, planes, n=n)

    # -- forward (in-kernel resolve) path stages --------------------------------
    from trident_tpu.ops.deferred import deferred_shade_attrs
    from trident_tpu.ops.planes import build_resolve_records
    from trident_tpu.ops.raster_pallas import CHUNK, visibility_pallas_tiled
    from trident_tpu.ops.resolve_pallas import resolve_attrs_pallas

    tex_wh = tex.sizes[params.texture_slot].astype(jnp.float32)
    draw_consts = jnp.concatenate([shade, tex_wh], axis=1)

    frr = jax.jit(lambda tok, s: build_resolve_records(
        s._replace(edge=s.edge + tok * 0), verts, plan.tri_vtx, tri_draw,
        draw_consts, CHUNK))
    # token read works for both record layouts (TR cols are 2-D/3-D stacks)
    timeit_chain("resolve records", frr, lambda o: o.reshape(-1)[0] * 0,
                 setup, n=n)

    def vis_resolve(tok, s):
        s = s._replace(edge=s.edge + tok * 0)
        bins, _dep, tri_tiles, _ = visibility_pallas_tiled(s, width, height)
        rec = build_resolve_records(s, verts, plan.tri_vtx, tri_draw,
                                    draw_consts, CHUNK)
        return resolve_attrs_pallas(bins, tri_tiles, rec, width, height)

    f6 = jax.jit(vis_resolve)
    timeit_chain("vis+records+resolve", f6, lambda o: o[0, 0, 0] * 0,
                 setup, n=n)
    attrs = f6(jnp.zeros(()), setup)

    f7 = jax.jit(lambda tok, g, a: deferred_shade_attrs(
        g._replace(depth=g.depth + tok * 0), a, tex, cam, lights,
        width, height, skybox=sky, ai=ai, sampling="bilinear"))
    timeit_chain("deferred_attrs[bilinear]", f7, lambda o: o[0, 0, 0] * 0,
                 gbuf, attrs, n=n)

    # -- corner-major geometry (the production single-chip path) ---------------
    from trident_tpu.ops.corner import build_draw_rows, corner_stage

    corner_t = r._plan_cache.corner_table(packed)
    dc = draw_consts      # same per-draw consts the resolve path built

    def corner_fn(tok, ct):
        rows = build_draw_rows(params, CameraParams(
            cam.view, cam.proj, cam.position + tok * 0), width, height,
            draw_consts=dc)
        return corner_stage(ct, rows, tri_draw, plan.tri_valid,
                            width, height)

    fc = jax.jit(corner_fn)
    timeit_chain("corner stage (geom+setup+attrs)", fc,
                 lambda o: o.setup.edge[0, 0, 0] * 0, corner_t, n=n)

    stride_kw = r._stride_kwargs(skinned=False)
    for label, fwd, ct, skw in (
            ("gather", False, None, {}), ("forward", True, None, {}),
            ("forward+corner", True, corner_t, {}),
            ("forward+corner+stride", True, corner_t, stride_kw)):
        f_full = jax.jit(lambda tok, _f=fwd, _c=ct, _s=skw: render_frame(
            geo, plan, tri_draw, params, palette, shade,
            CameraParams(cam.view, cam.proj, cam.position + tok * 0),
            lights, tex, sky, ai, corner_t=_c, width=width, height=height,
            clear_color=(0.05, 0.05, 0.08, 1.0), raster="pallas", chunk=64,
            skinned=False, sampling="bilinear", vertex_colors=False,
            forward_shading=_f, **_s))
        timeit_chain(f"FULL[{label}]", f_full,
                     lambda o: o.depth[0, 0] * 0, n=n)
        out = f_full(jnp.zeros(()))
        print(f"  covered={(np.asarray(out.tri_id) >= 0).sum()}", flush=True)

    # -- fused-ablation ladder on the PRODUCTION config: marginal stage
    # costs in the real graph come from differencing consecutive stops
    # (chained stage timings above overlap/fuse differently and mislead —
    # PERF.md round-2 diagnosis)
    for stop in ("draw_rows", "corner", "geom", "bins", "vis",
                 "resolve_tiled", "resolve"):
        f_ab = jax.jit(lambda tok, _p=stop: render_frame(
            geo, plan, tri_draw, params, palette, shade,
            CameraParams(cam.view, cam.proj, cam.position + tok * 0),
            lights, tex, sky, ai, corner_t=corner_t, width=width,
            height=height, clear_color=(0.05, 0.05, 0.08, 1.0),
            raster="pallas", chunk=64, skinned=False, sampling="bilinear",
            vertex_colors=False, forward_shading=True, profile_stop=_p,
            **stride_kw))
        timeit_chain(f"ABLATE[{stop}]", f_ab,
                     lambda o: o.depth[0, 0] * 0, n=n)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale",
                        choices=["small", "mid", "large", "4k", "all"],
                        default="all")
    args = parser.parse_args()
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones(8)))   # warm the backend
    print("warm", flush=True)
    if args.scale in ("small", "all"):
        profile(512, 512, 2, "512p 4 spheres 3k tris")
    if args.scale in ("mid", "all"):
        profile(1920, 1080, 12, "1080p 144 spheres 110k tris")
    if args.scale in ("large", "all"):
        profile(1920, 1080, 36, "1080p 1296 spheres 1M tris", n=5)
    if args.scale == "4k":
        # the ultra4k bench geometry — VERDICT r3 item 5 asked for the
        # fused-ablation ladder at 4K (it had only ever run at 1M/1080p)
        profile(3840, 2160, 36, "4K 1296 spheres 1M tris", n=5)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
