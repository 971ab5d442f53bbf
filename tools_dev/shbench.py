#!/usr/bin/env python
"""Shadow-pass cost decomposition on hardware (round 5, VERDICT item 5).

shadows1080 sits at 19.44 FPS vs the ≥25 target; the two-pass graph has
never been split. On the REAL bench scene (110k sphere grid + backdrop +
angled sun) this times:

  light   — render_shadow_map end-to-end (corner geometry at the light
            view + binning + depth-only visibility at 1024²)
  factor  — shadow_factor at 1080p (world reconstruction + 1 or 4 taps)
  main0   — the full frame with shadow_size=0 (no light pass, no factor)
  main1   — the full frame with the shadow pass (= the bench number)

main1 - main0 vs light + factor says how much the two-pass graph hides
under XLA overlap; light's internal split comes from the KB-style
chained stages (geom / bins / kernel) if SH_STAGES=1.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/shbench.py
Env: SH_ITERS=30, SH_CONFIGS=light,factor,main0,main1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import build_scene
    from trident_tpu.ecs.components import LightComponent, LightType
    from trident_tpu.ops.shadow import (
        ShadowParams, light_camera, render_shadow_map, scene_bounds,
        shadow_factor,
    )
    from trident_tpu.render.frame import (
        build_draw_params, gather_mesh_draws, geometry_to_device,
    )
    from trident_tpu.render.lights import gather_lights
    from trident_tpu.render.renderer import render_frame
    from trident_tpu.render.types import AiBlend, CameraParams, SkyboxCube

    iters = int(os.environ.get("SH_ITERS", "30"))
    renderer, reg, (w, h) = build_scene("shadows1080")
    packed = renderer.geometry.packed()
    geo = geometry_to_device(packed)
    records = gather_mesh_draws(reg, renderer.geometry)
    plan, tri_draw = renderer._plan_cache.plan(packed, records,
                                               renderer.geometry.version)
    params, palette, shade = build_draw_params(
        records, plan.num_draws,
        material_table=renderer.geometry.material_table())
    lights = gather_lights(reg)
    tex = renderer.textures.device_arrays()
    cam = renderer.editor_camera.params()
    sky = SkyboxCube(faces=jnp.zeros((6, 1, 1, 3), jnp.float32),
                     valid=jnp.asarray(False))
    ai = AiBlend(image=jnp.zeros((1, 1, 3), jnp.float32),
                 blend=jnp.asarray(0.0, jnp.float32))
    corner_t = renderer._plan_cache.corner_table(packed)
    stride_kw = renderer._stride_kwargs(skinned=False)
    size = renderer.config.render.shadow_map_size
    light_cam = None
    for _e, (lc,) in reg.view(LightComponent):
        if (lc.enabled and lc.light_type == LightType.DIRECTIONAL
                and lc.cast_shadows):
            center, radius = scene_bounds(records, packed)
            light_cam = light_camera(lc.direction, center, radius)
            break
    assert light_cam is not None
    print(f"backend={jax.default_backend()} {w}x{h} map={size}² "
          f"iters={iters} ACC={os.environ.get('TRIDENT_ACC', '1')}",
          flush=True)

    def timed(label, f, *args):
        out = f(*args, jnp.zeros((), jnp.float32))
        np.asarray(out)
        t0 = time.perf_counter()
        tok = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            tok = f(*args, tok)
        np.asarray(tok)
        ms = (time.perf_counter() - t0) / iters * 1000.0
        print(f"{label}: {ms:.2f} ms/call", flush=True)

    cfgs = os.environ.get("SH_CONFIGS", "light,factor,main0,main1").split(",")

    draw_stride = stride_kw.get("draw_stride", 0)
    real_draws = stride_kw.get("real_draws", 0)

    if "light" in cfgs:
        timed("light(shadow_map)", jax.jit(lambda tok: render_shadow_map(
            geo, plan, params,
            CameraParams(light_cam.view, light_cam.proj,
                         light_cam.position + tok * 0),
            palette, size, skinned=False, corner_t=corner_t,
            tri_draw=tri_draw, draw_stride=draw_stride,
            real_draws=real_draws).ravel()[0] * 0.0))

    if "factor" in cfgs:
        depth_map = render_shadow_map(
            geo, plan, params, light_cam, palette, size, skinned=False,
            corner_t=corner_t, tri_draw=tri_draw, draw_stride=draw_stride,
            real_draws=real_draws)
        hp = jax.lax.Precision.HIGHEST
        lvp = jnp.matmul(light_cam.proj, light_cam.view, precision=hp)
        sp = ShadowParams(depth=depth_map, light_vp=lvp,
                          enabled=jnp.asarray(True),
                          bias=jnp.asarray(2e-3, jnp.float32))
        # screen-COHERENT world positions (what a real frame reconstructs:
        # neighbors map to neighboring shadow texels) + a random-world
        # adversarial case. The r5hw2 110.6/86.1 ms numbers were the
        # random world — they overstate the in-frame gather cost and are
        # the worst case for the MXU path's block windows.
        yy = jnp.linspace(-15.0, 15.0, h)[:, None] * jnp.ones((1, w))
        xx = jnp.ones((h, 1)) * jnp.linspace(-15.0, 15.0, w)[None, :]
        bump = jnp.sin(xx * 0.7) * jnp.cos(yy * 0.5)
        world = jnp.stack([xx, bump, yy], axis=-1).astype(jnp.float32)
        world_rnd = jax.random.uniform(jax.random.PRNGKey(0), (h, w, 3),
                                       jnp.float32, -20.0, 20.0)
        from trident_tpu.ops import kernel_knobs

        for mxu in (False, True):
            with kernel_knobs.overrides(shadow_mxu=mxu):
                tag = "mxu" if mxu else "gather"
                timed(f"factor(hard,{tag})", jax.jit(
                    lambda wd, tok: shadow_factor(
                        sp, wd + tok, pcf=False).ravel()[0] * 0.0), world)
                timed(f"factor(pcf,{tag})", jax.jit(
                    lambda wd, tok: shadow_factor(
                        sp, wd + tok, pcf=True).ravel()[0] * 0.0), world)
                timed(f"factor(hard,{tag},random)", jax.jit(
                    lambda wd, tok: shadow_factor(
                        sp, wd + tok, pcf=False).ravel()[0] * 0.0),
                    world_rnd)

    # NOTE: the r5hw2 run consumed .depth[0,0], which DCE'd the entire
    # shade (incl. the factor) — main0/main1 both read 8.7 ms = the
    # visibility side only. Consuming a COLOR reduction keeps the full
    # frame alive.
    for name, ssize in (("main0", 0), ("main1", size)):
        if name not in cfgs:
            continue
        lc_arg = light_cam if ssize else None
        timed(f"{name}(frame, shadow={bool(ssize)})",
              jax.jit(lambda tok, _s=ssize, _l=lc_arg: jnp.sum(render_frame(
                  geo, plan, tri_draw, params, palette, shade,
                  CameraParams(cam.view, cam.proj, cam.position + tok * 0),
                  lights, tex, sky, ai, light_camera=_l, corner_t=corner_t,
                  width=w, height=h,
                  clear_color=tuple(renderer.config.render.clear_color),
                  raster="pallas", chunk=64, skinned=False, shadow_size=_s,
                  **stride_kw).color.astype(jnp.float32)) * 0.0))


if __name__ == "__main__":
    main()
