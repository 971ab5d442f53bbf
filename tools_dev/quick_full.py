"""Quick FULL-frame timing at 1M/1080p (production path only) + the
dynamic_gather probe — one TPU process.

    PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/quick_full.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones(8)))
    print("warm", flush=True)

    if os.environ.get("PROBE", "0") == "1":
        # RESULT (round 3, v5e): tpu.dynamic_gather rejects tables whose
        # gather dim spans >1 vreg ("Multiple source vregs along gather
        # dimension") — a VMEM texel LUT at real texture sizes cannot
        # lower on this Mosaic. The XLA quad-gather stays the texel path.
        import gather_probe
        gather_probe.main()

    from profile_stages import build_scene
    from trident_tpu.render.frame import (
        build_draw_params, gather_mesh_draws, geometry_to_device,
    )
    from trident_tpu.render.lights import gather_lights
    from trident_tpu.render.renderer import render_frame
    from trident_tpu.render.types import AiBlend, CameraParams, SkyboxCube

    width, height = 1920, 1080
    r, reg = build_scene(width, height, 36)
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
    corner_t = r._plan_cache.corner_table(packed)
    skw = r._stride_kwargs(skinned=False)
    print("stride kwargs:", skw, flush=True)

    f_full = jax.jit(lambda tok: render_frame(
        geo, plan, tri_draw, params, palette, shade,
        CameraParams(cam.view, cam.proj, cam.position + tok * 0),
        lights, tex, sky, ai, corner_t=corner_t, width=width, height=height,
        clear_color=(0.05, 0.05, 0.08, 1.0), raster="pallas", chunk=64,
        skinned=False, **skw))
    n = 15
    tok = jnp.zeros((), jnp.float32)
    np.asarray(f_full(tok).depth[0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        tok = f_full(tok).depth[0, 0] * 0.0
    np.asarray(tok)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"FULL[forward+corner+stride]: {ms:.2f} ms/iter "
          f"({1000.0/ms:.2f} FPS)", flush=True)


if __name__ == "__main__":
    main()
