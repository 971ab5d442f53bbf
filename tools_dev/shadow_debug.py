"""Debug CPU-vs-TPU shadow divergence: dump per-stage arrays per backend.

Usage: [JAX_PLATFORMS=cpu] python tools_dev/shadow_debug.py /tmp/dbg_cpu.npz
Then compare the two npz files.
"""
import os
import sys

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

from trident_tpu.core.config import EngineConfig, RenderConfig
from trident_tpu.ecs import (
    MeshComponent, Registry, TextureComponent, TransformComponent)
from trident_tpu.ecs.components import LightComponent, LightType
from trident_tpu.geometry.primitives import PrimitiveType
from trident_tpu.io.image import checkerboard
from trident_tpu.ops.shadow import light_camera, render_shadow_map, scene_bounds
from trident_tpu.render.frame import (
    build_draw_params, gather_mesh_draws, geometry_to_device)
from trident_tpu.render.renderer import Renderer

out_path = sys.argv[1]

r = Renderer(EngineConfig(render=RenderConfig(width=512, height=512,
                                              shadows=True)))
reg = Registry()
r.set_active_registry(reg)
slot = r.acquire_texture("checker", checkerboard(128, 8))
e = reg.create()
t = reg.add(e, TransformComponent())
t.rotation = np.array([25., 40., 0.], np.float32)
reg.add(e, MeshComponent(mesh_index=r.ensure_primitive(PrimitiveType.CUBE)))
reg.add(e, TextureComponent(path="checker", slot=slot))
g = reg.create()
tg = reg.add(g, TransformComponent())
tg.position = np.array([0., -1.2, 0.], np.float32)
tg.scale = np.array([6., 0.1, 6.], np.float32)
reg.add(g, MeshComponent(mesh_index=r.ensure_primitive(PrimitiveType.CUBE)))
sun = reg.create()
reg.add(sun, TransformComponent())
reg.add(sun, LightComponent(light_type=LightType.DIRECTIONAL,
                            direction=np.array([-0.4, -1.0, -0.3], np.float32),
                            cast_shadows=True))
r.editor_camera.set_position([0, 0.8, 3.2])
r.editor_camera.look_at_target([0, 0, 0])

packed = r.geometry.packed()
geo = geometry_to_device(packed)
records = gather_mesh_draws(reg, r.geometry)
plan, tri_draw = r._plan_cache.plan(packed, records, r.geometry.version)
params, palette, shade = build_draw_params(
    records, plan.num_draws, material_table=r.geometry.material_table())
center, radius = scene_bounds(records, packed)
light_cam = light_camera(np.array([-0.4, -1.0, -0.3], np.float32),
                         center, radius)

dump = {"center": center, "radius": np.float32(radius),
        "light_view": np.asarray(light_cam.view),
        "light_proj": np.asarray(light_cam.proj)}
for raster in ("pallas", "ref"):
    if raster == "pallas" and jax.default_backend() == "cpu":
        smap = render_shadow_map(geo, plan, params, light_cam, palette,
                                 1024, False, "pallas")
    else:
        smap = render_shadow_map(geo, plan, params, light_cam, palette,
                                 1024, False, raster)
    dump[f"shadow_{raster}"] = np.asarray(smap)

# main-view frame both rasters
for use_pallas, name in ((True, "pallas"), (False, "ref")):
    r.config.render.use_pallas = use_pallas
    frame = r.read_frame()
    dump[f"frame_{name}"] = frame
    dump[f"depth_{name}"] = np.asarray(
        r.viewports[0].last_frame.depth)

np.savez(out_path, **dump)
print("backend:", jax.default_backend())
for k, v in dump.items():
    print(k, getattr(v, "shape", v))
