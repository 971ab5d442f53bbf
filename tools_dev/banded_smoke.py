"""Dev smoke: banded SPMD render vs single-chip, all raster flavors."""
import jax

jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from trident_tpu.core.config import EngineConfig, RenderConfig
from trident_tpu.ecs.components import (
    MeshComponent, TextureComponent, TransformComponent)
from trident_tpu.ecs.registry import Registry
from trident_tpu.geometry.primitives import PrimitiveType
from trident_tpu.io.image import checkerboard
from trident_tpu.render.renderer import Renderer, render_frame
from trident_tpu.render.frame import (
    build_draw_params, build_draw_plan, gather_mesh_draws, geometry_to_device)
from trident_tpu.render.lights import gather_lights
from trident_tpu.render.types import AiBlend, SkyboxCube
from trident_tpu.parallel.framebuffer import render_frame_banded

w, h = 128, 128
r = Renderer(EngineConfig(render=RenderConfig(width=w, height=h,
                                              use_pallas=False)))
reg = Registry()
r.set_active_registry(reg)
slot = r.acquire_texture("checker", checkerboard(32, 4))
for pos in ([0, 0, 0], [1.2, 0.4, -0.6], [-1.1, -0.4, 0.4]):
    e = reg.create()
    t = reg.add(e, TransformComponent())
    t.position = np.array(pos, np.float32)
    reg.add(e, MeshComponent(mesh_index=r.ensure_primitive(PrimitiveType.CUBE)))
    reg.add(e, TextureComponent(path="checker", slot=slot))
r.editor_camera.set_position([0, 0.8, 4])
r.editor_camera.look_at_target([0, 0, 0])

packed = r.geometry.packed()
geo = geometry_to_device(packed)
records = gather_mesh_draws(reg, r.geometry)
plan, tri_draw = build_draw_plan(packed, records)
params, palette, shade = build_draw_params(
    records, plan.num_draws, material_table=r.geometry.material_table())
lights = gather_lights(reg)
tex = r.textures.device_arrays()
cam = r.editor_camera.params()
sky = SkyboxCube(faces=jnp.zeros((6, 1, 1, 3), jnp.float32),
                 valid=jnp.asarray(False))
ai = AiBlend(image=jnp.zeros((1, 1, 3), jnp.float32),
             blend=jnp.asarray(0.0, jnp.float32))
mesh = Mesh(np.array(jax.devices()[:4]), ("fb",))

for raster in ("ref", "pallas"):
    for fw in ((False, True) if raster == "pallas" else (False,)):
        out = render_frame_banded(
            mesh, "fb", geo, plan, tri_draw, params, palette, shade,
            cam, lights, tex, sky, ai, width=w, height=h,
            clear_color=(0.05, 0.05, 0.08, 1.0), raster=raster,
            skinned=False, forward_shading=fw)
        banded = np.asarray(out.color)
        s = render_frame(
            geo, plan, tri_draw, params, palette, shade, cam, lights, tex,
            sky, ai, width=w, height=h,
            clear_color=(0.05, 0.05, 0.08, 1.0), raster=raster, chunk=64,
            skinned=False, plane_f16=False, forward_shading=fw)
        sc = np.asarray(s.color)
        diff = np.abs(banded.astype(int) - sc.astype(int))
        print(f"raster={raster} fw={fw}: max diff={diff.max()}, "
              f"npx>0: {(diff > 0).sum()}, "
              f"covered={int((np.asarray(out.tri_id) >= 0).sum())}")
print("OK")
