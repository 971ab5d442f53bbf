"""SPMD: banded framebuffer rendering + sharded train step on the virtual
8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trident_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def build_scene(w, h):
    from trident_tpu.core.config import EngineConfig, RenderConfig
    from trident_tpu.ecs.components import MeshComponent, TextureComponent, TransformComponent
    from trident_tpu.ecs.registry import Registry
    from trident_tpu.geometry.primitives import PrimitiveType
    from trident_tpu.io.image import checkerboard
    from trident_tpu.render.renderer import Renderer

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
    return r


def test_banded_render_matches_single(eight_devices):
    from jax.sharding import Mesh
    from trident_tpu.parallel.framebuffer import render_frame_banded
    from trident_tpu.render.frame import (
        build_draw_params, build_draw_plan, gather_mesh_draws, geometry_to_device,
    )
    from trident_tpu.render.lights import gather_lights
    from trident_tpu.render.types import AiBlend, SkyboxCube

    w, h = 128, 128
    r = build_scene(w, h)
    # pin exact f32 planes on the single-frame side: the banded path builds
    # planes per band (f32 default), and this test checks the SPMD
    # decomposition, not plane quantization (covered by test_texturing)
    r.config.render.plane_f16 = False
    single = r.read_frame()

    packed = r.geometry.packed()
    geo = geometry_to_device(packed)
    records = gather_mesh_draws(r.registry, r.geometry)
    plan, tri_draw = build_draw_plan(packed, records)
    params, palette, shade = build_draw_params(
        records, plan.num_draws, material_table=r.geometry.material_table())
    lights = gather_lights(r.registry)
    tex = r.textures.device_arrays()
    cam = r.editor_camera.params()
    sky = SkyboxCube(faces=jnp.zeros((6, 1, 1, 3), jnp.float32),
                     valid=jnp.asarray(False))
    ai = AiBlend(image=jnp.zeros((1, 1, 3), jnp.float32),
                 blend=jnp.asarray(0.0, jnp.float32))

    mesh = Mesh(np.array(eight_devices[:4]), ("fb",))
    out = render_frame_banded(
        mesh, "fb", geo, plan, tri_draw, params, palette, shade, cam,
        lights, tex, sky, ai, width=w, height=h,
        clear_color=(0.05, 0.05, 0.08, 1.0), raster="ref", skinned=False)
    banded = np.asarray(out.color)
    assert banded.shape == single.shape
    diff = np.abs(banded.astype(int) - single.astype(int))
    # identical up to float noise at band seams (≤1 LSB on a few pixels)
    assert (diff > 1).mean() < 0.001
    assert diff.max() <= 30  # no structural divergence


def test_unet_dryrun_multichip(eight_devices):
    from trident_tpu.parallel.dryrun import run_dryrun

    run_dryrun(8)
