"""In-kernel resolve pass (ops/resolve_pallas.py) vs the plane-gather path.

Both shade the SAME visibility output, so the resolved attribute image
must reproduce the gather path's frame up to fma-reassociation noise —
run via the interpreter on CPU (production binning + kernel logic).
"""

import numpy as np

import jax.numpy as jnp

from trident_tpu.core.config import EngineConfig, RenderConfig
from trident_tpu.ecs import (
    MeshComponent,
    Registry,
    TextureComponent,
    TransformComponent,
)
from trident_tpu.geometry.primitives import PrimitiveType
from trident_tpu.io.image import checkerboard
from trident_tpu.render.renderer import Renderer


def _scene(forward: bool, sampling="bilinear", w=256, h=128):
    cfg = EngineConfig(render=RenderConfig(
        width=w, height=h, use_pallas=True, sampling=sampling,
        plane_f16=False, forward_shading=forward))
    r = Renderer(cfg)
    reg = Registry()
    r.set_active_registry(reg)
    slot = r.acquire_texture("checker", checkerboard(64, 8))
    for i, (kind, x) in enumerate([(PrimitiveType.CUBE, -0.9),
                                   (PrimitiveType.SPHERE, 0.9)]):
        e = reg.create()
        t = reg.add(e, TransformComponent())
        t.position = np.array([x, 0.0, 0.0], np.float32)
        t.rotation = np.array([20.0, 30.0 + 40.0 * i, 0.0], np.float32)
        reg.add(e, MeshComponent(mesh_index=r.ensure_primitive(kind)))
        reg.add(e, TextureComponent(path="checker", slot=slot))
    r.editor_camera.set_position([0, 0.7, 3.4])
    r.editor_camera.look_at_target([0, 0, 0])
    return r


def test_forward_matches_gather_bilinear():
    fwd = _scene(True).read_frame().astype(np.int32)
    gat = _scene(False).read_frame().astype(np.int32)
    diff = np.abs(fwd - gat)
    # identical visibility; interpolants recomputed with different fma
    # order — allow a couple of 8-bit LSB on a tiny fraction of pixels
    assert diff.max() <= 3, diff.max()
    assert (diff > 1).mean() < 0.002


def test_forward_matches_gather_trilinear_ssaa():
    def scene(forward):
        cfg = EngineConfig(render=RenderConfig(
            width=128, height=128, use_pallas=True, sampling="trilinear",
            plane_f16=False, forward_shading=forward, supersample=2))
        r = Renderer(cfg)
        reg = Registry()
        r.set_active_registry(reg)
        slot = r.acquire_texture("checker", checkerboard(64, 8))
        e = reg.create()
        t = reg.add(e, TransformComponent())
        t.rotation = np.array([25.0, 40.0, 0.0], np.float32)
        reg.add(e, MeshComponent(
            mesh_index=r.ensure_primitive(PrimitiveType.CUBE)))
        reg.add(e, TextureComponent(path="checker", slot=slot))
        r.editor_camera.set_position([0, 0.8, 3.2])
        r.editor_camera.look_at_target([0, 0, 0])
        return r.read_frame().astype(np.int32)

    diff = np.abs(scene(True) - scene(False))
    assert diff.max() <= 3, diff.max()
    assert (diff > 1).mean() < 0.002
