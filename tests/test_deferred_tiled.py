"""Tiled (channel-planar) deferred shading vs the legacy channel-last
path (ops/deferred_tiled.py vs ops/deferred.py).

Same math reassociated elementwise, so frames must agree to fma-fusion
noise — a couple of 8-bit LSB on a tiny pixel fraction, same gate as
the forward-vs-gather parity tests."""

import numpy as np

from trident_tpu.core.config import EngineConfig, RenderConfig
from trident_tpu.ecs import (
    LightComponent,
    MeshComponent,
    Registry,
    TextureComponent,
    TransformComponent,
)
from trident_tpu.geometry.primitives import PrimitiveType
from trident_tpu.io.image import checkerboard
from trident_tpu.render.renderer import Renderer


def _scene(shadows=False, w=256, h=128):
    cfg = EngineConfig(render=RenderConfig(
        width=w, height=h, use_pallas=True, forward_shading=True,
        shadows=shadows, shadow_map_size=256, shadow_pcf=shadows))
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
    lamp = reg.create()
    lt = reg.add(lamp, TransformComponent())
    lt.position = np.array([1.5, 2.0, 2.0], np.float32)
    from trident_tpu.ecs.components import LightType
    reg.add(lamp, LightComponent(light_type=LightType.POINT,
                                 color=np.array([1.0, 0.8, 0.6], np.float32),
                                 intensity=3.0, range=8.0))
    if shadows:
        sun = reg.create()
        reg.add(sun, TransformComponent())
        reg.add(sun, LightComponent(light_type=LightType.DIRECTIONAL,
                                    color=np.ones(3, np.float32),
                                    intensity=1.2))
    r.editor_camera.set_position([0, 0.7, 3.4])
    r.editor_camera.look_at_target([0, 0, 0])
    return r


def _frames(monkeypatch, **kw):
    from trident_tpu.ops import deferred_tiled as dt

    out = {}
    for tiled in (False, True):
        monkeypatch.setattr(dt, "TILED_SHADE", tiled)
        out[tiled] = _scene(**kw).read_frame().astype(np.int32)
    return out


def test_tiled_shade_matches_legacy(monkeypatch):
    f = _frames(monkeypatch)
    diff = np.abs(f[True] - f[False])
    assert diff.max() <= 2, diff.max()
    assert (diff > 1).mean() < 0.002


def test_tiled_shade_matches_legacy_shadows_pcf(monkeypatch):
    f = _frames(monkeypatch, shadows=True)
    diff = np.abs(f[True] - f[False])
    assert diff.max() <= 2, diff.max()
    assert (diff > 1).mean() < 0.002
