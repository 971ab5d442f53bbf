#!/usr/bin/env python
"""Benchmark: frames/s through the full render pipeline on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is 60 FPS at 1080p on a 1M-triangle scene on one v5e. vs_baseline is
therefore FPS/60 for the current benchmark config.

Config selection via BENCH_CONFIG env: "cube512" (default; BASELINE.json
config 1) or "spheres1080" (toward configs 2/5).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def build_scene(config: str):
    from trident_tpu.core.config import EngineConfig, RenderConfig
    from trident_tpu.ecs.components import MeshComponent, TransformComponent
    from trident_tpu.ecs.registry import Registry
    from trident_tpu.geometry.primitives import PrimitiveType
    from trident_tpu.io.image import checkerboard
    from trident_tpu.render.renderer import Renderer

    if config == "spheres1080":
        w, h = 1920, 1080
        grid = 8
    else:
        w, h = 512, 512
        grid = 1

    cfg = EngineConfig(render=RenderConfig(width=w, height=h))
    r = Renderer(cfg)
    reg = Registry()
    r.set_active_registry(reg)

    slot = r.acquire_texture("checker", checkerboard(128, 8))
    from trident_tpu.ecs.components import TextureComponent

    if config == "spheres1080":
        mesh_idx = r.ensure_primitive(PrimitiveType.SPHERE)
        for i in range(grid):
            for j in range(grid):
                e = reg.create()
                t = reg.add(e, TransformComponent())
                t.position = np.array([(i - grid / 2) * 1.5, (j - grid / 2) * 1.5, 0],
                                      np.float32)
                reg.add(e, MeshComponent(mesh_index=mesh_idx))
                reg.add(e, TextureComponent(path="checker", slot=slot))
        r.editor_camera.set_position([0, 0, grid * 1.2])
    else:
        mesh_idx = r.ensure_primitive(PrimitiveType.CUBE)
        e = reg.create()
        t = reg.add(e, TransformComponent())
        reg.add(e, MeshComponent(mesh_index=mesh_idx))
        reg.add(e, TextureComponent(path="checker", slot=slot))
        r.editor_camera.set_position([0, 0, 3])
    r.editor_camera.look_at_target([0, 0, 0])
    return r, reg, (w, h)


def main() -> None:
    import jax

    config = os.environ.get("BENCH_CONFIG", "cube512")
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))

    renderer, registry, (w, h) = build_scene(config)

    # animate rotation so per-frame params actually change
    from trident_tpu.ecs.components import TransformComponent
    entities = [e for e, _ in registry.view(TransformComponent)]

    def step(angle: float):
        for e in entities:
            registry.get(e, TransformComponent).rotation = np.array(
                [angle * 0.4, angle, 0.0], np.float32)
        return renderer.render_viewport(0)

    for i in range(warmup):
        out = step(i * 3.0)
    jax.block_until_ready(out.color)

    t0 = time.perf_counter()
    for i in range(iters):
        out = step(30.0 + i * 3.0)
    jax.block_until_ready(out.color)
    dt = time.perf_counter() - t0

    fps = iters / dt
    mpix = fps * w * h / 1e6
    print(json.dumps({
        "metric": f"render_fps_{config}_{w}x{h}",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
        "extra": {"mpix_per_s": round(mpix, 1),
                  "triangles": renderer.stats_triangles,
                  "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
