"""Multi-chip dry-run: the full interpolation-net training step jitted over
a (dp, tp) mesh with real shardings, one step on tiny shapes.

Run by the driver under a virtual CPU mesh
(--xla_force_host_platform_device_count=N) to validate the SPMD path
compiles and executes without N physical chips.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from trident_tpu.ai.train import TrainConfig, create_state, train_step
from trident_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
)


def run_dryrun(n_devices: int, resolution=(32, 32), batch_per_device: int = 1,
               base_channels: int = 8) -> None:
    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)} "
            f"(set XLA_FLAGS=--xla_force_host_platform_device_count={n_devices})")
    mesh = make_mesh(n_devices)
    dp = mesh.shape["dp"]

    config = TrainConfig(resolution=resolution, base_channels=base_channels,
                         batch_size=dp * batch_per_device)
    state = create_state(config)

    # placement: params/optimizer channel-sharded over tp, stats likewise,
    # batch sharded over dp
    p_shard = param_sharding(mesh, state.params)
    bs_shard = param_sharding(mesh, state.batch_stats)
    opt_shard = jax.tree.map(
        lambda leaf: param_sharding(mesh, leaf) if isinstance(leaf, dict) else replicated(mesh),
        state.opt_state, is_leaf=lambda x: isinstance(x, dict))

    state = state.replace(
        params=jax.device_put(state.params, p_shard),
        batch_stats=jax.device_put(state.batch_stats, bs_shard),
        opt_state=jax.tree.map(jax.device_put, state.opt_state,
                               jax.tree.map(lambda _: replicated(mesh), state.opt_state)),
    )

    b = config.batch_size
    h, w = resolution
    rng = np.random.default_rng(0)
    inputs = jax.device_put(rng.random((b, h, w, 6), np.float32),
                            batch_sharding(mesh, 4))
    targets = jax.device_put(rng.random((b, h, w, 3), np.float32),
                             batch_sharding(mesh, 4))

    step = jax.jit(train_step, static_argnames=("axis_name",))
    with mesh:
        new_state, loss, out = step(state, inputs, targets, axis_name=None)
        jax.block_until_ready(loss)

    assert np.isfinite(float(loss)), f"non-finite loss {loss}"
    assert out.shape == (b, h, w, 3)
    print(f"dryrun_multichip OK: mesh={dict(mesh.shape)} loss={float(loss):.4f} "
          f"out={out.shape}")

    _dryrun_banded_render(n_devices)


def _dryrun_banded_render(n_devices: int, size: int = 64) -> None:
    """Also exercise the SPMD renderer: framebuffer bands over a 1-D mesh."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from trident_tpu.core.config import EngineConfig, RenderConfig
    from trident_tpu.ecs.components import MeshComponent, TransformComponent
    from trident_tpu.ecs.registry import Registry
    from trident_tpu.geometry.primitives import PrimitiveType
    from trident_tpu.parallel.framebuffer import render_frame_banded
    from trident_tpu.render.frame import (
        build_draw_params, build_draw_plan, gather_mesh_draws, geometry_to_device,
    )
    from trident_tpu.render.lights import gather_lights
    from trident_tpu.render.renderer import Renderer
    from trident_tpu.render.types import AiBlend, SkyboxCube

    r = Renderer(EngineConfig(render=RenderConfig(width=size, height=size,
                                                  use_pallas=False)))
    reg = Registry()
    r.set_active_registry(reg)
    e = reg.create()
    reg.add(e, TransformComponent())
    reg.add(e, MeshComponent(mesh_index=r.ensure_primitive(PrimitiveType.CUBE)))
    r.editor_camera.set_position([0, 0, 3])
    r.editor_camera.look_at_target([0, 0, 0])

    packed = r.geometry.packed()
    geo = geometry_to_device(packed)
    records = gather_mesh_draws(reg, r.geometry)
    plan, tri_draw = build_draw_plan(packed, records)
    params, palette, shade = build_draw_params(
        records, plan.num_draws, material_table=r.geometry.material_table())
    lights = gather_lights(reg)
    tex = r.textures.device_arrays()
    sky = SkyboxCube(faces=jnp.zeros((6, 1, 1, 3), jnp.float32),
                     valid=jnp.asarray(False))
    ai = AiBlend(image=jnp.zeros((1, 1, 3), jnp.float32),
                 blend=jnp.asarray(0.0, jnp.float32))

    fb_mesh = Mesh(np.asarray(jax.devices()[:n_devices]), ("fb",))
    out = render_frame_banded(
        fb_mesh, "fb", geo, plan, tri_draw, params, palette, shade,
        r.editor_camera.params(), lights, tex, sky, ai,
        width=size, height=size, clear_color=(0.05, 0.05, 0.08, 1.0),
        raster="ref", skinned=False)
    color = np.asarray(out.color)
    assert color.shape == (size, size, 4)
    covered = int((np.asarray(out.tri_id) >= 0).sum())
    assert covered > 0, "banded render drew nothing"
    print(f"dryrun banded render OK: {n_devices} bands, covered px={covered}")
