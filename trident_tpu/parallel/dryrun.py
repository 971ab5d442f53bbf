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
