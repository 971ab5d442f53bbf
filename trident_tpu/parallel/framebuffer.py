"""Multi-chip SPMD rendering: framebuffer bands over a device mesh.

The reference is single-GPU; the TPU-native scaling axis is pixels:
`shard_map` splits the framebuffer into horizontal bands, one per device.
Geometry/draw state replicate (scenes are MBs; framebuffers at 4K are the
big arrays), and each device runs the UNCHANGED single-chip pipeline on its
band through a cropped projection matrix — sort-middle parallelism with no
cross-device communication in the frame loop at all (bands concatenate on
the sharded output axis; XLA inserts nothing but the final layout).

Works on any 1-D mesh axis; the driver validates it on a virtual CPU mesh
(tests/test_parallel.py) and the same code runs on real ICI-connected
chips.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7 public API
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from trident_tpu.render.types import CameraParams, FrameOutput

Array = jax.Array


def crop_projection(proj: Array, y0: Array, y1: Array) -> Array:
    """Projection for the sub-viewport covering ndc-y ∈ [y0, y1]:
    P'[1,:] = (P[1,:] − center·P[3,:]) / halfspan. Works for perspective
    and orthographic RH_ZO matrices."""
    center = (y0 + y1) * 0.5
    halfspan = jnp.maximum((y1 - y0) * 0.5, 1e-8)
    new_row = (proj[1, :] - center * proj[3, :]) / halfspan
    return proj.at[1, :].set(new_row)


def render_frame_banded(mesh: Mesh, axis: str, geometry, plan, tri_draw,
                        params, palette, shade_table, camera, lights,
                        textures, skybox, ai, *, width: int, height: int,
                        clear_color, raster: str, skinned: bool,
                        sampling: str = "bilinear") -> FrameOutput:
    """Render (height, width) split into `mesh.shape[axis]` row bands."""
    from trident_tpu.render.renderer import _render_frame_impl

    n = mesh.shape[axis]
    assert height % n == 0, f"height {height} not divisible by {n} bands"
    band_h = height // n

    replicate = NamedSharding(mesh, P())

    def band_render(geometry, plan, tri_draw, params, palette, shade_table,
                    camera, lights, textures, skybox, ai):
        b = jax.lax.axis_index(axis).astype(jnp.float32)
        y0 = 2.0 * (b * band_h) / height - 1.0
        y1 = 2.0 * ((b + 1.0) * band_h) / height - 1.0
        band_cam = CameraParams(
            view=camera.view,
            proj=crop_projection(camera.proj, y0, y1),
            position=camera.position)
        out = _render_frame_impl(
            geometry, plan, tri_draw, params, palette, shade_table,
            band_cam, lights, textures, skybox, ai,
            width=width, height=band_h, clear_color=clear_color,
            raster=raster, chunk=64, skinned=skinned, sampling=sampling)
        return out

    in_specs = tuple(P() for _ in range(11))
    out_specs = FrameOutput(
        color=P(axis), depth=P(axis), tri_id=P(axis),
        # per-band drop counters stack along the band axis ((2n,) total);
        # the ref raster emits no aux (None = empty subtree)
        aux=P(axis) if raster == "pallas" else None)
    fn = shard_map(band_render, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs)
    return fn(geometry, plan, tri_draw, params, palette, shade_table,
              camera, lights, textures, skybox, ai)
