"""Frame-interpolation network: residual U-Net, native JAX/flax, NHWC.

Behavioral equivalent of the reference's PyTorch InterpolationUNet
(Scripts/train_frame_generator.py:139-217): enc 32→64→128 (stride-2 convs),
two residual bottleneck blocks, transpose-conv decoder with ADDITIVE skips,
sigmoid output. Differences by design: NHWC layout (TPU-native), BatchNorm
with optional cross-device axis sync, bfloat16 compute / f32 params.

Input: two frames concatenated on channels (B,H,W,6) in [0,1] →
output (B,H,W,3) the interpolated middle frame.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


class ResidualBlock(nn.Module):
    channels: int
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         axis_name=self.bn_axis_name if train else None)(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         axis_name=self.bn_axis_name if train else None)(h)
        return nn.relu(h + x)


class InterpolationUNet(nn.Module):
    input_channels: int = 6
    base_channels: int = 32
    dtype: Any = jnp.float32          # set jnp.bfloat16 for TPU training
    bn_axis_name: Optional[str] = None  # "dp" to sync batch stats over mesh

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = self.base_channels
        blk = lambda ch: ResidualBlock(ch, self.dtype, self.bn_axis_name)

        x = x.astype(self.dtype)
        # encoder
        skip1 = blk(c)(nn.relu(nn.Conv(c, (3, 3), padding=1, dtype=self.dtype)(x)), train)
        skip2 = blk(2 * c)(nn.relu(nn.Conv(2 * c, (3, 3), strides=2, padding=1,
                                           dtype=self.dtype)(skip1)), train)
        h = blk(4 * c)(nn.relu(nn.Conv(4 * c, (3, 3), strides=2, padding=1,
                                       dtype=self.dtype)(skip2)), train)
        # bottleneck
        h = blk(4 * c)(h, train)
        h = blk(4 * c)(h, train)
        # decoder with additive skips
        h = nn.relu(nn.ConvTranspose(2 * c, (4, 4), strides=(2, 2), padding="SAME",
                                     dtype=self.dtype)(h))
        h = blk(2 * c)(h, train) + skip2
        h = nn.relu(nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME",
                                     dtype=self.dtype)(h))
        h = blk(c)(h, train) + skip1
        out = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)(h)
        return nn.sigmoid(out.astype(jnp.float32))


def init_model(rng: Array, resolution=(256, 256), base_channels: int = 32,
               dtype=jnp.float32, bn_axis_name: Optional[str] = None):
    """Returns (model, variables) initialized at the given resolution."""
    model = InterpolationUNet(base_channels=base_channels, dtype=dtype,
                              bn_axis_name=bn_axis_name)
    dummy = jnp.zeros((1, resolution[0], resolution[1], 6), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return model, variables
