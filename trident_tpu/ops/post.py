"""Post-processing: supersample resolve + bloom.

BASELINE config 5 calls for "MSAA resolve + post FX (tonemap, bloom)". On
a software rasterizer MSAA is ordered-grid supersampling: render at k× and
box-resolve — coverage and shading both get k² samples. Bloom runs on the
linear HDR image before tonemapping: threshold, separable Gaussian at
quarter resolution, upsample, add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def resolve_supersample(img: Array, factor: int) -> Array:
    """(H·f, W·f, C) → (H, W, C) box filter."""
    if factor <= 1:
        return img
    h, w, c = img.shape
    return img.reshape(h // factor, factor, w // factor, factor, c).mean(axis=(1, 3))


def _gaussian_kernel1d(radius: int, sigma: float) -> Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def _blur_separable(img: Array, radius: int, sigma: float) -> Array:
    """Gaussian blur (H,W,C) via two 1-D convolutions."""
    k = _gaussian_kernel1d(radius, sigma)
    # horizontal
    kh = k[None, :, None, None]                      # (1,K,1,1) HWIO
    c = img.shape[-1]
    kh = jnp.tile(kh, (1, 1, 1, c))
    x = img[None]                                    # (1,H,W,C)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(0, 0), (radius, radius)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    kv = k[:, None, None, None]
    kv = jnp.tile(kv, (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, kv, (1, 1), [(radius, radius), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return x[0]


def bloom(hdr: Array, threshold: float = 1.0, strength: float = 0.6,
          radius: int = 6, sigma: float = 3.0) -> Array:
    """Add blurred highlights to a linear HDR image (H,W,3)."""
    h, w, _ = hdr.shape
    bright = jnp.maximum(hdr - threshold, 0.0)
    # quarter-res blur for a wide, cheap kernel
    h4, w4 = h // 4 * 4, w // 4 * 4
    small = bright[:h4, :w4].reshape(h4 // 4, 4, w4 // 4, 4, 3).mean(axis=(1, 3))
    blurred = _blur_separable(small, radius, sigma)
    up = jnp.repeat(jnp.repeat(blurred, 4, axis=0), 4, axis=1)
    up = jnp.pad(up, ((0, h - h4), (0, w - w4), (0, 0)), mode="edge")
    return hdr + strength * up
