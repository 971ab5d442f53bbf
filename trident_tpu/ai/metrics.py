"""Training quality metrics: PSNR + Gaussian-window SSIM.

Matches the reference trainer's definitions
(Scripts/train_frame_generator.py:231-269): PSNR over per-image MSE with
1e-8 epsilon; SSIM with an 11×11 σ=1.5 depthwise Gaussian window,
C1=(0.01)², C2=(0.03)². NHWC layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def psnr(prediction: Array, target: Array) -> Array:
    """Mean PSNR over the batch (images in [0,1], NHWC)."""
    mse = jnp.mean((prediction - target) ** 2, axis=(1, 2, 3))
    return jnp.mean(10.0 * jnp.log10(1.0 / (mse + 1e-8)))


def _gaussian_kernel(window: int = 11, sigma: float = 1.5) -> Array:
    ax = jnp.arange(window, dtype=jnp.float32) - window // 2
    k1 = jnp.exp(-(ax ** 2) / (2 * sigma ** 2))
    k1 = k1 / jnp.sum(k1)
    return jnp.outer(k1, k1)


def _depthwise_filter(img: Array, kernel2d: Array) -> Array:
    """Depthwise 2D convolution, VALID padding. img: (B,H,W,C)."""
    c = img.shape[-1]
    k = kernel2d[:, :, None, None]                     # (Kh,Kw,1,1)
    k = jnp.tile(k, (1, 1, 1, c))                      # feature_group_count=C
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def ssim(prediction: Array, target: Array, window: int = 11,
         sigma: float = 1.5) -> Array:
    """Mean SSIM over the batch (images in [0,1], NHWC)."""
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    kernel = _gaussian_kernel(window, sigma)

    mu_p = _depthwise_filter(prediction, kernel)
    mu_t = _depthwise_filter(target, kernel)
    mu_p2, mu_t2, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t

    sigma_p = _depthwise_filter(prediction * prediction, kernel) - mu_p2
    sigma_t = _depthwise_filter(target * target, kernel) - mu_t2
    sigma_pt = _depthwise_filter(prediction * target, kernel) - mu_pt

    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_p2 + mu_t2 + c1) * (sigma_p + sigma_t + c2)
    return jnp.mean(num / den)
