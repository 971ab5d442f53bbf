from trident_tpu.ai.model import InterpolationUNet
from trident_tpu.ai.metrics import psnr, ssim

__all__ = ["InterpolationUNet", "psnr", "ssim"]
