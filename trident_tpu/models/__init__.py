"""Model zoo: the neural networks the framework trains/serves on-chip.

Currently the frame-interpolation family (the reference's only network,
Scripts/train_frame_generator.py). New model families plug in here.
"""

from trident_tpu.ai.model import InterpolationUNet, ResidualBlock, init_model
from trident_tpu.ai.train import TrainConfig, create_state, train
from trident_tpu.ai.validate import validate_checkpoint

__all__ = [
    "InterpolationUNet", "ResidualBlock", "init_model",
    "TrainConfig", "create_state", "train", "validate_checkpoint",
]
