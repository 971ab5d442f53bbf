from trident_tpu.core.config import EngineConfig, RenderConfig, AiConfig
from trident_tpu.core.log import get_logger, ConsoleLog
from trident_tpu.core.timing import Time, FrameTimingRing
from trident_tpu.core.ids import new_uuid

__all__ = [
    "EngineConfig",
    "RenderConfig",
    "AiConfig",
    "get_logger",
    "ConsoleLog",
    "Time",
    "FrameTimingRing",
    "new_uuid",
]
