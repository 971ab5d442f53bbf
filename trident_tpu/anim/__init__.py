from trident_tpu.anim.data import Bone, Skeleton, AnimationClip, TransformChannel
from trident_tpu.anim.player import AnimationPlayer
from trident_tpu.anim.service import AnimationAssetService

__all__ = ["Bone", "Skeleton", "AnimationClip", "TransformChannel",
           "AnimationPlayer", "AnimationAssetService"]
