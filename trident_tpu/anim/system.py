"""ECS AnimationSystem: drives AnimationComponents each runtime frame.

Reference: ECS/AnimationSystem.h + ECS/Components/AnimationSystem.cpp —
per entity: refresh cached handles when asset ids change, drive the state
machine if present else a clip player, write the pose into
AnimationComponent.bone_matrices (consumed by the renderer's bone palette).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from trident_tpu.anim.player import AnimationPlayer
from trident_tpu.anim.service import AnimationAssetService
from trident_tpu.ecs.components import AnimationComponent
from trident_tpu.ecs.registry import Registry


class AnimationSystem:
    _players: Dict[int, AnimationPlayer] = {}

    @classmethod
    def _player_for(cls, entity: int, anim: AnimationComponent) -> Optional[AnimationPlayer]:
        service = AnimationAssetService.get()
        skeleton = service.acquire_skeleton(anim.skeleton_asset)
        if skeleton is None:
            return None
        player = cls._players.get(entity)
        if player is None or player.skeleton is not skeleton:
            player = AnimationPlayer(skeleton)
            cls._players[entity] = player
        clips = service.acquire_animation_library(anim.animation_asset or anim.skeleton_asset)
        clip_idx = anim.clip_index
        if anim.clip_name:
            named = service.resolve_clip_index(
                anim.animation_asset or anim.skeleton_asset, anim.clip_name)
            if named >= 0:
                clip_idx = named
        if 0 <= clip_idx < len(clips) and player.clip is not clips[clip_idx]:
            player.set_clip(clips[clip_idx], reset_time=False)
        return player

    @classmethod
    def initialise_pose(cls, registry: Registry) -> None:
        """Emit bind/first poses on Play so skinned meshes never render
        un-posed (reference InitialisePose)."""
        for entity, (anim,) in registry.view(AnimationComponent):
            if anim.state_machine is not None:
                anim.bone_matrices = np.asarray(anim.state_machine.update(0.0))
                continue
            player = cls._player_for(entity, anim)
            if player is not None:
                anim.bone_matrices = player.evaluate_at(anim.time).copy()

    @classmethod
    def update(cls, registry: Registry, dt: float) -> None:
        for entity, (anim,) in registry.view(AnimationComponent):
            if not anim.playing:
                continue
            if anim.state_machine is not None:
                anim.bone_matrices = np.asarray(anim.state_machine.update(dt))
                anim.time += dt * anim.speed
                continue
            player = cls._player_for(entity, anim)
            if player is None:
                continue
            player.speed = anim.speed
            player.looping = anim.looping
            player.playing = True
            player.time = anim.time
            anim.bone_matrices = player.update(dt).copy()
            anim.time = player.time
