"""trident_tpu — a TPU-native real-time 3D rendering framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the C++/Vulkan
engine "Trident" (ThatTanishqTak/3D-Renderer): entity/component scenes with
text save/load and play-mode sandboxing, cameras and lights, a full raster
pipeline (skinned MXU vertex stage, tile-binned Pallas rasterization with
early-Z, mipmapped texturing, Cook-Torrance PBR, skybox, sprites, text
overlay), an asset pipeline, skeletal animation, frame telemetry, dataset
recording, video export, and a neural frame-interpolation net trained and
served on the same chip.

Design stance (vs. the reference engine, see SURVEY.md):
  * scene state is pytrees + packed draw arrays, not descriptor sets
  * the frame is ONE jit function, not command buffers / barriers
  * rasterization is deferred: a Pallas visibility kernel resolves a
    winner-triangle id + depth per pixel, then a single fused shading pass
    interpolates attributes and evaluates PBR once per pixel
"""

__version__ = "0.1.0"

import os as _os

# The Mosaic kernel compile helper needs these hints on tunneled TPU
# environments (otherwise libtpu init fails with "could not determine TPU
# accelerator type"). Harmless defaults elsewhere.
_gen = _os.environ.get("PALLAS_AXON_TPU_GEN")
if _gen and "TPU_ACCELERATOR_TYPE" not in _os.environ:
    _os.environ["TPU_ACCELERATOR_TYPE"] = {
        "v5e": "v5litepod-1", "v5p": "v5p-8", "v4": "v4-8", "v6e": "v6e-1",
    }.get(_gen, "v5litepod-1")
_os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

# Honor JAX_PLATFORMS=cpu even when a site customization pins a TPU
# plugin platform: on such environments the env var alone is silently
# overridden, and every CLI (trainer, demo, bench) would hang trying the
# tunnel. The config update is what actually wins.
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from trident_tpu.core.config import EngineConfig  # noqa: F401

# TRIDENT_THREAD_CHECKS=1: install the cross-thread mutation detector
# (core/threadcheck.py — the validation-layer analogue). No-op otherwise.
from trident_tpu.core.threadcheck import maybe_install as _maybe_threadcheck

_maybe_threadcheck()
