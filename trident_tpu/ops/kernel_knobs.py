"""Programmatic kernel-knob registry (SURVEY §5 config unification).

Every raster/resolve/texel kernel constant used to be an import-time
TRIDENT_* env read only — unsettable per-run. The constants stay module
globals (kernels read plain Python statics at trace time, which is the
right mechanism for Pallas/jit), but this registry adds the missing
programmability:

  * ``apply({"chunk": 512, "zskip": True})`` — set knobs at runtime and
    recompute the derived constants (raster_pallas.recompute_derived)
  * ``snapshot()`` — the current values as a plain dict
  * ``trace_key()`` — a hashable fingerprint of every knob; the renderer
    passes it as a static jit argument so TWO DIFFERENT CONFIGS RENDER
    CORRECTLY IN ONE PROCESS (each gets its own trace instead of silently
    sharing one)
  * ``overrides(...)`` — context manager for scoped sweeps

Env vars remain the import-time DEFAULTS; RenderConfig.kernel and sweep
scripts drive apply().
"""

from __future__ import annotations

import contextlib
import importlib
from typing import Any, Dict, Optional, Tuple

# knob name → (module path, attribute). Names are the lowercase env-var
# suffix (TRIDENT_CHUNK → "chunk", TRIDENT_RESOLVE_PREC → "resolve_prec").
_KNOBS: Dict[str, Tuple[str, str]] = {
    "tile_h": ("trident_tpu.ops.raster_pallas", "TILE_H"),
    "tile_w": ("trident_tpu.ops.raster_pallas", "TILE_W"),
    "chunk": ("trident_tpu.ops.raster_pallas", "CHUNK"),
    "sub": ("trident_tpu.ops.raster_pallas", "SUB"),
    "span0": ("trident_tpu.ops.raster_pallas", "SPAN0"),
    "sort_pad": ("trident_tpu.ops.raster_pallas", "SORT_PAD"),
    "exact_bins": ("trident_tpu.ops.raster_pallas", "EXACT_BINS"),
    "cover_gate": ("trident_tpu.ops.raster_pallas", "COVER_GATE"),
    "qgate": ("trident_tpu.ops.raster_pallas", "QGATE"),
    "ckern": ("trident_tpu.ops.raster_pallas", "CKERN"),
    "acc": ("trident_tpu.ops.raster_pallas", "ACC"),
    "dynhit": ("trident_tpu.ops.raster_pallas", "DYNHIT"),
    "treset": ("trident_tpu.ops.raster_pallas", "TRESET"),
    "recpad": ("trident_tpu.ops.raster_pallas", "RECPAD"),
    "rect": ("trident_tpu.ops.raster_pallas", "RECT"),
    "ck_bank": ("trident_tpu.ops.raster_pallas", "CK_BANK"),
    "zorder": ("trident_tpu.ops.raster_pallas", "ZORDER"),
    "zskip": ("trident_tpu.ops.raster_pallas", "ZSKIP"),
    "max_global": ("trident_tpu.ops.raster_pallas", "MAX_GLOBAL"),
    "pair_budget": ("trident_tpu.ops.raster_pallas", "PAIR_BUDGET_OVERRIDE"),
    "fuse": ("trident_tpu.ops.resolve_pallas", "FUSE"),
    "resolve_half": ("trident_tpu.ops.resolve_pallas", "RESOLVE_HALF"),
    "resolve_compact": ("trident_tpu.ops.resolve_pallas", "RESOLVE_COMPACT"),
    "resolve_skip": ("trident_tpu.ops.resolve_pallas", "RESOLVE_SKIP"),
    "resolve_prec": ("trident_tpu.ops.resolve_pallas", "_PREC_MODE"),
    "resolve_tr": ("trident_tpu.ops.planes", "RESOLVE_TR"),
    "planar": ("trident_tpu.ops.planes", "PLANAR"),
    "texel_mxu": ("trident_tpu.ops.texel_pallas", "TEXEL_MXU"),
    "texel_slab": ("trident_tpu.ops.texel_pallas", "SLAB"),
    "texel_br": ("trident_tpu.ops.texel_pallas", "BR"),
    "texel_bc": ("trident_tpu.ops.texel_pallas", "BC"),
    "texel_max_q": ("trident_tpu.ops.texel_pallas", "MAX_TABLE_ENTRIES"),
    "texel_max_pix": ("trident_tpu.ops.texel_pallas", "TEXEL_MXU_MAX_PIX"),
    "tiled_shade": ("trident_tpu.ops.deferred_tiled", "TILED_SHADE"),
    "shadow_mxu": ("trident_tpu.ops.shadow_pallas", "SHADOW_MXU"),
    "warp_mxu": ("trident_tpu.ops.warp_pallas", "WARP_MXU"),
    "upscale_v2": ("trident_tpu.ai.upscaler", "V2"),
    "d2s_mode": ("trident_tpu.ai.upscaler", "D2S_MODE"),
    "upscale_dtype": ("trident_tpu.ai.upscaler", "UPSCALE_DTYPE"),
}


def _mod(path: str):
    return importlib.import_module(path)


def snapshot() -> Dict[str, Any]:
    """Current value of every registered knob."""
    return {name: getattr(_mod(m), a) for name, (m, a) in _KNOBS.items()}


def apply(overrides: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    """Set knobs by name, revalidate + recompute deriveds; returns the
    previous values of the knobs that changed (feed back to apply() to
    restore). Unknown names raise — a typo'd sweep knob must fail loudly,
    not silently bench the defaults."""
    if not overrides:
        return {}
    unknown = set(overrides) - set(_KNOBS)
    if unknown:
        raise KeyError(f"unknown kernel knobs: {sorted(unknown)}; "
                       f"known: {sorted(_KNOBS)}")
    prev: Dict[str, Any] = {}
    for name, value in overrides.items():
        m, a = _KNOBS[name]
        mod = _mod(m)
        prev[name] = getattr(mod, a)
        setattr(mod, a, value)
    try:
        _revalidate()
    except Exception:
        for name, value in prev.items():   # all-or-nothing
            m, a = _KNOBS[name]
            setattr(_mod(m), a, value)
        _revalidate()
        raise
    return prev


def _revalidate() -> None:
    rp = _mod("trident_tpu.ops.raster_pallas")
    rp.recompute_derived()
    rv = _mod("trident_tpu.ops.resolve_pallas")
    if rv._PREC_MODE not in ("fp32", "split", "bf16"):
        raise ValueError(f"resolve_prec={rv._PREC_MODE!r}: "
                         "expected fp32 | split | bf16")
    import jax

    rv._PREC = (jax.lax.Precision.HIGHEST if rv._PREC_MODE == "fp32"
                else None)
    if rv.RESOLVE_HALF and rp.CHUNK % 2 != 0:
        raise ValueError("resolve_half=True requires an even chunk")
    if rv.FUSE:
        pm = _mod("trident_tpu.ops.planes")
        if not (rp.ACC and not rp.CKERN and not rp.RECT and pm.RESOLVE_TR):
            raise ValueError("fuse=True requires acc=True, ckern=False, "
                             "rect=False, resolve_tr=True")
    up = _mod("trident_tpu.ai.upscaler")
    if up.D2S_MODE not in ("convt", "pad", "xla"):
        raise ValueError(f"d2s_mode={up.D2S_MODE!r}: expected "
                         "convt | pad | xla")
    if up.UPSCALE_DTYPE not in ("bf16", "f32"):
        raise ValueError(f"upscale_dtype={up.UPSCALE_DTYPE!r}: "
                         "expected bf16 | f32")


def trace_key() -> tuple:
    """Hashable fingerprint of the active knob set — include in every jit
    cache key / static argument whose trace bakes kernel constants in."""
    return tuple(sorted((k, v) for k, v in snapshot().items()))


# captured at the bottom of this module's import (= the TRIDENT_* env
# values): the deterministic baseline every Renderer builds from, so a
# previous renderer's policy overlay (e.g. shadows→zskip) can never leak
# into the next one constructed in the same process
_ENV_DEFAULTS: Dict[str, Any] = {}


def env_defaults() -> Dict[str, Any]:
    return dict(_ENV_DEFAULTS)


@contextlib.contextmanager
def overrides(**knobs):
    """Scoped knob overrides: with overrides(chunk=512): render(...)."""
    prev = apply(knobs)
    try:
        yield
    finally:
        apply(prev)


_ENV_DEFAULTS.update(snapshot())
