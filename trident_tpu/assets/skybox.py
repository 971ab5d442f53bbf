"""Skybox cubemap loading.

Reference: Loader/TextureLoader.h:29-63 SkyboxTextureLoader — KTX/KTX2
cubemaps, EXR HDR faces, loose PNG faces discovered by px/nx/py/ny/pz/nz
tokens, and a solid-color fallback. Face order: +x,-x,+y,-y,+z,-z.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from trident_tpu.core.log import get_logger

logger = get_logger("assets.skybox")

FACE_TOKENS = [
    ("px", "posx", "right", "+x"),
    ("nx", "negx", "left", "-x"),
    ("py", "posy", "top", "up", "+y"),
    ("ny", "negy", "bottom", "down", "-y"),
    ("pz", "posz", "front", "+z"),
    ("nz", "negz", "back", "-z"),
]


def solid_skybox(color=(0.1, 0.12, 0.18), edge: int = 4) -> np.ndarray:
    faces = np.empty((6, edge, edge, 3), np.float32)
    faces[:] = np.asarray(color, np.float32)
    return faces


def _load_face(path: str, edge: Optional[int]) -> np.ndarray:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".exr":
        img = _load_exr(path)
    else:
        from trident_tpu.io.image import load_rgba8

        img = load_rgba8(path).astype(np.float32) / 255.0
    img = img[..., :3]
    if edge is not None and img.shape[:2] != (edge, edge):
        yi = (np.arange(edge) * img.shape[0] / edge).astype(np.int64)
        xi = (np.arange(edge) * img.shape[1] / edge).astype(np.int64)
        img = img[yi][:, xi]
    return np.asarray(img, np.float32)


def _load_exr(path: str) -> np.ndarray:
    try:
        import imageio.v3 as iio

        return np.asarray(iio.imread(path), np.float32)
    except Exception as exc:
        raise ValueError(f"EXR load failed for {path}: {exc}") from exc


def load_faces(paths: List[str], edge: Optional[int] = None) -> np.ndarray:
    """Explicit six paths ordered +x,-x,+y,-y,+z,-z → (6,E,E,3) f32."""
    if len(paths) != 6:
        raise ValueError("need exactly 6 face paths")
    first = _load_face(paths[0], edge)
    edge = first.shape[0]
    faces = [first] + [_load_face(p, edge) for p in paths[1:]]
    return np.stack(faces, axis=0)


def discover_faces(directory: str) -> Optional[List[str]]:
    """Find face files by px/nx/... name tokens (TextureLoader.h:45-63)."""
    try:
        files = sorted(os.listdir(directory))
    except OSError:
        return None
    found: List[Optional[str]] = [None] * 6
    for name in files:
        stem = os.path.splitext(name)[0].lower()
        for face_idx, tokens in enumerate(FACE_TOKENS):
            if found[face_idx] is None and any(
                    stem == t or stem.endswith("_" + t) or stem.endswith(t)
                    for t in tokens):
                found[face_idx] = os.path.join(directory, name)
                break
    if all(found):
        return found  # type: ignore[return-value]
    return None


def load_skybox(source: str, edge: Optional[int] = None,
                fallback_color=(0.1, 0.12, 0.18)) -> np.ndarray:
    """Load a cubemap from a directory of faces or a .ktx file; solid-color
    fallback on failure (like the reference)."""
    try:
        if os.path.isdir(source):
            paths = discover_faces(source)
            if paths is None:
                raise ValueError(f"no px/nx/py/ny/pz/nz faces in {source}")
            return load_faces(paths, edge)
        if source.lower().endswith(".ktx"):
            return load_ktx1_cubemap(source)
        if source.lower().endswith(".ktx2"):
            from trident_tpu.assets.ktx2 import load_ktx2_cubemap

            return load_ktx2_cubemap(source)
        raise ValueError(f"unsupported skybox source: {source}")
    except Exception as exc:
        logger.warning("skybox load failed (%s): %s — using solid fallback",
                       source, exc)
        return solid_skybox(fallback_color)


# -- minimal KTX1 reader (uncompressed RGBA8 cubemaps) ---------------------------

_KTX1_MAGIC = b"\xabKTX 11\xbb\r\n\x1a\n"
_GL_RGBA = 0x1908
_GL_RGB = 0x1907
_GL_UNSIGNED_BYTE = 0x1401


def load_ktx1_cubemap(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    if data[:12] != _KTX1_MAGIC:
        raise ValueError("not a KTX1 file")
    endian = "<" if struct.unpack("<I", data[12:16])[0] == 0x04030201 else ">"
    fields = struct.unpack(endian + "12I", data[16:64])
    (gl_type, _type_size, gl_format, _internal, _base_internal,
     width, height, _depth, _array_len, faces, _mips, kv_bytes) = fields
    if faces != 6:
        raise ValueError(f"KTX has {faces} faces, need 6")
    if gl_type != _GL_UNSIGNED_BYTE or gl_format not in (_GL_RGBA, _GL_RGB):
        raise ValueError("only uncompressed RGB(A)8 KTX1 supported")
    channels = 4 if gl_format == _GL_RGBA else 3
    offset = 64 + kv_bytes
    image_size = struct.unpack(endian + "I", data[offset:offset + 4])[0]
    offset += 4
    face_size = width * height * channels
    if image_size not in (face_size, face_size * 6):
        raise ValueError("unexpected KTX image size")
    out = np.empty((6, height, width, 3), np.float32)
    for i in range(6):
        face = np.frombuffer(data, np.uint8, face_size, offset).reshape(
            height, width, channels)
        out[i] = face[..., :3].astype(np.float32) / 255.0
        offset += face_size
        offset += (3 - (face_size + 3) % 4)  # cube padding to 4 bytes
    return out
