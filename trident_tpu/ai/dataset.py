"""Consecutive-frame triplet dataset for interpolation training.

Reference semantics (train_frame_generator.py:52-137): frames sorted by
name; sample k yields input = frame_k ⊕ frame_{k+2} (channel concat) and
target = frame_{k+1}; images resized to the net resolution, scaled to [0,1].
Pure numpy — the host-side data path feeding device batches.
"""

from __future__ import annotations

import glob
import os
from typing import List, Sequence, Tuple

import numpy as np


def list_frames(source: str) -> List[str]:
    """Accepts a directory or a glob pattern; returns sorted image paths."""
    if os.path.isdir(source):
        paths: List[str] = []
        for ext in ("*.png", "*.jpg", "*.jpeg", "*.bmp"):
            paths.extend(glob.glob(os.path.join(source, ext)))
    else:
        paths = glob.glob(source)
    return sorted(paths)


def load_frame(path: str, resolution: Tuple[int, int]) -> np.ndarray:
    """(H,W,3) float32 in [0,1] at `resolution` (h, w)."""
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB").resize((resolution[1], resolution[0]),
                                        Image.BILINEAR)
        return np.asarray(img, dtype=np.float32) / 255.0


class TripletDataset:
    def __init__(self, source: str, resolution: Tuple[int, int] = (256, 256)):
        self.paths = list_frames(source)
        if len(self.paths) < 3:
            raise ValueError(f"need ≥3 frames, found {len(self.paths)} in {source!r}")
        self.resolution = resolution
        self._cache: dict = {}

    def __len__(self) -> int:
        return len(self.paths) - 2

    def _frame(self, i: int) -> np.ndarray:
        if i not in self._cache:
            self._cache[i] = load_frame(self.paths[i], self.resolution)
        return self._cache[i]

    def sample(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        a = self._frame(index)
        b = self._frame(index + 2)
        mid = self._frame(index + 1)
        return np.concatenate([a, b], axis=-1), mid

    def batches(self, indices: Sequence[int], batch_size: int):
        """Yield (inputs (B,H,W,6), targets (B,H,W,3)) batches; the last
        partial batch is padded by wrapping (static shapes for jit)."""
        idx = list(indices)
        for start in range(0, len(idx), batch_size):
            chunk = idx[start:start + batch_size]
            while len(chunk) < batch_size:
                chunk.append(idx[(start + len(chunk)) % len(idx)])
            pairs = [self.sample(i) for i in chunk]
            yield (np.stack([p[0] for p in pairs]),
                   np.stack([p[1] for p in pairs]))

    def split(self, val_fraction: float = 0.1, seed: int = 42):
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self))
        n_val = max(1, int(len(self) * val_fraction))
        return order[n_val:].tolist(), order[:n_val].tolist()
