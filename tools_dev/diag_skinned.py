#!/usr/bin/env python
"""Localize the skinned flavor's hardware drift (VERDICT r3 item 9).

The skinned golden flavor reads max=167 LSB at 0.00092 >3-LSB pixel
fraction on the chip (r3hw13, r4hw1). This renders the flavor on the
CURRENT backend, diffs against the CPU golden, and classifies every
>16-LSB pixel: is it on a WINNER-ID BOUNDARY (a silhouette/edge pixel
whose depth tie flipped to a different triangle — a different surface's
color, arbitrarily large LSB diff from a 1-ulp upstream difference) or
in a triangle INTERIOR (real shading drift that needs a numeric fix)?

Run under axon for the hardware answer; CPU run should report zero.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import jax

print("backend:", jax.default_backend(), flush=True)

import test_golden_flavors as tg  # noqa: E402

from trident_tpu.io.image import load_rgba8  # noqa: E402

orig_make = tg._make
tg._make = lambda **kw: orig_make(**{**kw, "use_pallas": True})

r = tg.FLAVORS["skinned"]()
out = r.render_viewport(r.active_viewport)
img = np.asarray(r.read_frame())
tri = np.asarray(out.tri_id)
golden = load_rgba8(os.path.join(tg.GOLDEN_DIR, "flavor_skinned.png"))
diff = np.abs(img.astype(int) - golden.astype(int)).max(axis=-1)

print(f"diff: mean={diff.mean():.4f} max={int(diff.max())} "
      f">3LSB={(diff > 3).mean():.5f} >16LSB={(diff > 16).sum()}px",
      flush=True)

ys, xs = np.nonzero(diff > 16)
h, w = diff.shape
boundary = 0
interior = []
for y, x in zip(ys.tolist(), xs.tolist()):
    y0, y1 = max(y - 1, 0), min(y + 2, h)
    x0, x1 = max(x - 1, 0), min(x + 2, w)
    neigh = tri[y0:y1, x0:x1]
    if (neigh != tri[y, x]).any():
        boundary += 1
    else:
        interior.append((y, x))
print(f">16LSB pixels: {len(ys)} total, {boundary} on winner-id "
      f"boundaries (tie-flip silhouette class), {len(interior)} interior",
      flush=True)
for y, x in interior[:10]:
    print(f"  INTERIOR y={y} x={x} tri={int(tri[y, x])} "
          f"img={img[y, x].tolist()} golden={golden[y, x].tolist()} "
          f"depth={float(np.asarray(out.depth)[y, x]):.7f}", flush=True)
if not interior:
    print("VERDICT: every outlier is a winner-tie silhouette flip — the "
          "magnitude is a different surface's color, not shading drift; "
          "the bounded quantity is the FLIP COUNT, not the LSB max.",
          flush=True)
