"""Golden-flavor drift probe for hardware A/Bs (r3hw5 found 5 flavors
drifting 2-3.7% >3-LSB pixels vs CPU goldens). Prints per-flavor stats
without asserting so env-knob bisections (TRIDENT_TEXEL_MXU,
TRIDENT_RESOLVE_TR, TRIDENT_RESOLVE_PREC) can run back to back."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
print("env:", {k: v for k, v in os.environ.items() if "TRIDENT" in k},
      flush=True)

import test_golden_flavors as tg  # noqa: E402

from trident_tpu.io.image import load_rgba8  # noqa: E402

orig_make = tg._make


def pallas_make(**kw):
    kw.setdefault("use_pallas", True)
    return orig_make(**kw)


tg._make = pallas_make

# Per-flavor cap on the EXEMPTED class (boundary winner-tie flips, >16
# LSB on a winner-id edge): the exemption is qualitative in nature (any
# single flip's LSB magnitude is unboundable) but its COUNT is not — a
# regression that multiplies depth ties must not hide in it (VERDICT r4
# item 7). Thresholds = round-4 measured counts + margin: skinned read 20
# flip px (r4diag1, the slerp-transcendental class); every other flavor
# read 0 (r4hw2 byte-stable). Flavors not listed get the default cap.
FLIP_CAPS = {"skinned": 40}
FLIP_CAP_DEFAULT = 8

worst = 0.0
interior_total = 0
flip_violations = []
for name, builder in sorted(tg.FLAVORS.items()):
    r = builder()
    out = r.render_viewport(r.active_viewport)
    img = np.asarray(r.read_frame())
    tri = np.asarray(out.tri_id)
    golden = load_rgba8(os.path.join(tg.GOLDEN_DIR, f"flavor_{name}.png"))
    diff = np.abs(img.astype(int) - golden.astype(int))
    frac = (diff > 3).mean()
    mean = float(diff.mean())
    mx = int(diff.max())
    # classify big outliers: a >16-LSB pixel ON a winner-id boundary is a
    # depth-tie silhouette flip (a different surface's color from a 1-ulp
    # upstream difference — r4 diag_skinned root cause); an INTERIOR one
    # is real shading drift and a bug.
    d2 = diff.max(axis=-1) if diff.ndim == 3 else diff
    ys, xs = np.nonzero(d2 > 16)
    interior = 0
    h, w = d2.shape[:2]
    for y, x in zip(ys.tolist(), xs.tolist()):
        neigh = tri[max(y - 1, 0):min(y + 2, h), max(x - 1, 0):min(x + 2, w)]
        if not (neigh != tri[y, x]).any():
            interior += 1
    interior_total += interior
    flips = len(ys) - interior
    cap = FLIP_CAPS.get(name, FLIP_CAP_DEFAULT)
    if flips > cap:
        flip_violations.append((name, flips, cap))
    print(f"flavor {name}: >3LSB frac={frac:.5f} mean={mean:.3f} max={mx} "
          f">16LSB={len(ys)}px (interior={interior} flips={flips}/"
          f"cap {cap})", flush=True)
    worst = max(worst, frac)
print(f"WORST_FRAC {worst:.5f} INTERIOR_OUTLIERS {interior_total}",
      flush=True)

# the tightened hardware gate (VERDICT r3 item 9 + r4 item 7): winner-tie
# silhouette flips are unboundable in LSB by construction, so the gate is
# (a) ZERO interior >16-LSB outliers, (b) the >3-LSB fraction stays within
# the known slerp-residual envelope, and (c) the boundary-flip COUNT per
# flavor stays under its measured cap. Exit nonzero so sweep logs fail
# loudly.
if interior_total > 0 or worst > 0.002 or flip_violations:
    print(f"FLAVOR GATE FAILED: interior={interior_total} "
          f"worst_frac={worst:.5f} flip_caps_exceeded={flip_violations}",
          flush=True)
    sys.exit(1)
print("FLAVOR GATE PASSED", flush=True)
