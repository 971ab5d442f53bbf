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

worst = 0.0
for name, builder in sorted(tg.FLAVORS.items()):
    img = builder().read_frame()
    golden = load_rgba8(os.path.join(tg.GOLDEN_DIR, f"flavor_{name}.png"))
    diff = np.abs(img.astype(int) - golden.astype(int))
    frac = (diff > 3).mean()
    mean = float(diff.mean())
    mx = int(diff.max())
    print(f"flavor {name}: >3LSB frac={frac:.5f} mean={mean:.3f} max={mx}",
          flush=True)
    worst = max(worst, frac)
print(f"WORST_FRAC {worst:.5f}", flush=True)
