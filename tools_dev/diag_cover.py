"""Coverage probe at the profile scene: covered-pixel count from the
production visibility kernel at 1M/1080p, planar chain ON vs OFF
(monkeypatched + jit caches cleared) — r3hw10's profile read
covered=539506 where r3hw7 (pre-affine) read 743763 at identical
pairs=8875; this separates 'planar bug' from 'affine-depth bug'."""
import numpy as np
import jax
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
print("backend:", jax.default_backend(), flush=True)
from profile_stages import build_scene
from trident_tpu.ops import planes as planes_mod
from trident_tpu.render import renderer as rmod

W, H, GRID = 1920, 1080, 36
r, reg = build_scene(W, H, GRID)
for planar in (True, False):
    planes_mod.PLANAR = planar
    rmod.render_frame_bundled.clear_cache()
    rmod.render_frame.clear_cache()
    r.viewports[r.active_viewport].last_sig = None
    out = r.render_viewport(r.active_viewport)
    tri = np.asarray(out.tri_id)
    print(f"planar={planar}: covered={(tri >= 0).sum()} "
          f"aux={np.asarray(out.aux).tolist()}", flush=True)
