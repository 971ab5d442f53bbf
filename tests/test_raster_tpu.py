"""Hardware-gated: Pallas kernel vs reference oracle on a REAL TPU.

Skipped on the CPU CI mesh (conftest forces cpu); run on hardware with
`TRIDENT_TPU_TESTS=1 PYTHONPATH=.:/root/.axon_site python -m pytest
tests/test_raster_tpu.py --no-header -q -p no:cacheprovider`.
"""

import numpy as np
import pytest

import jax


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs real TPU (conftest forces CPU)")
def test_pallas_matches_oracle_on_hardware():
    import jax.numpy as jnp

    from trident_tpu.ops.raster_pallas import visibility_pallas
    from trident_tpu.ops.raster_ref import visibility_ref
    from trident_tpu.ops.vertex import triangle_setup

    w = h = 256
    rng = np.random.default_rng(7)
    t = 300
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.9, 0.9, 0.4]
           + rng.uniform(-0.15, 0.15, (t, 3, 3)))
    ww = np.ones((t, 3, 1), np.float32) * rng.uniform(0.5, 2.0, (t, 1, 1))
    clip = np.concatenate([pos[..., :2] * ww, (pos[..., 2:3] * 0.5 + 0.5) * ww, ww],
                          axis=-1).astype(np.float32)
    tri_vtx = jnp.arange(t * 3, dtype=jnp.int32).reshape(t, 3)
    setup = triangle_setup(jnp.asarray(clip.reshape(t * 3, 4)), tri_vtx,
                           jnp.ones(t, bool), w, h)
    ref = visibility_ref(setup, w, h)
    pal = visibility_pallas(setup, w, h)
    rt, pt = np.asarray(ref.tri_id), np.asarray(pal.tri_id)
    assert (rt != pt).sum() == 0
    np.testing.assert_allclose(np.asarray(ref.depth), np.asarray(pal.depth),
                               atol=1e-6)
