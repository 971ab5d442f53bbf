"""Windowed one-hot MXU shadow-map fetch (ops/shadow_pallas.py).

The MXU path must be BIT-IDENTICAL to the gather path: the kernel
returns the exact map bits (four 8-bit bf16 chunk planes, integer-exact
selection) and the factor's compare/lerp/mask code is shared verbatim.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trident_tpu.ops import kernel_knobs
from trident_tpu.ops import shadow_pallas as sp
from trident_tpu.ops.shadow import ShadowParams, shadow_factor


def _params(rng, s=256, bias=2e-3):
    depth = rng.uniform(0.1, 0.9, (s, s)).astype(np.float32)
    # realistic structure: a far plane with a near blob (windows stay
    # tight per block) + exact 1.0 background rows (cleared map regions)
    depth[: s // 4] = 1.0
    # a light view·proj that keeps a good fraction of world inside [0,1]²
    vp = np.array([[0.08, 0, 0, 0],
                   [0, 0.08, 0, 0],
                   [0, 0, 0.04, 0.5],
                   [0, 0, 0, 1]], np.float32)
    return ShadowParams(depth=jnp.asarray(depth), light_vp=jnp.asarray(vp),
                        enabled=jnp.asarray(True),
                        bias=jnp.asarray(bias, jnp.float32))


def _world(rng, h=64, w=96, spread=16.0):
    # spans inside AND outside the light frustum, plus depths near the
    # map values so compares sit on both sides of the bias
    return jnp.asarray(rng.uniform(-spread, spread, (h, w, 3))
                       .astype(np.float32))


@pytest.mark.parametrize("pcf", [False, True])
def test_mxu_factor_matches_gather(rng, pcf):
    shadow = _params(rng)
    world = _world(rng)
    with kernel_knobs.overrides(shadow_mxu=False):
        ref = np.asarray(shadow_factor(shadow, world, pcf=pcf))
    with kernel_knobs.overrides(shadow_mxu=True):
        out = np.asarray(shadow_factor(shadow, world, pcf=pcf))
    assert (ref != out).sum() == 0
    assert 0.0 < ref.mean() < 1.0          # both lit and shadowed pixels


@pytest.mark.parametrize("pcf", [False, True])
def test_mxu_factor_map_edges_and_outside(rng, pcf):
    """Pixels at the frustum border exercise the map-edge clamps; far
    outside pixels must not widen block windows (they ride -1 indices)
    and still come back lit=1 exactly like the gather path."""
    shadow = _params(rng, s=512)
    world = _world(rng, h=40, w=48, spread=40.0)   # mostly outside
    with kernel_knobs.overrides(shadow_mxu=False):
        ref = np.asarray(shadow_factor(shadow, world, pcf=pcf))
    with kernel_knobs.overrides(shadow_mxu=True):
        out = np.asarray(shadow_factor(shadow, world, pcf=pcf))
    assert (ref != out).sum() == 0
    assert (ref == 1.0).any()


def test_mxu_factor_negative_and_tie_depths(rng):
    """test_depth below zero (bias > depth) and exact-tie depths: the
    integer-domain fetch must reproduce the float compares bitwise."""
    shadow = _params(rng, bias=0.5)        # huge bias → negative tests
    world = _world(rng)
    with kernel_knobs.overrides(shadow_mxu=False):
        ref = np.asarray(shadow_factor(shadow, world, pcf=False))
    with kernel_knobs.overrides(shadow_mxu=True):
        out = np.asarray(shadow_factor(shadow, world, pcf=False))
    assert (ref != out).sum() == 0


def test_tap_bits_exact_fetch(rng):
    """Direct kernel check: shadow_tap_bits returns the map's exact f32
    bits for in-range indices and 0 for -1 sentinels."""
    s = 256
    depth = jnp.asarray(rng.uniform(0.0, 1.0, (s, s)).astype(np.float32))
    chunks = sp.build_shadow_chunks(depth)
    h, w = 24, 40
    yi = rng.integers(0, s, (h, w)).astype(np.int32)
    xi = rng.integers(0, s, (h, w)).astype(np.int32)
    yi[0, :5] = -1
    xi[0, :5] = -1
    bits = sp.shadow_tap_bits(chunks, jnp.asarray(yi), jnp.asarray(xi),
                              interpret=True)
    got = np.asarray(
        jax.lax.bitcast_convert_type(bits[..., 0], jnp.float32))
    want = np.asarray(depth)[np.clip(yi, 0, s - 1), np.clip(xi, 0, s - 1)]
    want[0, :5] = 0.0
    assert (got != want).sum() == 0


def test_unsupported_size_falls_back(rng):
    """A map the kernel can't window (size % 256 != 0) must silently use
    the gather path — same answer, no crash."""
    s = 192
    assert not sp.supported(s)
    depth = rng.uniform(0.1, 0.9, (s, s)).astype(np.float32)
    vp = np.eye(4, dtype=np.float32) * 0.05
    vp[3, 3] = 1.0
    shadow = ShadowParams(depth=jnp.asarray(depth), light_vp=jnp.asarray(vp),
                          enabled=jnp.asarray(True),
                          bias=jnp.asarray(2e-3, jnp.float32))
    world = _world(rng, h=16, w=16)
    with kernel_knobs.overrides(shadow_mxu=True):
        out = np.asarray(shadow_factor(shadow, world, pcf=True))
    assert out.shape == (16, 16, 1)
