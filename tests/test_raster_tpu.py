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


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs real TPU (conftest forces CPU)")
def test_bench_scale_oracle_parity_on_hardware():
    """110k triangles at 1080p — bench-scale oracle-vs-Pallas on the real
    chip (round-2 proved TPU-only divergence exists: CHUNK=32 resolve hit
    a runtime FailedPrecondition CPU interpret could not see).

    The triangle cloud is CLUSTERED to the binner's contract: chunk-bbox
    decomposition contracts on spatial coherence (real scenes have it;
    every bench config measures aux=[0,0]). A UNIFORM random cloud is the
    pathological anti-case — at 110k triangles its 430 CHUNK=256 chunks
    intrinsically span 5-9 tiles each (Morton cell ~92 px; sorting can't
    beat the sqrt scaling), overflowing the capped mid tiers IDENTICALLY
    on CPU and TPU (aux=[0,251] both, r3hw8) — the 1.56M r3hw4/5 "winner
    mismatches" were that truncation, not numerics. Capacity behavior is
    covered by test_bench_configs_zero_overflow_on_hardware; THIS test
    pins oracle-vs-kernel numerics, so it draws chunk-sized clusters
    (~60 px of 256 heavily z-overlapping triangles each, like the bench
    scene's sphere patches) and asserts the aux precondition FIRST."""
    import jax.numpy as jnp

    from trident_tpu.ops.raster_pallas import visibility_pallas
    from trident_tpu.ops.raster_ref import visibility_ref
    from trident_tpu.ops.vertex import triangle_setup

    w, h = 1920, 1080
    rng = np.random.default_rng(11)
    k = 256                       # one chunk's worth of triangles
    ncl = 430                     # clusters, chunk-aligned in draw order
    t = ncl * k
    g = 21                        # cluster grid (21² = 441 ≥ 430)
    cy, cx = np.divmod(np.arange(ncl), g)
    centers = np.stack([(cx + 0.5) / g * 1.9 - 0.95,
                        (cy + 0.5) / g * 1.9 - 0.95], axis=-1)  # (ncl,2)
    pos = np.concatenate([
        (centers[:, None, :] + rng.uniform(-0.03, 0.03, (ncl, k, 2))
         ).reshape(t, 1, 2),
        rng.uniform(-0.4, 0.4, (t, 1, 1)),
    ], axis=-1) + rng.uniform(-0.004, 0.004, (t, 3, 3))
    ww = np.ones((t, 3, 1), np.float32) * rng.uniform(0.5, 2.0, (t, 1, 1))
    clip = np.concatenate(
        [pos[..., :2] * ww, (pos[..., 2:3] * 0.5 + 0.5) * ww, ww],
        axis=-1).astype(np.float32)
    tri_vtx = jnp.arange(t * 3, dtype=jnp.int32).reshape(t, 3)
    setup = triangle_setup(jnp.asarray(clip.reshape(t * 3, 4)), tri_vtx,
                           jnp.ones(t, bool), w, h)
    # oracle in 135-row bands, each FORCED before the next: the whole-frame
    # oracle scan builds (chunk, 3, 1080, 1920) f32 intermediates — at
    # chunk=64 that is ~1.6 GB per step, which crashed the TPU worker the
    # first time this suite ran on the chip (r3hw2.log 2026-08-18; the
    # crash then surfaced as an UNAVAILABLE on the NEXT dispatch, blaming
    # the Pallas call). Banding uses the oracle's own y_offset band path
    # (bit-identical global-pixel arithmetic, parallel/framebuffer.py).
    band_h, rt_b, rd_b = 135, [], []
    for y0 in range(0, h, band_h):
        band = visibility_ref(setup, w, band_h, chunk=32, y_offset=y0)
        rt_b.append(np.asarray(band.tri_id))
        rd_b.append(np.asarray(band.depth))
        print(f"oracle band y={y0} done", flush=True)
    rt = np.concatenate(rt_b, axis=0)
    rd = np.concatenate(rd_b, axis=0)
    pal = visibility_pallas(setup, w, h)
    aux = np.asarray(pal.aux)
    assert aux.sum() == 0, f"capacity overflow at bench scale: {aux}"
    pt = np.asarray(pal.tri_id)
    pd = np.asarray(pal.depth)
    mism = rt != pt
    # Mosaic and XLA fuse the edge/depth mul+add chains into fmas
    # differently, so a pixel sitting within an ulp of a DECISION
    # BOUNDARY can flip between the two sides (r3hw10/11: 14-20 of
    # 2.07M pixels on this scene). Two benign flavors, and every
    # mismatch must provably be one of them:
    #   (a) depth tie — both sides' winning depths agree to a few ulps;
    #   (b) cover-boundary flip — one side's winner evaluates within
    #       f32 evaluation noise of a cover constraint (an edge
    #       function, zi>=0, or zi<=wi crossing 0) at the pixel center,
    #       so the other side legitimately dropped it and fell through
    #       to a farther triangle (|dd| can then be large).
    # Anything else is a real divergence.
    n_mism = int(mism.sum())
    assert n_mism <= 200, f"{n_mism} winner mismatches vs oracle"
    edge_np = np.asarray(setup.edge, np.float64)
    z_np = np.asarray(setup.z, np.float64)
    w_np = np.asarray(setup.w, np.float64)
    eps32 = np.float32(2.0) ** -24
    TOL = 32.0        # noise band half-width, in eps32·term-scale units

    def near_boundary(tri, yy, xx):
        if tri < 0:
            return False
        pxc, pyc = xx + 0.5, yy + 0.5
        a, b, c = edge_np[tri, :, 0], edge_np[tri, :, 1], edge_np[tri, :, 2]
        e = a * pxc + b * pyc + c                     # (3,)
        scale_e = np.abs(a * pxc) + np.abs(b * pyc) + np.abs(c)
        zi = float(e @ z_np[tri])
        wi = float(e @ w_np[tri])
        scale_i = float(np.abs(e) @ np.abs(z_np[tri])
                        + np.abs(e) @ np.abs(w_np[tri]))
        margins = list(np.abs(e) / np.maximum(scale_e, 1e-300))
        margins += [abs(zi) / max(scale_i, 1e-300),
                    abs(wi - zi) / max(scale_i, 1e-300)]
        return min(margins) <= TOL * eps32

    if n_mism:
        bad = []
        for yy, xx in zip(*np.nonzero(mism)):
            d_r, d_p = rd[yy, xx], pd[yy, xx]
            tie = abs(d_r - d_p) <= 4 * np.spacing(
                np.float32(max(abs(d_r), abs(d_p))))
            if tie:
                continue
            # the nearer winner is the one the other side must have
            # boundary-dropped; accept if either winner is borderline
            if near_boundary(rt[yy, xx], yy, xx) or \
               near_boundary(pt[yy, xx], yy, xx):
                continue
            bad.append(((int(yy), int(xx)), int(rt[yy, xx]),
                        int(pt[yy, xx]), float(d_r), float(d_p)))
        assert not bad, (
            f"{len(bad)} non-tie non-boundary winner mismatches, e.g. "
            f"{bad[:5]}")
    # agreeing-winner depths: same plane, possibly different fma fusion —
    # a few ulps at most
    agree = ~mism
    np.testing.assert_allclose(rd[agree], pd[agree], rtol=1e-6, atol=1e-7)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs real TPU (conftest forces CPU)")
def test_golden_flavors_on_hardware():
    """All nine golden pipeline flavors rendered ON THE CHIP through the
    production Pallas raster, against the CPU-generated goldens. TPU↔CPU
    frame diff is 0.4-0.7 LSB mean (PERF.md round-2), so the gate is a
    small multiple of the CPU-CI gate."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import test_golden_flavors as tg
    from trident_tpu.io.image import load_rgba8

    orig_make = tg._make

    def pallas_make(**kw):
        kw.setdefault("use_pallas", True)     # production path on hardware
        return orig_make(**kw)

    tg._make = pallas_make
    try:
        failures = []
        for name, builder in sorted(tg.FLAVORS.items()):
            img = builder().read_frame()
            golden = load_rgba8(
                os.path.join(tg.GOLDEN_DIR, f"flavor_{name}.png"))
            diff = np.abs(img.astype(int) - golden.astype(int))
            frac = (diff > 3).mean()
            mean = float(diff.mean())
            print(f"flavor {name}: >3LSB frac={frac:.5f} mean={mean:.3f}",
                  flush=True)
            if frac > 0.01 or mean > 1.0:
                failures.append((name, frac, mean))
        assert not failures, f"hardware flavor drift: {failures}"
    finally:
        tg._make = orig_make


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs real TPU (conftest forces CPU)")
def test_bench_configs_zero_overflow_on_hardware():
    """aux == [0,0] at every bench config on the chip — the capacity
    headroom guarantee behind the published FPS numbers."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    for config in ("cube512", "spheres1080", "spheres1080_1m", "ultra4k"):
        renderer, registry, (w, h) = bench.build_scene(config)
        out = renderer.render_viewport(renderer.active_viewport)
        aux = (np.zeros(2, np.int64) if out.aux is None
               else np.asarray(out.aux).reshape(-1, 2).sum(axis=0))
        print(f"{config}: aux={aux.tolist()}", flush=True)
        assert aux.sum() == 0, f"{config}: overflow {aux.tolist()}"


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs real TPU (conftest forces CPU)")
def test_texel_mxu_matches_gather_on_hardware():
    """The windowed one-hot MXU texel sampler (ops/texel_pallas.py) vs
    the XLA gather path ON THE CHIP: selection must be exact (bf16-exact
    one-hots/bytes, f32 accumulate), so the only allowed divergence is
    fma-fusion noise. Mosaic-specific risks the CPU interpreter cannot
    see: the dynamic-trip fori, dynamic-start VMEM slab slices, and the
    M=16 dot shape."""
    import jax.numpy as jnp

    from trident_tpu.ops import shading
    from trident_tpu.ops import texel_pallas as tp
    from trident_tpu.io.image import checkerboard
    from trident_tpu.render.textures import TextureSlots

    store = TextureSlots()
    store.acquire("checker", checkerboard(128, 8))
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
    store.acquire("noise", img)
    tex = store.device_arrays()

    h, w = 256, 512
    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (h, w, 2)).astype(np.float32))
    mip = jnp.asarray(rng.uniform(0.0, 8.0, (h, w)).astype(np.float32))
    slot_img = rng.integers(1, 3, (h, w))
    rows = np.asarray(tex.sizes)[slot_img]
    size_hint = tuple(jnp.asarray(rows[..., i]) for i in range(4))

    @jax.jit
    def both(u, m):
        ref = shading.sample_texture(tex, None, u, m, mode="bilinear",
                                     size_hint=size_hint)
        mip_i = jnp.round(jnp.clip(
            m, 0.0, tex.max_level.astype(jnp.float32))).astype(jnp.int32)
        idx, fx, fy = shading.bilinear_index(tex, None, u, mip_i, size_hint)
        out = tp.sample_bilinear_mxu(tp.build_texel_table(tex.quads),
                                     idx, fx, fy)
        return ref, out

    ref, out = both(uv, mip)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    print(f"texel MXU vs gather on hardware: max err {err}", flush=True)
    assert err <= 2e-6, err
