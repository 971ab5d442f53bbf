"""In-kernel resolve pass (ops/resolve_pallas.py) vs the plane-gather path.

Both shade the SAME visibility output, so the resolved attribute image
must reproduce the gather path's frame up to fma-reassociation noise —
run via the interpreter on CPU (production binning + kernel logic).
"""

import numpy as np

import jax.numpy as jnp

from trident_tpu.core.config import EngineConfig, RenderConfig
from trident_tpu.ecs import (
    MeshComponent,
    Registry,
    TextureComponent,
    TransformComponent,
)
from trident_tpu.geometry.primitives import PrimitiveType
from trident_tpu.io.image import checkerboard
from trident_tpu.render.renderer import Renderer


def _scene(forward: bool, sampling="bilinear", w=256, h=128):
    cfg = EngineConfig(render=RenderConfig(
        width=w, height=h, use_pallas=True, sampling=sampling,
        plane_f16=False, forward_shading=forward))
    r = Renderer(cfg)
    reg = Registry()
    r.set_active_registry(reg)
    slot = r.acquire_texture("checker", checkerboard(64, 8))
    for i, (kind, x) in enumerate([(PrimitiveType.CUBE, -0.9),
                                   (PrimitiveType.SPHERE, 0.9)]):
        e = reg.create()
        t = reg.add(e, TransformComponent())
        t.position = np.array([x, 0.0, 0.0], np.float32)
        t.rotation = np.array([20.0, 30.0 + 40.0 * i, 0.0], np.float32)
        reg.add(e, MeshComponent(mesh_index=r.ensure_primitive(kind)))
        reg.add(e, TextureComponent(path="checker", slot=slot))
    r.editor_camera.set_position([0, 0.7, 3.4])
    r.editor_camera.look_at_target([0, 0, 0])
    return r


def test_forward_matches_gather_bilinear():
    fwd = _scene(True).read_frame().astype(np.int32)
    gat = _scene(False).read_frame().astype(np.int32)
    diff = np.abs(fwd - gat)
    # identical visibility; interpolants recomputed with different fma
    # order — allow a couple of 8-bit LSB on a tiny fraction of pixels
    assert diff.max() <= 3, diff.max()
    assert (diff > 1).mean() < 0.002


def _random_setup_and_records(seed=7, t=200, w=256, h=128):
    """Random visible scene + random (physically meaningless) resolve
    records — parity between resolve modes only needs identical inputs."""
    from trident_tpu.ops import planes as planes_mod
    from trident_tpu.ops.raster_pallas import CHUNK, visibility_pallas_tiled
    from trident_tpu.ops.vertex import triangle_setup

    rng = np.random.default_rng(seed)
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.9, 0.9, 0.4]
           + rng.uniform(-0.2, 0.2, (t, 3, 3))).astype(np.float32)
    ww = np.ones((t, 3, 1), np.float32) * rng.uniform(
        0.5, 2.0, (t, 1, 1)).astype(np.float32)
    clip = np.concatenate(
        [pos[..., :2] * ww, (pos[..., 2:3] * 0.5 + 0.5) * ww, ww],
        axis=-1).astype(np.float32)
    tri_vtx = jnp.arange(t * 3, dtype=jnp.int32).reshape(t, 3)
    setup = triangle_setup(jnp.asarray(clip.reshape(t * 3, 4)), tri_vtx,
                           jnp.ones(t, bool), w, h)
    rows = rng.standard_normal((t, planes_mod.RR_WIDTH)).astype(np.float32)
    records = planes_mod.chunk_resolve_rows(jnp.asarray(rows), CHUNK)
    return setup, records


def _vis_resolve(setup, records, w, h, skip):
    """visibility + resolve in ONE jit (eager interpret-mode kernels cost
    minutes; the jitted graph compiles in seconds and persists in the
    compilation cache). bins' static n_pairs stays a Python int because
    the whole pipeline traces together."""
    import jax

    from trident_tpu.ops.raster_pallas import visibility_pallas_tiled
    from trident_tpu.ops.resolve_pallas import resolve_attrs_pallas

    def f(s, rec):
        bins, _, tri_tiles, _ = visibility_pallas_tiled(s, w, h,
                                                        interpret=True)
        return resolve_attrs_pallas(bins, tri_tiles, rec, w, h,
                                    interpret=True, skip=skip)

    return jax.jit(f)(setup, records)


def test_resolve_skip_fastpath_bit_exact():
    """The loser fast-path (TRIDENT_RESOLVE_SKIP) must be a pure
    scheduling change: owners execute identical ops, so the attribute
    image matches the always-run path BIT-EXACTLY — including tiles that
    are touched by pairs but entirely background (both modes yield 0)."""
    w, h = 256, 128
    setup, records = _random_setup_and_records(w=w, h=h)
    base = _vis_resolve(setup, records, w, h, skip=False)
    fast = _vis_resolve(setup, records, w, h, skip=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(fast))
    assert np.abs(np.asarray(base)).sum() > 0  # scene actually drew


def test_resolve_half_contraction_bit_exact(monkeypatch):
    """TRIDENT_RESOLVE_HALF (two gated K=CHUNK/2 contractions) selects the
    same winner rows as the single K=CHUNK dot — exactly: the one-hot
    halves partition the chunk, so each pixel's record row is produced by
    precisely one half."""
    from trident_tpu.ops import resolve_pallas as rp

    w, h = 256, 128
    setup, records = _random_setup_and_records(w=w, h=h)
    frames = {}
    for half in (False, True):
        monkeypatch.setattr(rp, "RESOLVE_HALF", half)
        frames[half] = np.asarray(_vis_resolve(setup, records, w, h,
                                               skip=False))
    np.testing.assert_array_equal(frames[False], frames[True])
    assert np.abs(frames[False]).sum() > 0

    # ...and composed with the loser fast-path
    monkeypatch.setattr(rp, "RESOLVE_HALF", True)
    fast = np.asarray(_vis_resolve(setup, records, w, h, skip=True))
    np.testing.assert_array_equal(frames[True], fast)


def test_resolve_prec_split_bit_exact(monkeypatch):
    """TRIDENT_RESOLVE_PREC=split (3-way bf16 record decomposition, three
    DEFAULT-precision dots) must reproduce the fp32-pinned select
    BIT-EXACTLY: hi = bf16(r), mid = bf16(r−hi), lo = bf16(r−hi−mid)
    cover f32's 24 significand bits, and the f32 accumulator reassembles
    exactly r. This is the cheap-exact candidate if the fp32 contract pin
    measures expensive on hardware (PERF.md roadmap item 10)."""
    from trident_tpu.ops import resolve_pallas as rp

    w, h = 256, 128
    setup, records = _random_setup_and_records(w=w, h=h)
    frames = {}
    for mode in ("fp32", "split"):
        monkeypatch.setattr(rp, "_PREC_MODE", mode)
        frames[mode] = np.asarray(_vis_resolve(setup, records, w, h,
                                               skip=False))
    np.testing.assert_array_equal(frames["fp32"], frames["split"])
    assert np.abs(frames["fp32"]).sum() > 0

    # composed with RESOLVE_HALF + the loser fast-path
    monkeypatch.setattr(rp, "RESOLVE_HALF", True)
    monkeypatch.setattr(rp, "_PREC_MODE", "split")
    both = np.asarray(_vis_resolve(setup, records, w, h, skip=True))
    np.testing.assert_array_equal(frames["fp32"], both)


def test_resolve_transposed_records_bit_exact(monkeypatch):
    """The transposed record layout (planes.RESOLVE_TR: (RW, (NC+1)·C)
    columns, 32 KB per resolve block instead of 128 KB of mostly lane
    padding) must reproduce the lane-major layout BIT-EXACTLY: same
    contraction terms, only the operand side differs. Covers fp32, the
    split decomposition on top of TR, and the skip fast-path."""
    from trident_tpu.ops import planes as planes_mod
    from trident_tpu.ops import resolve_pallas as rp
    from trident_tpu.ops.raster_pallas import CHUNK

    w, h = 256, 128
    setup, records = _random_setup_and_records(w=w, h=h)
    # records: (NC+1, C, RW) — the TR twin packs the same rows as columns
    nc1, c, rw = records.shape
    cols = jnp.asarray(np.asarray(records).reshape(nc1 * c, rw).T)
    records_tr = cols[:, :]                        # (RW, (NC+1)·C)
    assert records_tr.shape == (rw, nc1 * c)

    base = np.asarray(_vis_resolve(setup, records, w, h, skip=False))
    for mode in ("fp32", "split"):
        monkeypatch.setattr(rp, "_PREC_MODE", mode)
        tr_out = np.asarray(_vis_resolve(setup, records_tr, w, h,
                                         skip=False))
        np.testing.assert_array_equal(base, tr_out, err_msg=f"tr/{mode}")
    monkeypatch.setattr(rp, "_PREC_MODE", "fp32")
    fast = np.asarray(_vis_resolve(setup, records_tr, w, h, skip=True))
    np.testing.assert_array_equal(base, fast)
    assert np.abs(base).sum() > 0


def test_resolve_compact_v2_bit_exact(monkeypatch):
    """Owning-pair compaction (TRIDENT_RESOLVE_COMPACT, cumsum+scatter v2)
    runs the resolve grid over owners only; the attribute image must match
    the full grid bit-exactly — owners execute identical steps in
    identical order, losers never touched the output."""
    from trident_tpu.ops import resolve_pallas as rp

    w, h = 256, 128
    setup, records = _random_setup_and_records(w=w, h=h)
    base = np.asarray(_vis_resolve(setup, records, w, h, skip=False))
    monkeypatch.setattr(rp, "RESOLVE_COMPACT", True)
    comp = np.asarray(_vis_resolve(setup, records, w, h, skip=False))
    np.testing.assert_array_equal(base, comp)
    assert np.abs(base).sum() > 0


def test_resolve_cols_builder_matches_rows_builder():
    """build_resolve_cols is the column-native twin of build_resolve_rows:
    same RR_* layout, bit-identical values (identical einsum contractions,
    transposed output axis order)."""
    from trident_tpu.ops import planes as planes_mod

    setup, _ = _random_setup_and_records()
    t = setup.edge.shape[0]
    rng = np.random.default_rng(3)
    nrm = jnp.asarray(rng.standard_normal((t, 3, 3)).astype(np.float32))
    uv = jnp.asarray(rng.standard_normal((t, 3, 2)).astype(np.float32))
    col = jnp.asarray(rng.standard_normal((t, 3, 3)).astype(np.float32))
    tri_draw = jnp.zeros((t,), jnp.int32)
    consts = jnp.asarray(rng.standard_normal((1, 12)).astype(np.float32))
    for vc in (None, col):
        rows = planes_mod.build_resolve_rows(setup, nrm, uv, tri_draw,
                                             consts, vc)
        cols = planes_mod.build_resolve_cols(setup, nrm, uv, tri_draw,
                                             consts, vc)
        np.testing.assert_array_equal(np.asarray(rows).T, np.asarray(cols))


def test_resolve_skip_empty_scene():
    """No owners at all: every step is a loser aliasing the padding pair;
    the attribute image must come back all zeros, not garbage."""
    from trident_tpu.ops import planes as planes_mod
    from trident_tpu.ops.raster_pallas import CHUNK
    from trident_tpu.ops.vertex import triangle_setup

    t, w, h = 8, 256, 64
    clip = np.zeros((t * 3, 4), np.float32)         # degenerate → invalid
    clip[:, 3] = 1.0
    setup = triangle_setup(jnp.asarray(clip),
                           jnp.arange(t * 3, dtype=jnp.int32).reshape(t, 3),
                           jnp.ones(t, bool), w, h)
    rows = np.ones((t, planes_mod.RR_WIDTH), np.float32)
    records = planes_mod.chunk_resolve_rows(jnp.asarray(rows), CHUNK)
    out = _vis_resolve(setup, records, w, h, skip=True)
    assert np.abs(np.asarray(out)).sum() == 0


def test_forward_matches_gather_trilinear_ssaa():
    def scene(forward):
        cfg = EngineConfig(render=RenderConfig(
            width=128, height=128, use_pallas=True, sampling="trilinear",
            plane_f16=False, forward_shading=forward, supersample=2))
        r = Renderer(cfg)
        reg = Registry()
        r.set_active_registry(reg)
        slot = r.acquire_texture("checker", checkerboard(64, 8))
        e = reg.create()
        t = reg.add(e, TransformComponent())
        t.rotation = np.array([25.0, 40.0, 0.0], np.float32)
        reg.add(e, MeshComponent(
            mesh_index=r.ensure_primitive(PrimitiveType.CUBE)))
        reg.add(e, TextureComponent(path="checker", slot=slot))
        r.editor_camera.set_position([0, 0.8, 3.2])
        r.editor_camera.look_at_target([0, 0, 0])
        return r.read_frame().astype(np.int32)

    diff = np.abs(scene(True) - scene(False))
    assert diff.max() <= 3, diff.max()
    assert (diff > 1).mean() < 0.002


def test_fused_visibility_resolve_bit_exact():
    """TRIDENT_FUSE (one pair-grid pass streaming visibility AND resolve
    records, attrs merged in lock-step with the lexicographic (depth,tid)
    merge) must reproduce the two-pass pipeline BIT-EXACTLY: same winner
    ids and depth, and the same attribute image in every channel."""
    import jax

    from trident_tpu.ops.raster_pallas import visibility_pallas_tiled
    from trident_tpu.ops.resolve_pallas import (
        fused_visibility_resolve_pallas, resolve_attrs_pallas,
    )

    from trident_tpu.ops import planes as planes_mod
    from trident_tpu.ops.raster_pallas import CHUNK

    w, h = 256, 128
    setup, records = _random_setup_and_records(w=w, h=h)
    # the fused path requires the transposed (production-default) layout;
    # use it on BOTH sides so the comparison is apples-to-apples
    rng = np.random.default_rng(7)
    rows = rng.standard_normal((200, planes_mod.RR_WIDTH)).astype(np.float32)
    records = planes_mod.chunk_resolve_cols(jnp.asarray(rows.T), CHUNK)

    def two_pass(s, rec):
        bins, depth_t, tri_t, _ = visibility_pallas_tiled(s, w, h,
                                                          interpret=True)
        at = resolve_attrs_pallas(bins, tri_t, rec, w, h, interpret=True,
                                  skip=False)
        return depth_t, tri_t, at

    def fused(s, rec):
        from trident_tpu.ops.raster_pallas import TILE_W, untile_frame
        _, depth_t, tri_t, attrs_t, _ = fused_visibility_resolve_pallas(
            s, rec, w, h, interpret=True)
        ntx = -(-w // TILE_W)
        nty = attrs_t.shape[0] // ntx
        return depth_t, tri_t, untile_frame(attrs_t, ntx, nty)[:h, :w]

    d0, t0, a0 = jax.jit(two_pass)(setup, records)
    d1, t1, a1 = jax.jit(fused)(setup, records)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    assert np.abs(np.asarray(a0)).sum() > 0


def test_fused_requires_acc(monkeypatch):
    import pytest

    from trident_tpu.ops import raster_pallas as rp
    from trident_tpu.ops.resolve_pallas import (
        fused_visibility_resolve_pallas,
    )

    w, h = 256, 128
    setup, records = _random_setup_and_records(w=w, h=h)
    monkeypatch.setattr(rp, "ACC", False)
    with pytest.raises(ValueError, match="acc=True"):
        fused_visibility_resolve_pallas(setup, records, w, h,
                                        interpret=True)


def test_fused_vertex_colors_bit_exact():
    """FUSE with the vertex-color interpolants (RR_WIDTH_VCOLOR records,
    color planes folded into the color factor) matches the two-pass
    resolve bitwise."""
    import jax

    from trident_tpu.ops import planes as planes_mod
    from trident_tpu.ops.raster_pallas import (
        CHUNK, TILE_W, untile_frame, visibility_pallas_tiled,
    )
    from trident_tpu.ops.resolve_pallas import (
        fused_visibility_resolve_pallas, resolve_attrs_pallas,
    )

    w, h = 256, 128
    setup, _ = _random_setup_and_records(w=w, h=h)
    rng = np.random.default_rng(11)
    rows = rng.standard_normal(
        (200, planes_mod.RR_WIDTH_VCOLOR)).astype(np.float32)
    records = planes_mod.chunk_resolve_cols(jnp.asarray(rows.T), CHUNK)

    def two_pass(s, rec):
        bins, _, tri_t, _ = visibility_pallas_tiled(s, w, h, interpret=True)
        return resolve_attrs_pallas(bins, tri_t, rec, w, h, interpret=True,
                                    vertex_colors=True, skip=False)

    def fused(s, rec):
        _, _, _, attrs_t, _ = fused_visibility_resolve_pallas(
            s, rec, w, h, vertex_colors=True, interpret=True)
        ntx = -(-w // TILE_W)
        nty = attrs_t.shape[0] // ntx
        return untile_frame(attrs_t, ntx, nty)[:h, :w]

    a0 = np.asarray(jax.jit(two_pass)(setup, records))
    a1 = np.asarray(jax.jit(fused)(setup, records))
    np.testing.assert_array_equal(a0, a1)
    assert np.abs(a0).sum() > 0
