"""Production Pallas rasterizer on CPU via the interpreter.

Runs the REAL binning + kernel logic (ops/raster_pallas.py) with
interpret=True so regressions in the production visibility path fail CI,
not just the hardware-gated parity test. Covers the capacity paths the
oracle comparison alone cannot: pair-budget truncation, big-chunk drops,
near-plane full-screen bboxes, and clustered geometry that overflows the
span limits (reference depth semantics: Pipeline.cpp:549-725).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trident_tpu.ops import raster_pallas
from trident_tpu.ops.raster_pallas import build_bins, visibility_pallas
from trident_tpu.ops.raster_ref import visibility_ref
from trident_tpu.ops.vertex import triangle_setup

W, H = 256, 64    # 2×8 = 16 raster tiles — small enough for the interpreter
WB = 384          # 3 tile cols > SPAN_X → full-screen bboxes become "big"


def _setup_from_ndc(pos, w_coord=None, w=W, h=H):
    """(T,3,3) NDC-ish positions (+ optional (T,3) w) → TriangleSetup."""
    t = pos.shape[0]
    ww = np.ones((t, 3, 1), np.float32) if w_coord is None \
        else np.asarray(w_coord, np.float32)[..., None]
    clip = np.concatenate(
        [pos[..., :2] * ww, (pos[..., 2:3] * 0.5 + 0.5) * ww, ww],
        axis=-1).astype(np.float32)
    tri_vtx = jnp.arange(t * 3, dtype=jnp.int32).reshape(t, 3)
    return triangle_setup(jnp.asarray(clip.reshape(t * 3, 4)), tri_vtx,
                          jnp.ones(t, bool), w, h)


def _random_scene(rng, t, spread=0.9, size=0.2):
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [spread, spread, 0.4]
           + rng.uniform(-size, size, (t, 3, 3)))
    ww = np.ones((t, 3), np.float32) * rng.uniform(0.5, 2.0, (t, 1))
    return _setup_from_ndc(pos, ww)


def _vis(setup, w=W, h=H):
    """Jitted interpret-mode visibility: EAGER execution of the interpret
    kernel dispatches op-by-op and costs minutes; the jitted graph
    compiles in seconds and hits the persistent cache. A fresh jit per
    call keeps monkeypatched module constants (PAIR_BUDGET, MID_CAPS…)
    out of any cross-test trace cache."""
    return jax.jit(lambda s: visibility_pallas(s, w, h, interpret=True))(setup)


def _ref(setup, w=W, h=H):
    return jax.jit(lambda s: visibility_ref(s, w, h))(setup)


def _assert_matches_ref(setup, atol=1e-5, w=W, h=H):
    ref = _ref(setup, w, h)
    pal = _vis(setup, w, h)
    rt, pt = np.asarray(ref.tri_id), np.asarray(pal.tri_id)
    assert (rt != pt).sum() == 0
    np.testing.assert_allclose(np.asarray(ref.depth), np.asarray(pal.depth),
                               atol=atol)
    return pal


def test_interpret_matches_oracle(rng):
    pal = _assert_matches_ref(_random_scene(rng, 200))
    assert np.asarray(pal.aux).sum() == 0


def test_empty_scene_is_background():
    pos = np.zeros((4, 3, 3), np.float32)  # degenerate → all invalid
    pal = _vis(_setup_from_ndc(pos))
    assert (np.asarray(pal.tri_id) == -1).all()
    assert np.allclose(np.asarray(pal.depth), 1.0)


def test_clustered_chunks_span_overflow(rng):
    """Many triangles crammed into one screen corner: chunk bboxes stay
    small, but several chunks land on the same tiles (revisit path)."""
    pos = (rng.uniform(-1, -0.6, (640, 1, 3)) * [1, 1, 0]
           + rng.uniform(-0.1, 0.1, (640, 3, 3))
           + [0, 0, 0.3])
    _assert_matches_ref(_setup_from_ndc(pos))


def test_near_plane_fullscreen_bbox(rng):
    """Triangles crossing w<=0 get conservative full-screen bboxes → their
    chunks go down the big-chunk broadcast path."""
    t = 96
    pos = rng.uniform(-0.8, 0.8, (t, 3, 3)).astype(np.float32)
    pos[:, :, 2] = rng.uniform(0.1, 0.9, (t, 3))
    ww = np.ones((t, 3), np.float32)
    ww[:5, 0] = -0.5  # some vertices behind the eye
    _assert_matches_ref(_setup_from_ndc(pos, ww, w=WB), w=WB)


def test_big_chunk_drop_is_counted_not_garbage(rng, monkeypatch):
    """With MAX_GLOBAL shrunk, excess big chunks are dropped: the output
    must stay well-formed (subset of the oracle) and aux[1] must count.
    Mid tiers are pinned empty so the wide chunks cascade straight to the
    whale slots (near-plane bboxes span the frame and would otherwise be
    absorbed by a mid tier's window, cap permitting)."""
    monkeypatch.setattr(raster_pallas, "MID_CAPS", (0, 0))
    monkeypatch.setattr(raster_pallas, "MAX_GLOBAL", 2)
    C = raster_pallas.CHUNK
    t = C * 5  # 5 chunks, all near-plane → all big
    pos = rng.uniform(-0.8, 0.8, (t, 3, 3)).astype(np.float32)
    pos[:, :, 2] = rng.uniform(0.1, 0.9, (t, 3))
    ww = np.ones((t, 3), np.float32)
    ww[::C, 0] = -0.5  # one near-crossing triangle per chunk → all 5 big
    setup = _setup_from_ndc(pos, ww, w=WB)
    pal = _vis(setup, w=WB)
    aux = np.asarray(pal.aux)
    assert aux[1] == 3  # 5 big chunks, 2 kept
    ref = _ref(setup, w=WB)
    rt, pt = np.asarray(ref.tri_id), np.asarray(pal.tri_id)
    # every shaded pixel is either background (dropped) or the oracle winner
    # from a kept chunk; never an id the oracle doesn't have there... the
    # depth test may promote a farther KEPT triangle where the winner was
    # dropped, so assert ids are valid and no uninitialized garbage leaks
    assert ((pt == -1) | ((pt >= 0) & (pt < t))).all()
    kept = np.isin(pt // C, [0, 1]) | (pt == -1)
    assert kept.all()


def test_pair_budget_truncation_is_clean(rng, monkeypatch):
    """With PAIR_BUDGET shrunk below the real pair count, overflow drops
    whole (tile, chunk) pairs — every pixel must be the untruncated
    result, background, or FARTHER real geometry (a dropped nearer
    winner). The round-1 bug left uninitialized memory: depths nearer
    than the true render, ids beyond the triangle count. aux[0] counts
    the dropped pairs, and the degradation is deterministic."""
    setup = _random_scene(rng, 256, spread=0.95, size=0.3)
    full = _vis(setup)
    n_real = int(np.asarray(
        jax.jit(lambda s: build_bins(s, W, H).n_real)(setup)))
    assert n_real > 8           # enough pairs that halving the budget bites
    budget = n_real // 2
    monkeypatch.setattr(raster_pallas, "PAIR_BUDGET", budget)
    pal = _vis(setup)
    aux = np.asarray(pal.aux)
    assert aux[0] == n_real - budget
    pt, ft = np.asarray(pal.tri_id), np.asarray(full.tri_id)
    pd, fd = np.asarray(pal.depth), np.asarray(full.depth)
    match = (pt == ft) & (pd == fd)
    background = (pt == -1) & (pd == 1.0)
    # missing geometry can only REVEAL what is behind it: never a depth
    # nearer than the true render, never an out-of-range triangle id
    farther = (pd >= fd) & (pt >= -1) & (pt < setup.edge.shape[0])
    assert (match | background | farther).all()
    assert (~match).any() and match.any()   # truncation actually bit
    pal2 = _vis(setup)
    np.testing.assert_array_equal(pt, np.asarray(pal2.tri_id))


def test_visibility_under_jit(rng):
    """The production path runs inside the jitted frame function — the
    dynamic grid + interpret combination must trace."""
    setup = _random_scene(rng, 128)
    fn = jax.jit(lambda s: visibility_pallas(s, W, H, interpret=True),
                 static_argnames=())
    pal = fn(setup)
    ref = _ref(setup)
    assert (np.asarray(ref.tri_id) != np.asarray(pal.tri_id)).sum() == 0


def test_4k_scale_chunk_spans_bin_without_drops():
    """4K regression (round 3): chunk footprints scale with resolution —
    at 3840×2160 the ~2×2-tile chunks of the 1080p calibration become
    ~4×4, and a fixed base-tier span cascaded thousands of chunks through
    the capped mid tiers into counted whale drops (aux[1]=1077 on the
    ultra4k bench scene). build_bins must scale its base span with the
    frame's tile extent so a 4K-scale dense scene bins with ZERO drops.
    Binning only — no kernel run, so the full 4K grid stays cheap."""
    from trident_tpu.ops.raster_pallas import CHUNK, TILE_H, TILE_W

    w4k, h4k = 3840, 2160
    n_chunks = 512
    t = n_chunks * CHUNK
    rng = np.random.default_rng(7)
    # each chunk: triangles clustered so the chunk bbox spans ~4×4 tiles,
    # scattered across the full 4K frame (the ultra4k footprint pattern)
    cx = rng.uniform(0, w4k - 4 * TILE_W, n_chunks)
    cy = rng.uniform(0, h4k - 4 * TILE_H, n_chunks)
    span_px_x, span_px_y = 4 * TILE_W - 8, 4 * TILE_H - 8
    ox = rng.uniform(0, span_px_x, (n_chunks, CHUNK, 1))
    oy = rng.uniform(0, span_px_y, (n_chunks, CHUNK, 1))
    px = (cx[:, None, None] + ox + rng.uniform(4, 24, (n_chunks, CHUNK, 3)))
    py = (cy[:, None, None] + oy + rng.uniform(4, 24, (n_chunks, CHUNK, 3)))
    # pixel → NDC
    nx = (px.reshape(t, 3) / w4k) * 2 - 1
    ny = (py.reshape(t, 3) / h4k) * 2 - 1
    pos = np.stack([nx, ny, np.full_like(nx, 0.3)], axis=-1).astype(
        np.float32)
    setup = _setup_from_ndc(pos, w=w4k, h=h4k)
    bins = jax.jit(lambda s: build_bins(
        s, -(-w4k // TILE_W) * TILE_W, -(-h4k // TILE_H) * TILE_H))(setup)
    aux = np.asarray(bins.aux)
    assert aux[1] == 0, f"{aux[1]} chunks dropped at 4K scale"
    assert aux[0] == 0
    assert int(bins.n_real) > 0


def test_zskip_is_bit_exact_and_packs(rng, monkeypatch):
    """Hierarchical-Z pair skip (TRIDENT_ZSKIP): occluded-layer scenes
    must render BIT-IDENTICALLY with the skip on and off (the skip may
    only elide provably no-op merges), and build_bins must pack a nonzero
    depth bound into mask word 0's high bits for front-depth geometry.
    (Legacy bit-mask word layout — DYNHIT off; the DYNHIT+zskip A/B is
    test_dynhit_zskip_is_bit_exact.)"""
    _set_dynhit(monkeypatch, False)
    if not raster_pallas.ZSKIP_PACK:
        pytest.skip("ZSKIP bound does not fit the last mask word's spare "
                    "bits at this CHUNK/SUB/QGATE config")
    t = raster_pallas.CHUNK * 3
    # layer 1 (early triangle ids): near wall at NDC z=-0.6 covering most
    # of the frame; layer 2 (later ids → later chunks): far quads behind
    # it — exactly the geometry the skip elides. A few near-plane and
    # degenerate rows exercise the conservative (never-skip) paths.
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.9, 0.9, 0]
           + rng.uniform(-0.25, 0.25, (t, 3, 3))).astype(np.float32)
    half = t // 2
    # distinct per-triangle depths: constant-z layers put exact depth
    # ties on every overlap, where oracle-vs-kernel winner flips are
    # expected (ulp-tie class, see PERF.md round-3) — not what this test
    # is about
    pos[:half, :, 2] = rng.uniform(-0.7, -0.5, (half, 1))
    pos[half:, :, 2] = rng.uniform(0.6, 0.8, (t - half, 1))
    ww = np.ones((t, 3), np.float32)
    ww[7, 0] = -0.5            # near-plane crossing → zmin bound 0
    pos[11] = 0.0              # degenerate → invalid, excluded from bounds
    setup = _setup_from_ndc(pos, ww)

    monkeypatch.setattr(raster_pallas, "ZSKIP", False)
    off = _vis(setup)
    monkeypatch.setattr(raster_pallas, "ZSKIP", True)
    on = _vis(setup)

    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0
    _assert_matches_ref(setup)   # and both match the oracle (ZSKIP on)

    bins = jax.jit(lambda s: build_bins(
        s, -(-W // raster_pallas.TILE_W) * raster_pallas.TILE_W,
        -(-H // raster_pallas.TILE_H) * raster_pallas.TILE_H))(setup)
    zs = raster_pallas.ZSKIP_SHIFT
    words = [np.asarray(m) for m in bins.pair_mask]
    hi = words[-1] >> zs
    assert (hi > 0).any(), "no pair packed a nonzero depth bound"
    assert hi.max() <= raster_pallas.ZSKIP_SCALE
    # global conservativeness: the frame's min depth pixel is covered by
    # some pair, whose DEQUANTIZED bound (zparams base + q·step, the exact
    # f32 arithmetic the kernel runs) cannot exceed it. Per-pair tightness
    # is proven by the bit-exact on/off equality above.
    d = np.asarray(off.depth)
    assert (d < 1.0).any(), \
        "scene rendered no geometry — rng fixture change broke the precondition"
    dmin = d[d < 1.0].min()
    hitbits = words[-1] & ((1 << zs) - 1)
    for wd in words[:-1]:
        hitbits = hitbits | wd
    zp = np.asarray(bins.zparams)
    bound = (zp[0] + hi.astype(np.float32) * zp[1]).astype(np.float32)
    assert bound[hitbits > 0].min() <= dmin


_DERIVED = ("NSUB", "NQ", "MASK_BITS", "MASK_WORDS", "ZSKIP_SHIFT",
            "ZSKIP_PACK", "SPAN_X", "SPAN_Y", "PAIR_BUDGET", "DYN_B",
            "DPW", "DYN_WORDS", "CK_NBANKS")


def _set_flags(monkeypatch, **flags):
    """monkeypatch raster_pallas knob FLAGS (lowercase names) and run the
    real recompute_derived() for consistent deriveds — everything
    restored at test teardown (monkeypatch registers the originals
    before recompute overwrites them)."""
    for name in _DERIVED:
        if hasattr(raster_pallas, name):
            monkeypatch.setattr(raster_pallas, name,
                                getattr(raster_pallas, name))
    for k, v in flags.items():
        monkeypatch.setattr(raster_pallas, k.upper(), v)
    raster_pallas.recompute_derived()


def _set_dynhit(monkeypatch, on: bool):
    _set_flags(monkeypatch, dynhit=on)


def _set_qgate(monkeypatch, on: bool):
    """Consistently monkeypatch the QGATE-derived module constants.
    QGATE is exclusive with DYNHIT (the round-5 default), so BOTH legs
    of a qgate A/B run the static masked structure."""
    _set_dynhit(monkeypatch, False)
    nq = 4 if on else 1
    bits = raster_pallas.NSUB * nq
    mw = -(-bits // 30)
    shift = bits - 30 * (mw - 1)
    monkeypatch.setattr(raster_pallas, "QGATE", on)
    monkeypatch.setattr(raster_pallas, "NQ", nq)
    monkeypatch.setattr(raster_pallas, "MASK_WORDS", mw)
    monkeypatch.setattr(raster_pallas, "ZSKIP_SHIFT", shift)
    monkeypatch.setattr(raster_pallas, "ZSKIP_PACK",
                        (30 - shift) >= raster_pallas.ZSKIP_BITS)


def test_qgate_is_bit_exact(rng, monkeypatch):
    """Quarter-gated sub-block evaluation must render BIT-IDENTICALLY to
    the whole-tile sweep (gating only elides pixels outside the sub-block
    bbox, which the edge tests already reject)."""
    setup = _random_scene(rng, 300)
    _set_qgate(monkeypatch, False)
    off = _vis(setup)
    _set_qgate(monkeypatch, True)
    on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def _set_ckern(monkeypatch, on: bool):
    """Consistently monkeypatch the CKERN-derived module constants."""
    monkeypatch.setattr(raster_pallas, "CKERN", on)
    if on:
        monkeypatch.setattr(raster_pallas, "QGATE", False)
        bits = max(5, raster_pallas.NSUB.bit_length())
        monkeypatch.setattr(raster_pallas, "MASK_BITS", bits)
        monkeypatch.setattr(raster_pallas, "MASK_WORDS", 1)
        monkeypatch.setattr(raster_pallas, "ZSKIP_SHIFT", bits)
        monkeypatch.setattr(raster_pallas, "ZSKIP_PACK",
                            (30 - bits) >= raster_pallas.ZSKIP_BITS)


def test_ckern_is_bit_exact(rng, monkeypatch):
    """Compact-bank kernel: identical output to the masked kernel AND the
    oracle — duplicate-padding rows and the col-15 triangle ids must be
    invisible (idempotent lexicographic merge; f32-exact ids)."""
    setup = _random_scene(rng, 600)   # >1 chunk; varied hit counts
    off = _vis(setup)
    _set_ckern(monkeypatch, True)
    on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_ckern_zskip_is_bit_exact(rng, monkeypatch):
    """CKERN + hierarchical-Z: occluded-layer scene renders identically
    with the skip on and off (per-pair bound above the nhit bits)."""
    t = raster_pallas.CHUNK * 2
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.9, 0.9, 0]
           + rng.uniform(-0.25, 0.25, (t, 3, 3))).astype(np.float32)
    half = t // 2
    pos[:half, :, 2] = rng.uniform(-0.7, -0.5, (half, 1))
    pos[half:, :, 2] = rng.uniform(0.6, 0.8, (t - half, 1))
    setup = _setup_from_ndc(pos)
    _set_ckern(monkeypatch, True)
    monkeypatch.setattr(raster_pallas, "ZSKIP", False)
    off = _vis(setup)
    monkeypatch.setattr(raster_pallas, "ZSKIP", True)
    monkeypatch.setattr(raster_pallas, "ZORDER", True)
    on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_zorder_is_bit_exact(rng, monkeypatch):
    """Near-to-far pair ordering is correctness-neutral: the kernel merge
    is order-independent lexicographic (depth, tid), so ZORDER on/off must
    render BIT-IDENTICALLY — including on exact depth ties (two coplanar
    quads drawn at the same depth: later triangle id must win both ways)."""
    t = 64
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.9, 0.9, 0.3]
           + rng.uniform(-0.3, 0.3, (t, 3, 3))).astype(np.float32)
    pos[10] = pos[12]          # exact duplicate → exact depth tie
    pos[30] = pos[31]
    setup = _setup_from_ndc(pos)
    monkeypatch.setattr(raster_pallas, "ZORDER", False)
    off = _vis(setup)
    monkeypatch.setattr(raster_pallas, "ZORDER", True)
    on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_recpad_is_bit_exact(rng, monkeypatch):
    """Lane-padded visibility records (TRIDENT_RECPAD) must render
    BIT-IDENTICALLY — only the DMA layout changes, never the values the
    kernel reads (columns 16.. are zeros it never touches)."""
    setup = _random_scene(rng, 400)
    off = _vis(setup)
    monkeypatch.setattr(raster_pallas, "RECPAD", True)
    on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_rect_is_bit_exact(rng, monkeypatch):
    """Transposed dense records (TRIDENT_RECT): the in-kernel transpose
    restores the exact values — renders must be BIT-IDENTICAL.
    (RECT is exclusive with the DYNHIT default.)"""
    _set_dynhit(monkeypatch, False)
    setup = _random_scene(rng, 400)
    off = _vis(setup)
    monkeypatch.setattr(raster_pallas, "RECT", True)
    on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_acc_is_bit_exact(rng, monkeypatch):
    """Shared-accumulator masked kernel (TRIDENT_ACC, round 5): reducing +
    merging once per PAIR via the (SUB, npx) scratch must render
    BIT-IDENTICALLY to the per-sweep merge — same order-independent
    lexicographic (depth, tid) semantics, different association point.
    (Static sweep structure — DYNHIT requires ACC, so it is off here.)"""
    _set_dynhit(monkeypatch, False)
    setup = _random_scene(rng, 600)
    monkeypatch.setattr(raster_pallas, "ACC", False)
    off = _vis(setup)
    monkeypatch.setattr(raster_pallas, "ACC", True)
    on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_acc_zskip_is_bit_exact(rng, monkeypatch):
    """ACC + hierarchical-Z: a skipped sweep leaves sentinel scratch rows,
    which must lose the final merge exactly like a skipped per-sweep merge
    (occluded-layer scene, skip provably fires)."""
    t = raster_pallas.CHUNK * 2
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.9, 0.9, 0]
           + rng.uniform(-0.25, 0.25, (t, 3, 3))).astype(np.float32)
    half = t // 2
    pos[:half, :, 2] = rng.uniform(-0.7, -0.5, (half, 1))
    pos[half:, :, 2] = rng.uniform(0.6, 0.8, (t - half, 1))
    setup = _setup_from_ndc(pos)
    monkeypatch.setattr(raster_pallas, "ACC", True)
    monkeypatch.setattr(raster_pallas, "ZSKIP", False)
    off = _vis(setup)
    monkeypatch.setattr(raster_pallas, "ZSKIP", True)
    monkeypatch.setattr(raster_pallas, "ZORDER", True)
    on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_acc_qgate_is_bit_exact(rng, monkeypatch):
    """ACC composes with quarter gating: quarter sweeps accumulate into
    lane slices of the shared scratch; the single final merge must still
    equal the oracle and the non-ACC render."""
    setup = _random_scene(rng, 300)
    _set_qgate(monkeypatch, True)
    monkeypatch.setattr(raster_pallas, "ACC", False)
    off = _vis(setup)
    monkeypatch.setattr(raster_pallas, "ACC", True)
    on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_acc_depth_tie_is_bit_exact(rng, monkeypatch):
    """Exact depth ties across DIFFERENT sub-blocks of one pair: the
    accumulator's per-cell tie-break plus the final cross-sub max must
    pick the same winner as the per-sweep merge (max tid among min-depth
    entries, globally)."""
    _set_dynhit(monkeypatch, False)
    t = 96                     # spans several SUB=16 sub-blocks
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.9, 0.9, 0.3]
           + rng.uniform(-0.3, 0.3, (t, 3, 3))).astype(np.float32)
    pos[5] = pos[40]           # exact duplicates in different sub-blocks
    pos[20] = pos[85]
    setup = _setup_from_ndc(pos)
    monkeypatch.setattr(raster_pallas, "ACC", False)
    off = _vis(setup)
    monkeypatch.setattr(raster_pallas, "ACC", True)
    on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_exact_bins_is_bit_exact(rng, monkeypatch):
    """Exact-fit ragged pair emission (TRIDENT_EXACT_BINS, round 5): the
    flat cumsum+searchsorted pool must emit the same REAL pair set as the
    tiered bbox-window emission, so renders are BIT-IDENTICAL."""
    setup = _random_scene(rng, 600)
    monkeypatch.setattr(raster_pallas, "EXACT_BINS", False)
    off = _vis(setup)
    monkeypatch.setattr(raster_pallas, "EXACT_BINS", True)
    on = _assert_matches_ref(setup)
    assert np.asarray(on.aux).sum() == 0
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_exact_bins_pair_set_matches_tiers(rng, monkeypatch):
    """Binning-level check: both emissions must produce the identical
    sorted real-pair prefix (same keys, same count) when nothing drops —
    including a scene with whale chunks (near-plane full-frame bboxes),
    which the tier path broadcasts and the exact path claims by area."""
    t = 96
    pos = rng.uniform(-0.8, 0.8, (t, 3, 3)).astype(np.float32)
    pos[:, :, 2] = rng.uniform(0.1, 0.9, (t, 3))
    ww = np.ones((t, 3), np.float32)
    ww[:5, 0] = -0.5                      # near-plane → whale bboxes
    setup = _setup_from_ndc(pos, ww, w=WB)
    monkeypatch.setattr(raster_pallas, "EXACT_BINS", False)
    b0 = jax.jit(lambda s: build_bins(s, WB, H))(setup)
    monkeypatch.setattr(raster_pallas, "EXACT_BINS", True)
    b1 = jax.jit(lambda s: build_bins(s, WB, H))(setup)
    n0, n1 = int(b0.n_real), int(b1.n_real)
    assert int(np.asarray(b0.aux)[1]) == 0 and int(np.asarray(b1.aux)[1]) == 0
    assert n0 == n1
    k0 = np.stack([np.asarray(b0.pair_tile)[:n0],
                   np.asarray(b0.pair_chunk)[:n0]], -1)
    k1 = np.stack([np.asarray(b1.pair_tile)[:n1],
                   np.asarray(b1.pair_chunk)[:n1]], -1)
    assert (k0 == k1).all()


def test_exact_bins_pool_overflow_counted(rng, monkeypatch):
    """Chunks whose claim crosses the pool end drop to MISSING geometry,
    counted in aux[1] — never garbage (the degrade contract)."""
    monkeypatch.setattr(raster_pallas, "EXACT_BINS", True)
    monkeypatch.setattr(raster_pallas, "EXACT_POOL_PAD", 0)
    C = raster_pallas.CHUNK
    t = C * 5
    pos = rng.uniform(-0.8, 0.8, (t, 3, 3)).astype(np.float32)
    pos[:, :, 2] = rng.uniform(0.1, 0.9, (t, 3))
    ww = np.ones((t, 3), np.float32)
    ww[::C, 0] = -0.5                     # every chunk whale-sized
    setup = _setup_from_ndc(pos, ww, w=WB)
    pal = _vis(setup, w=WB)
    aux = np.asarray(pal.aux)
    assert aux[1] > 0                     # drops counted
    pt = np.asarray(pal.tri_id)
    assert ((pt == -1) | ((pt >= 0) & (pt < t))).all()


@pytest.mark.parametrize("acc", [False, True])
def test_depth_only_kernel_matches_full(rng, monkeypatch, acc):
    """The shadow pass's depth-only kernel variant (no tri output, plain
    min merge) must produce BIT-IDENTICAL depth to the full kernel —
    including on exact depth ties, where the winner id differs but the
    depth cannot."""
    from trident_tpu.ops.raster_pallas import visibility_pallas_tiled

    t = 300
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.9, 0.9, 0.3]
           + rng.uniform(-0.3, 0.3, (t, 3, 3))).astype(np.float32)
    pos[10] = pos[200]         # exact ties across chunks
    setup = _setup_from_ndc(pos)
    if not acc:
        _set_dynhit(monkeypatch, False)   # DYNHIT requires ACC
    monkeypatch.setattr(raster_pallas, "ACC", acc)
    full = jax.jit(lambda s: visibility_pallas_tiled(
        s, W, H, interpret=True)[1])(setup)
    donly = jax.jit(lambda s: visibility_pallas_tiled(
        s, W, H, interpret=True, depth_only=True)[1])(setup)
    assert (np.asarray(full) != np.asarray(donly)).sum() == 0


def test_dynhit_is_bit_exact(rng):
    """Dynamic hit-sub sweep (TRIDENT_DYNHIT, round 5): one fori_loop over
    the packed descending-q hit list must render BIT-IDENTICALLY to the
    static @pl.when sweep structure — same evaluations, same
    lexicographic semantics, no branch checks."""
    from trident_tpu.ops import kernel_knobs

    setup = _random_scene(rng, 600)
    off = _vis(setup)
    with kernel_knobs.overrides(dynhit=True):
        on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_dynhit_depth_tie_is_bit_exact(rng):
    """DYNHIT's 3-op strict-< accumulate relies on descending-q iteration
    for tid ties: exact duplicates across DIFFERENT sub-blocks (and
    different chunks) must still pick max-tid-at-min-depth, matching the
    6-op lexicographic path bit-for-bit."""
    from trident_tpu.ops import kernel_knobs

    t = raster_pallas.CHUNK + 96
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.9, 0.9, 0.3]
           + rng.uniform(-0.3, 0.3, (t, 3, 3))).astype(np.float32)
    pos[5] = pos[40]            # ties across sub-blocks (q=0 vs q=2)
    pos[20] = pos[85]
    pos[60] = pos[raster_pallas.CHUNK + 60]   # tie across chunks
    setup = _setup_from_ndc(pos)
    off = _vis(setup)
    with kernel_knobs.overrides(dynhit=True):
        on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_dynhit_zskip_is_bit_exact(rng):
    """DYNHIT + hierarchical-Z: the bound rides the nhit word's high bits
    and a skipped pair clamps the loop count to 0 — outputs must stay
    bit-identical (the skip is provably a no-op merge)."""
    from trident_tpu.ops import kernel_knobs

    t = raster_pallas.CHUNK * 2
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.9, 0.9, 0]
           + rng.uniform(-0.25, 0.25, (t, 3, 3))).astype(np.float32)
    half = t // 2
    pos[:half, :, 2] = rng.uniform(-0.7, -0.5, (half, 1))
    pos[half:, :, 2] = rng.uniform(0.6, 0.8, (t - half, 1))
    setup = _setup_from_ndc(pos)
    with kernel_knobs.overrides(dynhit=True):
        off = _vis(setup)
        with kernel_knobs.overrides(zskip=True, zorder=True):
            on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0


def test_dynhit_depth_only_matches_full(rng):
    """DYNHIT's depth-only body (shadow light pass) degenerates to a plain
    min accumulate — depth must be bit-identical to the full kernel's."""
    from trident_tpu.ops import kernel_knobs
    from trident_tpu.ops.raster_pallas import visibility_pallas_tiled

    t = 300
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.9, 0.9, 0.3]
           + rng.uniform(-0.3, 0.3, (t, 3, 3))).astype(np.float32)
    pos[10] = pos[200]
    setup = _setup_from_ndc(pos)
    with kernel_knobs.overrides(dynhit=True):
        full = jax.jit(lambda s: visibility_pallas_tiled(
            s, W, H, interpret=True)[1])(setup)
        donly = jax.jit(lambda s: visibility_pallas_tiled(
            s, W, H, interpret=True, depth_only=True)[1])(setup)
    assert (np.asarray(full) != np.asarray(donly)).sum() == 0


def test_dynhit_requires_compatible_knobs():
    """DYNHIT validation: exclusive with CKERN/QGATE/RECT, requires ACC
    and sublane-aligned SUB — each must fail loudly (and leave the knob
    set restored)."""
    from trident_tpu.ops import kernel_knobs

    before = kernel_knobs.snapshot()
    for bad in ({"dynhit": True, "ckern": True},
                {"dynhit": True, "qgate": True},
                {"dynhit": True, "rect": True},
                {"dynhit": True, "acc": False},
                {"dynhit": True, "sub": 12, "chunk": 240}):
        with pytest.raises(ValueError):
            kernel_knobs.apply(bad)
    assert kernel_knobs.snapshot() == before


def test_treset_off_is_bit_exact(rng, monkeypatch):
    """Dropping the per-pair run_t scratch reset (TRIDENT_TRESET=0) must
    be invisible: stale tids only survive under sentinel run_d rows (a
    valid dm writes depth and tid in the same select), and the final
    merge excludes sentinel rows whenever cmin is valid while an
    all-sentinel pair loses the (cmin < acc_d) guard. Both the DYNHIT
    and static-ACC structures must match the reset path bitwise."""
    setup = _random_scene(rng, 600)
    for dynhit in (True, False):
        _set_dynhit(monkeypatch, dynhit)
        monkeypatch.setattr(raster_pallas, "TRESET", True)
        on = _vis(setup)
        monkeypatch.setattr(raster_pallas, "TRESET", False)
        off = _assert_matches_ref(setup)
        assert (np.asarray(on.tri_id) != np.asarray(off.tri_id)).sum() == 0
        assert (np.asarray(on.depth) != np.asarray(off.depth)).sum() == 0


def test_sort_pad_is_bit_exact(rng, monkeypatch):
    """SORT_PAD pads the emission slot array with extra sentinels to a
    measured-fast sort shape (r5hw9_sort.log: the TPU sort is
    shape-quantized — 131,072 keys sort faster than 73,664). Padding
    sentinels is semantically identity: they sort past the real-pair
    prefix, so bins AND the rendered output must match bitwise. Bounds
    shrunk so the small CPU scene actually crosses SORT_PAD_MIN."""
    setup = _random_scene(rng, 600)
    b0 = jax.jit(lambda s: build_bins(s, W, H))(setup)
    off = _vis(setup)
    n_slots = int(b0.pair_tile.shape[0])  # post-budget; natural slots vary
    monkeypatch.setattr(raster_pallas, "SORT_PAD", True)
    monkeypatch.setattr(raster_pallas, "SORT_PAD_MIN", 8)
    monkeypatch.setattr(raster_pallas, "SORT_PAD_TARGET",
                        max(4096, 2 * n_slots))
    b1 = jax.jit(lambda s: build_bins(s, W, H))(setup)
    assert (np.asarray(b0.pair_tile[:b0.n_pairs])
            == np.asarray(b1.pair_tile[:b0.n_pairs])).all()
    assert (np.asarray(b0.pair_chunk[:b0.n_pairs])
            == np.asarray(b1.pair_chunk[:b0.n_pairs])).all()
    assert int(b0.n_real) == int(b1.n_real)
    assert (np.asarray(b0.aux) == np.asarray(b1.aux)).all()
    on = _assert_matches_ref(setup)
    assert (np.asarray(off.tri_id) != np.asarray(on.tri_id)).sum() == 0
    assert (np.asarray(off.depth) != np.asarray(on.depth)).sum() == 0
