#!/usr/bin/env python
"""Visibility-kernel cost decomposition on hardware (round 4).

The r4hw1 sweep showed quarter gating (2.4x fewer swept pixels) LOSES
2.6 FPS — so the kernel is not purely vector-bound. This bench times the
bare visibility pallas_call on the REAL flagship bins with doctored
masks to split the ~19 ms into:

  zero   — all mask bits cleared: per-pair fixed cost + branch checks
           (every @pl.when skips ... IF Mosaic actually branches)
  dflt   — the real masks (~5.8 hit subs/pair at defaults)
  full   — all NSUB bits set: fixed + branches + NSUB dense sweeps

marginal sweep time = (full - zero) / NSUB; branch+fixed = zero.
If zero ≈ full, @pl.when lowers to masked execution, not a branch —
and every mask-based pruning idea is dead on arrival.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/kbench.py
Env: KB_CONFIGS=zero,dflt,full KB_ITERS=30 TRIDENT_* knobs as usual.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from profile_stages import build_scene
    from trident_tpu.ops import raster_pallas as rp
    from trident_tpu.ops.vertex import triangle_setup, vertex_stage
    from trident_tpu.render.frame import (
        build_draw_params, gather_mesh_draws, geometry_to_device,
    )
    from trident_tpu.render.types import CameraParams

    width, height = 1920, 1080
    grid = int(os.environ.get("KB_GRID", "36"))
    iters = int(os.environ.get("KB_ITERS", "30"))
    print(f"backend={jax.default_backend()} grid={grid} CHUNK={rp.CHUNK} "
          f"SUB={rp.SUB} QGATE={rp.QGATE} ZORDER={rp.ZORDER} ACC={rp.ACC}",
          flush=True)

    r, reg = build_scene(width, height, grid)
    packed = r.geometry.packed()
    geo = geometry_to_device(packed)
    records_d = gather_mesh_draws(reg, r.geometry)
    plan, tri_draw = r._plan_cache.plan(packed, records_d, r.geometry.version)
    params, palette, shade = build_draw_params(
        records_d, plan.num_draws, material_table=r.geometry.material_table())
    cam = r.editor_camera.params()
    verts = vertex_stage(geo, plan, params,
                         CameraParams(cam.view, cam.proj, cam.position),
                         palette, skinned=False)
    setup = triangle_setup(verts.clip, plan.tri_vtx, plan.tri_valid,
                           width, height)
    ntx, nty = -(-width // rp.TILE_W), -(-height // rp.TILE_H)

    bins = jax.jit(lambda s: rp.build_bins(
        s, ntx * rp.TILE_W, nty * rp.TILE_H))(setup)
    n_real = int(bins.n_real)
    masks_np = [np.asarray(m) for m in bins.pair_mask]
    real = np.arange(bins.n_pairs) < n_real
    if rp.DYNHIT:
        # word 0 low bits = the hit COUNT (digits ride words 1..)
        nhits = (masks_np[0][real] % (1 << rp.ZSKIP_SHIFT)).sum()
        print(f"pairs={n_real} aux={np.asarray(bins.aux)} "
              f"hit_total={int(nhits)} "
              f"({nhits / max(n_real, 1):.1f}/pair of {rp.NSUB}, DYNHIT)",
              flush=True)
    else:
        hit_words = rp.MASK_BITS - 30 * (rp.MASK_WORDS - 1)
        nhits = sum(
            ((m[:, None] >> np.arange(30 if wd < rp.MASK_WORDS - 1
                                      else hit_words)[None, :]) & 1).sum()
            for wd, m in enumerate(masks_np))
        print(f"pairs={n_real} aux={np.asarray(bins.aux)} "
              f"hit_bits_total={int(nhits)} "
              f"({nhits / max(n_real, 1):.1f}/pair of {rp.MASK_BITS})",
              flush=True)

    def doctored(kind):
        if kind == "dflt":
            return bins
        words = []
        if rp.DYNHIT:
            # zero: nhit=0 everywhere; full: all NSUB subs hit, digits
            # descending q packed base-DYN_B, DPW per word
            nh = rp.NSUB if kind == "full" else 0
            words.append(jnp.where(jnp.asarray(real), nh, 0)
                         .astype(jnp.int32))
            digits = list(range(rp.NSUB - 1, -1, -1))
            for wd in range(rp.DYN_WORDS):
                seg = digits[wd * rp.DPW:(wd + 1) * rp.DPW]
                val = sum(d * rp.DYN_B ** k for k, d in enumerate(seg))
                words.append(jnp.where(jnp.asarray(real),
                                       val if kind == "full" else 0, 0)
                             .astype(jnp.int32))
            return bins._replace(pair_mask=tuple(words))
        hit_words = rp.MASK_BITS - 30 * (rp.MASK_WORDS - 1)
        for wd in range(rp.MASK_WORDS):
            bits = 30 if wd < rp.MASK_WORDS - 1 else hit_words
            val = (1 << bits) - 1 if kind == "full" else 0
            words.append(jnp.where(jnp.asarray(real), val, 0).astype(jnp.int32))
        return bins._replace(pair_mask=tuple(words))

    npx = rp.TILE_H * rp.TILE_W
    n_tiles = ntx * nty

    def _dense_kernel(band_ref, zp_ref, pair_tile_ref, pair_chunk_ref,
                      *refs, ntx: int):
        """No-@pl.when variant: every sub-block evaluated straight-line.
        vs 'full' masks (all branches true) isolates the region overhead."""
        rec_ref, depth_out, tri_out = refs[rp.MASK_WORDS:]
        i = pl.program_id(0)
        tile = pair_tile_ref[i]
        prev = pair_tile_ref[jnp.maximum(i - 1, 0)]
        first = jnp.logical_or(i == 0, tile != prev)
        cid = pair_chunk_ref[i]
        ty = tile // ntx + band_ref[0]
        tx = jax.lax.rem(tile, ntx)

        @pl.when(first)
        def _():
            depth_out[0] = jnp.full((1, npx), 1.0, jnp.float32)
            tri_out[0] = jnp.full((1, npx), -1, jnp.int32)

        r_ = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
        pxf = (tx * rp.TILE_W
               + jax.lax.rem(r_, rp.TILE_W)).astype(jnp.float32) + 0.5
        pyf = (ty * rp.TILE_H + r_ // rp.TILE_W).astype(jnp.float32) + 0.5
        for q in range(rp.NSUB):
            rec = rec_ref[q * rp.SUB:(q + 1) * rp.SUB, :]

            def col(j, rec=rec):
                return rec[:, j:j + 1]

            e0 = col(0) * pxf + col(1) * pyf + col(2)
            e1 = col(3) * pxf + col(4) * pyf + col(5)
            e2 = col(6) * pxf + col(7) * pyf + col(8)
            zi = (e0 * col(9) + e1 * col(10)) + e2 * col(11)
            wi = (e0 * col(12) + e1 * col(13)) + e2 * col(14)
            cover = ((e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                     & (wi > 1e-12) & (zi >= 0.0) & (zi <= wi))
            d = zi * pl.reciprocal(jnp.where(cover, wi, 1.0), approx=False)
            dm = jnp.where(cover, d, rp.DEPTH_SENTINEL)
            cmin = jnp.min(dm, axis=0, keepdims=True)
            tid = ((cid - 1) * rp.CHUNK + q * rp.SUB
                   + jax.lax.broadcasted_iota(jnp.int32, (rp.SUB, 1), 0))
            win = jnp.max(jnp.where(dm <= cmin, tid, -1), axis=0,
                          keepdims=True)
            acc_d = depth_out[0]
            acc_t = tri_out[0]
            better = (win >= 0) & ((cmin < acc_d)
                                   | ((cmin == acc_d) & (win > acc_t)))
            depth_out[0] = jnp.where(better, cmin, acc_d)
            tri_out[0] = jnp.where(better, win, acc_t)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # fused-pass floor probe (route-to-60 leg 1): a resolve-shaped second
    # block ((3, RW=32, CHUNK) bf16, the split-precision tr layout) rides
    # the SAME grid step as the visibility records. dual-vs-dflt is the
    # marginal cost of co-streaming it: ~0 means the per-pair DMA floor is
    # latency (two operand copies pipeline together) and a fused
    # visibility+resolve kernel saves a whole pass floor; ~1 µs/pair means
    # the copies serialize and fusion only saves merge overhead.
    rec2 = jnp.zeros(
        (3, 32, (bins.records.shape[0] // rp.CHUNK) * rp.CHUNK),
        jnp.bfloat16)

    def _dual_kernel(band_ref, zp_ref, tiles_ref, chunks_ref, *refs,
                     ntx: int):
        masks = refs[:rp.MASK_WORDS]
        rec, rec2_ref, depth_out, tri_out = refs[rp.MASK_WORDS:
                                                 rp.MASK_WORDS + 4]
        rest = refs[rp.MASK_WORDS + 4:]
        rp._visibility_kernel(band_ref, zp_ref, tiles_ref, chunks_ref,
                              *masks, rec, depth_out, tri_out, *rest,
                              ntx=ntx)
        # consume one lane strip so Mosaic cannot elide the block copy;
        # 1e-30-scaled, numerically invisible for a timing probe
        depth_out[0] = depth_out[0] + jnp.sum(
            rec2_ref[0, 0:1, :].astype(jnp.float32)) * 1e-30

    def run_kernel(b, token, dense=False, dual=False):
        import functools

        band = jnp.zeros((1,), jnp.int32)
        if rp.CKERN:
            kernel = functools.partial(rp._visibility_kernel_ck, ntx=ntx)
            rec_spec = pl.BlockSpec(
                (1, rp.CK_NBANKS * rp.CK_BANK * rp.SUB, 16),
                lambda i, band, zp, tiles, chunks, *masks: (i, 0, 0),
                memory_space=pltpu.VMEM)
        else:
            kernel = functools.partial(
                _dual_kernel if dual else
                (_dense_kernel if dense else rp._visibility_kernel), ntx=ntx)
            if rp.RECT:
                rec_spec = pl.BlockSpec(
                    (16, rp.CHUNK),
                    lambda i, band, zp, tiles, chunks, *masks:
                    (0, chunks[i]),
                    memory_space=pltpu.VMEM)
            else:
                rec_spec = pl.BlockSpec(
                    (rp.CHUNK, b.records.shape[1]),
                    lambda i, band, zp, tiles, chunks, *masks:
                    (chunks[i], 0),
                    memory_space=pltpu.VMEM)
        scratch = ([pltpu.VMEM((rp.SUB, npx), jnp.float32),
                    pltpu.VMEM((rp.SUB, npx), jnp.int32)]
                   if (rp.ACC and not rp.CKERN and not dense) else [])
        in_specs = [rec_spec]
        if dual:
            in_specs.append(pl.BlockSpec(
                (3, 32, rp.CHUNK),
                lambda i, band, zp, tiles, chunks, *masks:
                (0, 0, chunks[i]),
                memory_space=pltpu.VMEM))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4 + rp.MASK_WORDS,
            grid=(jnp.maximum(b.n_real, 1),),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, npx),
                             lambda i, band, zp, tiles, chunks, *masks:
                             (tiles[i], 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, npx),
                             lambda i, band, zp, tiles, chunks, *masks:
                             (tiles[i], 0, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch)
        args = [(b.compact if rp.CKERN else b.records) + token]
        if dual:
            args.append(rec2)
        depth, tri = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((n_tiles, 1, npx), jnp.float32),
                       jax.ShapeDtypeStruct((n_tiles, 1, npx), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=os.environ.get("KB_INTERPRET", "0") == "1",
        )(band, b.zparams, b.pair_tile, b.pair_chunk, *b.pair_mask, *args)
        return depth[0, 0, 0] * 0.0

    if os.environ.get("KB_BINS", "0") == "1":
        # binning-chain decomposition (round 5, VERDICT item 2): split the
        # build_bins cost into records materialization / emission+sort /
        # everything else, plus a standalone same-size sort for the
        # ns-per-key ground truth.
        def timed(label, f, *args):
            out = f(*args, jnp.zeros((), jnp.float32))
            np.asarray(out.ravel()[0])
            t0 = time.perf_counter()
            tok = jnp.zeros((), jnp.float32)
            for _ in range(iters):
                out = f(*args, tok)
                tok = out.ravel()[0].astype(jnp.float32) * 0.0
            np.asarray(tok)
            ms = (time.perf_counter() - t0) / iters * 1000.0
            print(f"{label}: {ms:.2f} ms/call", flush=True)

        t = setup.edge.shape[0]
        n_chunks = max(1, -(-t // rp.CHUNK))
        tpad = n_chunks * rp.CHUNK

        timed("build_bins", jax.jit(lambda s, tok: rp.build_bins(
            s._replace(edge=s.edge + tok), ntx * rp.TILE_W,
            nty * rp.TILE_H).pair_tile), setup)
        timed("records_only", jax.jit(lambda s, tok: rp._build_records(
            s._replace(edge=s.edge + tok), tpad)), setup)

        # build_bins with records stubbed to a broadcast constant — the
        # (build_bins - stub - records_only) residual is XLA overlap
        orig_br = rp._build_records
        try:
            rp._build_records = (
                lambda s, tp, setup_cols=None:
                jnp.zeros(((n_chunks + 1) * rp.CHUNK, 16), jnp.float32)
                + s.edge[0, 0, 0] * 0.0)
            timed("bins_minus_records", jax.jit(lambda s, tok: rp.build_bins(
                s._replace(edge=s.edge + tok), ntx * rp.TILE_W,
                nty * rp.TILE_H).pair_tile), setup)
        finally:
            rp._build_records = orig_br

        # ground truth: one i32 sort of the emission-sized key array
        if rp.EXACT_BINS:
            f_ = 1
            while ntx > 68 * f_ or nty > 40 * f_:
                f_ *= 2
            nslots = n_chunks * (rp.SPAN0 * f_) ** 2 + rp.EXACT_POOL_PAD
        else:
            nslots = (n_chunks * (rp.SPAN0 ** 2)
                      + sum(min(c, n_chunks) * ((rp.SPAN0 << (k + 1)) ** 2)
                            for k, c in enumerate(rp.MID_CAPS))
                      + min(rp.MAX_GLOBAL, n_chunks) * n_tiles)
        keys = jnp.arange(nslots, dtype=jnp.int32)[::-1]
        timed(f"raw_sort_{nslots}", jax.jit(
            lambda k, tok: jnp.sort(k + tok.astype(jnp.int32))), keys)

        # repeat build_bins LAST: the r5hw2 run read 32.4 ms for the FIRST
        # timed stage vs 3.07 for the same graph with records stubbed —
        # first-section remote-helper warm-up is the suspect; the repeat
        # separates order effects from real cost
        timed("build_bins(again)", jax.jit(lambda s, tok: rp.build_bins(
            s._replace(edge=s.edge + tok), ntx * rp.TILE_W,
            nty * rp.TILE_H).pair_tile), setup)
        # and the real consumer shape: pair list + masks + records all live
        timed("build_bins(full outputs)", jax.jit(
            lambda s, tok: (lambda b: b.pair_tile.astype(jnp.float32).sum()
                            + b.records[0, 0] + sum(m.sum() for m in
                                                    b.pair_mask)
                            .astype(jnp.float32))(rp.build_bins(
                                s._replace(edge=s.edge + tok),
                                ntx * rp.TILE_W, nty * rp.TILE_H))), setup)

    if os.environ.get("KB_SORT", "0") == "1":
        # sort-shape ladder (route-to-60 leg 3): r5hw2 saw 24,576 keys
        # sort SLOWER than 73,664 — the sort is shape-quantized. Find the
        # fast sizes so the tiered emission can pad to one.
        def timed_s(label, f, *args):
            out = f(*args, jnp.zeros((), jnp.int32))
            np.asarray(out.ravel()[0])
            t0 = time.perf_counter()
            tok = jnp.zeros((), jnp.int32)
            for _ in range(iters):
                tok = f(*args, tok).ravel()[0] * 0
            np.asarray(tok)
            ms = (time.perf_counter() - t0) / iters * 1000.0
            print(f"{label}: {ms:.2f} ms/call", flush=True)

        for n in (8192, 16384, 24576, 32768, 49152, 65536, 73664, 81920,
                  98304, 131072):
            keys = jnp.arange(n, dtype=jnp.int32)[::-1]
            timed_s(f"sort_{n}", jax.jit(
                lambda k, tok: jnp.sort(k + tok)), keys)

    def run_probe(b, token, tiny):
        """Step-machinery probe: the kernel body is ONLY the first-tile
        reset (no mask checks, no sweeps). tiny=True feeds (8,128) dummy
        blocks instead of the (CHUNK,16) records — the zero-vs-tiny
        difference isolates the per-pair record-DMA contribution from
        the bare grid machinery."""
        band = jnp.zeros((1,), jnp.int32)

        def probe_kernel(band_ref, zp_ref, tiles_ref, chunks_ref, *refs):
            rec_ref, depth_out, tri_out = refs[rp.MASK_WORDS:]
            i = pl.program_id(0)
            tile = tiles_ref[i]
            prev = tiles_ref[jnp.maximum(i - 1, 0)]
            first = jnp.logical_or(i == 0, tile != prev)

            @pl.when(first)
            def _():
                depth_out[0] = jnp.full((1, npx), 1.0, jnp.float32)
                tri_out[0] = jnp.full((1, npx), -1, jnp.int32)

        if tiny:
            nblk = b.records.shape[0] // rp.CHUNK   # static chunk slots
            rec_in = jnp.zeros((nblk * 8, 128), jnp.float32) + token
            rec_spec = pl.BlockSpec(
                (8, 128),
                lambda i, band, zp, tiles, chunks, *masks: (chunks[i], 0),
                memory_space=pltpu.VMEM)
        else:
            rec_in = b.records + token
            rec_spec = pl.BlockSpec(
                (rp.CHUNK, b.records.shape[1]),
                lambda i, band, zp, tiles, chunks, *masks: (chunks[i], 0),
                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4 + rp.MASK_WORDS,
            grid=(jnp.maximum(b.n_real, 1),),
            in_specs=[rec_spec],
            out_specs=[
                pl.BlockSpec((1, 1, npx),
                             lambda i, band, zp, tiles, chunks, *masks:
                             (tiles[i], 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, npx),
                             lambda i, band, zp, tiles, chunks, *masks:
                             (tiles[i], 0, 0), memory_space=pltpu.VMEM),
            ])
        depth, _tri = pl.pallas_call(
            probe_kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((n_tiles, 1, npx), jnp.float32),
                       jax.ShapeDtypeStruct((n_tiles, 1, npx), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=os.environ.get("KB_INTERPRET", "0") == "1",
        )(band, b.zparams, b.pair_tile, b.pair_chunk, *b.pair_mask, rec_in)
        return depth[0, 0, 0] * 0.0

    configs = os.environ.get(
        "KB_CONFIGS", "zero,dflt,full,nobranch,dflt").split(",")
    for kind in configs:
        if kind in ("none", ""):
            continue
        if kind in ("probe", "probe_tiny"):
            f = jax.jit(functools.partial(run_probe,
                                          tiny=kind == "probe_tiny"))
            token = f(bins, jnp.zeros((), jnp.float32))
            np.asarray(token)
            t0 = time.perf_counter()
            token = jnp.zeros((), jnp.float32)
            for _ in range(iters):
                token = f(bins, token)
            np.asarray(token)
            ms = (time.perf_counter() - t0) / iters * 1000.0
            print(f"kind={kind}: {ms:.2f} ms/call", flush=True)
            continue
        dense = kind == "nobranch"
        dual = kind == "dual"
        if (dense or dual) and rp.CKERN:
            continue                      # masked-kernel probe only
        b = doctored("dflt" if dual else ("full" if dense else kind))
        f = jax.jit(functools.partial(run_kernel, dense=dense, dual=dual))
        token = f(b, jnp.zeros((), jnp.float32))
        np.asarray(token)                      # compile + run once
        t0 = time.perf_counter()
        token = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            token = f(b, token)
        np.asarray(token)
        ms = (time.perf_counter() - t0) / iters * 1000.0
        print(f"kind={kind}: {ms:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
