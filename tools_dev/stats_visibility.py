#!/usr/bin/env python
"""CPU analysis of the visibility kernel's work distribution (round 4).

Quantifies, on the real bench scenes, where the ~19 ms goes:
  - pairs, hit sub-blocks per pair (the vector work multiplier)
  - pixel waste: fraction of each evaluated (sub-block, tile) 1024-px sweep
    that lies outside the sub-block's own bbox — and the projected savings
    of (a) 16-row half gating, (b) 8-row quarter gating, (c) 4-row dynamic
    lane-window ranges (128-lane aligned slices)
  - triangle waste within hit sub-blocks (bbox-miss triangles still swept)

Run: JAX_PLATFORMS=cpu python tools_dev/stats_visibility.py [grid [WxH]]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    wh = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
    width, height = map(int, wh.split("x"))

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from profile_stages import build_scene
    from trident_tpu.ops.raster_pallas import (
        CHUNK, SUB, NSUB, TILE_H, TILE_W, MASK_WORDS, build_bins,
    )
    from trident_tpu.ops.vertex import triangle_setup, vertex_stage
    from trident_tpu.render.frame import (
        build_draw_params, gather_mesh_draws, geometry_to_device,
    )
    from trident_tpu.render.types import CameraParams

    r, reg = build_scene(width, height, grid)
    packed = r.geometry.packed()
    geo = geometry_to_device(packed)
    records = gather_mesh_draws(reg, r.geometry)
    plan, tri_draw = r._plan_cache.plan(packed, records, r.geometry.version)
    params, palette, shade = build_draw_params(
        records, plan.num_draws, material_table=r.geometry.material_table())
    cam = r.editor_camera.params()
    verts = vertex_stage(geo, plan, params,
                         CameraParams(cam.view, cam.proj, cam.position),
                         palette, skinned=False)
    setup = triangle_setup(verts.clip, plan.tri_vtx, plan.tri_valid,
                           width, height)
    ntx = -(-width // TILE_W)
    nty = -(-height // TILE_H)
    bins = jax.jit(lambda s: build_bins(
        s, ntx * TILE_W, nty * TILE_H))(setup)

    n_real = int(bins.n_real)
    tiles = np.asarray(bins.pair_tile[:n_real])
    chunks = np.asarray(bins.pair_chunk[:n_real])
    aux = np.asarray(bins.aux)
    print(f"scene grid={grid} {width}x{height}: tris={setup.edge.shape[0]} "
          f"pairs={n_real} aux={aux} tiles={ntx}x{nty} "
          f"CHUNK={CHUNK} SUB={SUB} TILE={TILE_W}x{TILE_H}")

    # rebuild per-sub-block bboxes exactly as build_bins does
    t = setup.edge.shape[0]
    n_chunks = max(1, -(-t // CHUNK))
    tpad = n_chunks * CHUNK
    bbox = np.asarray(setup.bbox)
    valid = np.asarray(setup.valid)
    if tpad != t:
        bbox = np.concatenate(
            [bbox, np.tile([1 << 20, 1 << 20, 0, 0], (tpad - t, 1))], 0)
        valid = np.concatenate([valid, np.zeros(tpad - t, bool)])
    big = 1 << 20
    qx0 = np.where(valid, bbox[:, 0], big).reshape(n_chunks, NSUB, SUB).min(2)
    qy0 = np.where(valid, bbox[:, 1], big).reshape(n_chunks, NSUB, SUB).min(2)
    qx1 = np.where(valid, bbox[:, 2], 0).reshape(n_chunks, NSUB, SUB).max(2)
    qy1 = np.where(valid, bbox[:, 3], 0).reshape(n_chunks, NSUB, SUB).max(2)
    q_ok = (qx1 > qx0) & (qy1 > qy0)

    # per-pair hit masks (recomputed, not unpacked — zq rides in word 0)
    p_ty, p_tx = tiles // ntx, tiles % ntx
    c = chunks - 1  # slot -> chunk idx (slot 0 sentinel never in real pairs)
    hit = (q_ok[c]
           & (p_ty[:, None] * TILE_H < qy1[c]) & ((p_ty + 1)[:, None] * TILE_H > qy0[c])
           & (p_tx[:, None] * TILE_W < qx1[c]) & ((p_tx + 1)[:, None] * TILE_W > qx0[c]))
    nhit = hit.sum(1)
    print(f"hit subs/pair: mean={nhit.mean():.2f} p50={np.percentile(nhit,50):.0f} "
          f"p90={np.percentile(nhit,90):.0f} max={nhit.max()} "
          f"total_evals={(nhit.sum() * SUB * TILE_H * TILE_W)/1e6:.0f}M (tri,px)")

    # pixel waste per hit (pair, sub): bbox clipped to the tile
    pi, si = np.nonzero(hit)
    ci = c[pi]
    ty0 = p_ty[pi] * TILE_H
    tx0 = p_tx[pi] * TILE_W
    iy0 = np.clip(qy0[ci, si] - ty0, 0, TILE_H)
    iy1 = np.clip(qy1[ci, si] - ty0, 0, TILE_H)
    ix0 = np.clip(qx0[ci, si] - tx0, 0, TILE_W)
    ix1 = np.clip(qx1[ci, si] - tx0, 0, TILE_W)
    rows = iy1 - iy0
    cols = ix1 - ix0
    area = rows * cols
    npx = TILE_H * TILE_W
    print(f"bbox∩tile: area mean={area.mean():.0f}px ({area.mean()/npx*100:.0f}% "
          f"of tile)  rows mean={rows.mean():.1f}/{TILE_H} cols mean={cols.mean():.1f}/{TILE_W}")

    # gating/window schemes (pixel rows are the lane dim in 4-row granules)
    halves = (np.minimum(iy1, TILE_H // 2) > np.minimum(iy0, TILE_H // 2)).astype(int) \
        + (np.maximum(iy1, TILE_H // 2) > np.maximum(iy0, TILE_H // 2)).astype(int)
    qsz = TILE_H // 4
    quarters = sum(((np.minimum(iy1, (k + 1) * qsz) - np.maximum(iy0, k * qsz)) > 0
                    ).astype(int) for k in range(4))
    w4 = (np.ceil(iy1 / 4) - np.floor(iy0 / 4))  # 4-row lane windows (128 px)
    full = len(pi) * npx
    print(f"evaluated px if gated: full={full/1e6:.0f}M  "
          f"halves={halves.sum()*npx//2/1e6:.0f}M ({halves.mean():.2f} halves/hit)  "
          f"quarters={quarters.sum()*npx//4/1e6:.0f}M ({quarters.mean():.2f}/hit)  "
          f"win4={w4.sum()*TILE_W*4/1e6:.0f}M ({w4.mean():.2f} windows/hit)")

    # triangle waste: per hit (pair,sub), how many of the SUB triangles'
    # own bboxes touch the tile?
    tb = bbox.reshape(n_chunks, NSUB, SUB, 4)
    tv = valid.reshape(n_chunks, NSUB, SUB)
    thit = (tv[ci, si]
            & (ty0[:, None] < tb[ci, si, :, 3]) & (ty0[:, None] + TILE_H > tb[ci, si, :, 1])
            & (tx0[:, None] < tb[ci, si, :, 2]) & (tx0[:, None] + TILE_W > tb[ci, si, :, 0]))
    print(f"tris-touching-tile per hit sub: mean={thit.sum(1).mean():.1f}/{SUB}")

    # pairs per tile
    import collections
    per_tile = collections.Counter(tiles.tolist())
    ppt = np.array(sorted(per_tile.values()))
    print(f"pairs/tile: tiles_touched={len(per_tile)}/{ntx*nty} "
          f"mean={ppt.mean():.1f} p90={np.percentile(ppt,90):.0f} max={ppt.max()}")


if __name__ == "__main__":
    main()
