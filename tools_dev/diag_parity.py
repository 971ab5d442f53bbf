"""Diagnose the round-3 hardware parity failures (r3hw5/6):

  (a) 110k/1080p oracle-vs-Pallas winner mismatch (1.56M/2.07M pixels)
      that SURVIVED the oracle einsum precision pin;
  (b) golden-flavor drift on the bilinear+textured+forward set.

For (a) the decisive probe runs entirely on the chip, no CPU truth
needed: if a path's depths are overwhelmingly bf16-roundtrip-exact,
that path is quantizing somewhere (f32 depths from random triangles
are bf16-exact only ~0.4% of the time by chance). Also reports the
depth-delta distribution on mismatched pixels and winner-depth gaps.

Usage:  python -u tools_dev/diag_parity.py [--scale small|bench]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp


def make_scene(t: int, w: int, h: int, sort: bool = False):
    from trident_tpu.ops.vertex import triangle_setup

    rng = np.random.default_rng(11)
    pos = (rng.uniform(-1, 1, (t, 1, 3)) * [0.95, 0.95, 0.4]
           + rng.uniform(-0.02, 0.02, (t, 3, 3)))
    if sort:
        # spatial coherence like a real scene (and like the binner's
        # chunk-bbox contract assumes): Morton-order triangle centroids
        # so 64-triangle chunks have compact bboxes. CPU diag proved the
        # unsorted cloud truncates the pair budget (pallas covered 45k of
        # the oracle's 152k pixels) — that was the whole r3hw5 "parity"
        # failure, not numerics.
        c = ((pos[:, 0, :2] * 0.5 + 0.5) * 1023).astype(np.int64)

        def spread(v):
            v = (v | (v << 16)) & 0x0000FFFF0000FFFF
            v = (v | (v << 8)) & 0x00FF00FF00FF00FF
            v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
            v = (v | (v << 2)) & 0x3333333333333333
            return (v | (v << 1)) & 0x5555555555555555

        pos = pos[np.argsort(spread(c[:, 0]) | (spread(c[:, 1]) << 1))]
    ww = np.ones((t, 3, 1), np.float32) * rng.uniform(0.5, 2.0, (t, 1, 1))
    clip = np.concatenate(
        [pos[..., :2] * ww, (pos[..., 2:3] * 0.5 + 0.5) * ww, ww],
        axis=-1).astype(np.float32)
    tri_vtx = jnp.arange(t * 3, dtype=jnp.int32).reshape(t, 3)
    return triangle_setup(jnp.asarray(clip.reshape(t * 3, 4)), tri_vtx,
                          jnp.ones(t, bool), w, h)


def bf16_exact_frac(a: np.ndarray, mask: np.ndarray) -> float:
    v = a[mask]
    if v.size == 0:
        return float("nan")
    rt = v.astype(np.float32).astype(jnp.bfloat16).astype(np.float32)
    return float((rt == v).mean())


def run(t: int, w: int, h: int, band_h: int, sort: bool = False) -> None:
    from trident_tpu.ops.raster_pallas import visibility_pallas
    from trident_tpu.ops.raster_ref import visibility_ref

    print(f"--- scene t={t} {w}x{h} sort={sort}", flush=True)
    setup = make_scene(t, w, h, sort=sort)
    rt_b, rd_b = [], []
    for y0 in range(0, h, band_h):
        band = visibility_ref(setup, w, band_h, chunk=32, y_offset=y0)
        rt_b.append(np.asarray(band.tri_id))
        rd_b.append(np.asarray(band.depth))
        print(f"oracle band y={y0} done", flush=True)
    rt = np.concatenate(rt_b, axis=0)
    rd = np.concatenate(rd_b, axis=0)

    pal = visibility_pallas(setup, w, h,
                            interpret=jax.default_backend() == "cpu")
    pt = np.asarray(pal.tri_id)
    pd = np.asarray(pal.depth)
    print(f"pallas aux (truncated-pairs, dropped-chunks): "
          f"{np.asarray(pal.aux)}", flush=True)

    total = rt.size
    mism = rt != pt
    cov_r, cov_p = rt >= 0, pt >= 0
    print(f"pixels={total} mismatch={mism.sum()} "
          f"({100.0 * mism.mean():.2f}%)")
    print(f"covered: oracle={cov_r.sum()} pallas={cov_p.sum()} "
          f"cover-disagree={(cov_r != cov_p).sum()}")

    both = cov_r & cov_p
    agree = both & ~mism
    # quantization fingerprint: fraction of covered depths that are
    # bf16-roundtrip-exact, per path (chance level ~0.4%)
    print(f"bf16-exact depth frac: oracle={bf16_exact_frac(rd, cov_r):.4f} "
          f"pallas={bf16_exact_frac(pd, cov_p):.4f}")

    if agree.any():
        d = np.abs(rd[agree] - pd[agree])
        rel = d / np.maximum(np.abs(rd[agree]), 1e-12)
        print(f"agreeing-winner depth delta: max={d.max():.3e} "
              f"relmax={rel.max():.3e} rel>1e-6 frac={(rel > 1e-6).mean():.4f}")
    mb = mism & both
    if mb.any():
        d = np.abs(rd[mb] - pd[mb])
        rel = d / np.maximum(np.abs(rd[mb]), 1e-12)
        qs = np.percentile(rel, [50, 90, 99])
        print(f"mismatched-winner depth rel-delta p50/p90/p99: "
              f"{qs[0]:.3e} {qs[1]:.3e} {qs[2]:.3e}")
        # sample a few mismatched pixels for offline study
        ys, xs = np.nonzero(mb)
        sel = np.linspace(0, len(ys) - 1, min(8, len(ys))).astype(int)
        for k in sel:
            y, x = ys[k], xs[k]
            print(f"  px({y},{x}): oracle tri={rt[y, x]} d={rd[y, x]:.9f} | "
                  f"pallas tri={pt[y, x]} d={pd[y, x]:.9f}")

    out = (f"/tmp/diag_parity_{jax.default_backend()}_{t}_{w}x{h}"
           f"{'_sorted' if sort else ''}.npz")
    np.savez_compressed(out, rt=rt, rd=rd, pt=pt, pd=pd)
    print(f"saved {out}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["small", "bench"], default="small")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    if args.scale == "small":
        run(t=60_000, w=512, h=512, band_h=128)
        run(t=60_000, w=512, h=512, band_h=128, sort=True)
    else:
        # sorted FIRST: it is the true numeric-parity probe (aux must be
        # 0); the unsorted cloud only re-confirms the truncation story
        run(t=110_000, w=1920, h=1080, band_h=135, sort=True)
        run(t=110_000, w=1920, h=1080, band_h=135)


if __name__ == "__main__":
    sys.exit(main())
