"""On-hardware resolve-variant diff: run the resolve pass over IDENTICAL
inputs in every (record layout x select precision) combination and diff
the attribute images bit-wise, plus two algebra probes ON CHIP:

  * rows-vs-cols record builders (planes.py) bit-compare
  * split reconstruction: hi+mid+lo == records (the split-exactness
    claim that holds bit-exactly on CPU), on normal AND wide-exponent
    records — if TPU flushes bf16 denormals, the `lo` plane of records
    with tiny exponents dies and reconstruction drifts ~1 ulp-of-mid.

r3hw7/8 found golden flavors drifting 2-3.7% >3LSB under the defaults
(TR=1, PREC=split) while (TR=0, PREC=fp32) is clean — but those runs
flipped both knobs at once. This pins the culprit to one knob and one
mechanism in a single TPU process.
"""

import numpy as np

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices(), flush=True)

from trident_tpu.ops import planes as planes_mod  # noqa: E402
from trident_tpu.ops import resolve_pallas as rp  # noqa: E402
from trident_tpu.ops.raster_pallas import CHUNK, visibility_pallas_tiled  # noqa: E402
from trident_tpu.ops.vertex import triangle_setup  # noqa: E402

W, H, T = 512, 256, 4000
INTERPRET = jax.default_backend() == "cpu"   # CPU smoke runs


def scene(seed=7):
    rng = np.random.default_rng(seed)
    pos = (rng.uniform(-1, 1, (T, 1, 3)) * [0.9, 0.9, 0.4]
           + rng.uniform(-0.03, 0.03, (T, 3, 3))).astype(np.float32)
    ww = np.ones((T, 3, 1), np.float32) * rng.uniform(
        0.5, 2.0, (T, 1, 1)).astype(np.float32)
    clip = np.concatenate(
        [pos[..., :2] * ww, (pos[..., 2:3] * 0.5 + 0.5) * ww, ww],
        axis=-1).astype(np.float32)
    tri_vtx = jnp.arange(T * 3, dtype=jnp.int32).reshape(T, 3)
    setup = triangle_setup(jnp.asarray(clip.reshape(T * 3, 4)), tri_vtx,
                           jnp.ones(T, bool), W, H)
    return setup, rng


def run(setup, records, prec):
    """visibility + resolve in one jit at the given select precision.
    Layout rides in via the records' ndim (2-D = transposed)."""
    old = rp._PREC_MODE
    rp._PREC_MODE = prec
    rp._PREC = jax.lax.Precision.HIGHEST if prec == "fp32" else None
    try:
        def f(s, rec):
            bins, _, tri_tiles, _ = visibility_pallas_tiled(
                s, W, H, interpret=INTERPRET)
            return rp.resolve_attrs_pallas(bins, tri_tiles, rec, W, H,
                                           interpret=INTERPRET)
        return np.asarray(jax.jit(f)(setup, records))
    finally:
        rp._PREC_MODE = old
        rp._PREC = jax.lax.Precision.HIGHEST if old == "fp32" else None


def report(tag, base, x):
    d = np.abs(base - x)
    bad = d > 0
    per_ch = bad.reshape(-1, base.shape[-1]).mean(axis=0)
    worst = " ".join(f"{i}:{v:.4f}" for i, v in enumerate(per_ch) if v > 0)
    print(f"{tag}: neq_frac={bad.mean():.6f} max={d.max():.3e} "
          f"relmax={(d / np.maximum(np.abs(base), 1e-30)).max():.3e} "
          f"per_ch[{worst}]", flush=True)


def main():
    setup, rng = scene()

    for scale_tag, scale in (("unit", 1.0), ("tiny", 1e-34), ("huge", 1e30)):
        rows = (rng.standard_normal((T, planes_mod.RR_WIDTH))
                .astype(np.float32) * scale)
        rows_j = jnp.asarray(rows)

        # --- probe 1: split reconstruction on chip
        def recon(r):
            hi = r.astype(jnp.bfloat16)
            r1 = r - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            return (hi.astype(jnp.float32) + mid.astype(jnp.float32)
                    + lo.astype(jnp.float32))
        rec_chip = np.asarray(jax.jit(recon)(rows_j))
        # host reference reconstruction via ml_dtypes bf16
        import ml_dtypes
        bf = ml_dtypes.bfloat16
        hi = rows.astype(bf).astype(np.float32)
        r1 = rows - hi
        mid = r1.astype(bf).astype(np.float32)
        lo = (r1 - mid).astype(bf).astype(np.float32)
        rec_host = hi + mid + lo
        d_chip = np.abs(rec_chip - rows)
        d_host = np.abs(rec_host - rows)
        print(f"[{scale_tag}] split-recon chip: neq={(d_chip > 0).mean():.6f}"
              f" relmax={(d_chip / np.maximum(np.abs(rows), 1e-38)).max():.3e}"
              f" | host(ml_dtypes): neq={(d_host > 0).mean():.6f}"
              f" relmax={(d_host / np.maximum(np.abs(rows), 1e-38)).max():.3e}",
              flush=True)

        records = planes_mod.chunk_resolve_rows(rows_j, CHUNK)
        nc1, c, rw = records.shape
        cols = jnp.asarray(np.asarray(records).reshape(nc1 * c, rw).T)

        base = run(setup, records, "fp32")
        print(f"[{scale_tag}] base sum|x|={np.abs(base).sum():.3e}",
              flush=True)
        for layout, recs in (("rows", records), ("cols", cols)):
            for prec in ("fp32", "split", "bf16"):
                if layout == "rows" and prec == "fp32":
                    continue
                report(f"[{scale_tag}] {layout}/{prec} vs rows/fp32",
                       base, run(setup, recs, prec))

    # --- probe 2: builder twins on chip (real corner-style attrs)
    nrm = jnp.asarray(rng.standard_normal((T, 3, 3)).astype(np.float32))
    uv = jnp.asarray(rng.standard_normal((T, 3, 2)).astype(np.float32))
    tri_draw = jnp.zeros((T,), jnp.int32)
    consts = jnp.asarray(rng.standard_normal((1, 12)).astype(np.float32))
    rb = np.asarray(jax.jit(planes_mod.build_resolve_rows)(
        setup, nrm, uv, tri_draw, consts))
    cb = np.asarray(jax.jit(planes_mod.build_resolve_cols)(
        setup, nrm, uv, tri_draw, consts))
    d = np.abs(rb.T - cb)
    print(f"builders rows.T vs cols on chip: neq={(d > 0).mean():.6f} "
          f"max={d.max():.3e}", flush=True)
    print("DONE", flush=True)


main()
