"""Probe: does 2-D jnp.take_along_axis lower to tpu.dynamic_gather inside
a Pallas kernel on this chip, and how fast is it vs the XLA row gather?

    PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/gather_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import trident_tpu  # noqa: F401  (TPU env hints)

R, L = 4096, 128      # table shape: 4096 rows x 128 lanes (2 MB i32)


def kernel(tab_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...], axis=0)


@jax.jit
def lut_gather(tab, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


def chain_time(name, f, *args, n=20):
    tok = jnp.zeros((), jnp.int32)
    np.asarray(f(args[0] + tok, *args[1:]))[0, 0]
    t0 = time.perf_counter()
    tok = jnp.zeros((), jnp.int32)
    for _ in range(n):
        out = f(args[0] + tok, *args[1:])
        tok = out[0, 0] * 0
    np.asarray(tok)
    ms = (time.perf_counter() - t0) / n * 1000
    per = ms * 1e6 / (R * L)
    print(f"{name}: {ms:.3f} ms/iter ({per:.2f} ns/elem, "
          f"{R*L/ms/1e3:.0f} M elem/s)", flush=True)


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones(8)))
    print("warm", flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 1 << 30, (R, L), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, R, (R, L), dtype=np.int32))

    out = lut_gather(tab, idx)
    ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
    ok = np.array_equal(np.asarray(out), ref)
    print("pallas take_along_axis lowers and matches:", ok, flush=True)

    chain_time("pallas dynamic_gather (4096x128)", lut_gather, tab, idx)

    # XLA row-gather equivalent work: R*L single-i32 fetches via flat gather
    flat_tab = tab.reshape(-1)

    @jax.jit
    def xla_gather(idx2d):
        flat = idx2d * L + jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        return jnp.take(flat_tab, flat.reshape(-1)).reshape(R, L)

    chain_time("XLA elementwise gather (same work)", xla_gather, idx)

    # scaling: 4 tables (quad corners) gathered with one idx
    tabs = [jnp.asarray(rng.integers(0, 1 << 30, (R, L), dtype=np.int32))
            for _ in range(4)]

    @jax.jit
    def quad_gather(idx2d, t0, t1, t2, t3):
        def k(i_ref, a_ref, b_ref, c_ref, d_ref, o_ref):
            i = i_ref[...]
            o_ref[0] = jnp.take_along_axis(a_ref[...], i, axis=0)
            o_ref[1] = jnp.take_along_axis(b_ref[...], i, axis=0)
            o_ref[2] = jnp.take_along_axis(c_ref[...], i, axis=0)
            o_ref[3] = jnp.take_along_axis(d_ref[...], i, axis=0)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((4, R, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx2d, t0, t1, t2, t3)

    out4 = quad_gather(idx, *tabs)
    ok4 = all(np.array_equal(np.asarray(out4)[k],
                             np.take_along_axis(np.asarray(tabs[k]),
                                                np.asarray(idx), axis=0))
              for k in range(4))
    print("quad (4-table) gather matches:", ok4, flush=True)
    chain_time("pallas quad gather (4x 4096x128)", quad_gather, idx, *tabs)

    # realistic texel-LUT shape: 6144-row table (one 64^2 mip pyramid w/
    # gutters), grid over 8 idx chunks (the 4 bilinear corners x 2M pixels
    # of a 1080p frame) — checks VMEM fit with Pallas double-buffering
    R2, G = 6144, 8
    tab2 = jnp.asarray(rng.integers(0, 1 << 30, (R2, L), dtype=np.int32))
    idx8 = jnp.asarray(rng.integers(0, R2, (G, R2, L), dtype=np.int32))

    @jax.jit
    def lut_frame(idx_chunks, tab):
        def k(i_ref, t_ref, o_ref):
            o_ref[0] = jnp.take_along_axis(t_ref[...], i_ref[0], axis=0)
        return pl.pallas_call(
            k,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, R2, L), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R2, L), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R2, L), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, R2, L), jnp.int32),
        )(idx_chunks, tab)

    outf = lut_frame(idx8, tab2)
    okf = np.array_equal(
        np.asarray(outf)[0],
        np.take_along_axis(np.asarray(tab2), np.asarray(idx8)[0], axis=0))
    print("frame-scale LUT gather (8x 6144x128) matches:", okf, flush=True)
    tok = jnp.zeros((), jnp.int32)
    np.asarray(lut_frame(idx8 + tok, tab2))[0, 0, 0]
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        o = lut_frame(idx8 + tok, tab2)
        tok = o[0, 0, 0] * 0
    np.asarray(tok)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"frame-scale LUT gather: {ms:.3f} ms for {G*R2*L/1e6:.1f}M "
          f"fetches ({G*R2*L/ms/1e3:.0f} M/s)", flush=True)


if __name__ == "__main__":
    main()
