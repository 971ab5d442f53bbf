"""Micro-probe for the Mosaic split-select loss (r3hw9: the resolve
kernel's 3-plane bf16 one-hot select degenerates to hi-plane-only on
hardware — cols/split == cols/bf16 stat-identically — while interpret
mode and the XLA-side decomposition are both bit-exact).

Reproduces the kernel structure at increasing fidelity, printing the
max error of each part and of the reassembled sum vs the host:

  K1: whole-array (3, RW, C) bf16 stacked planes, no grid — the three
      dot_generals exactly as _winner_select(tr=True) issues them.
  K2: + PrefetchScalarGridSpec grid with a dynamic chunk-offset
      BlockSpec (0, 0, chunks[i]) — the production shape.
  K3: three SEPARATE (RW, NCC) bf16 inputs (one BlockSpec each) —
      candidate fix if the stacked leading-axis read is what breaks.

RW deliberately 27 (RR_WIDTH-like, NOT a sublane multiple) and also 32
(aligned) to catch a padded-plane-stride addressing bug.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), jax.devices(), flush=True)

C = 256
NC = 4          # chunks
INTERPRET = jax.default_backend() == "cpu"


def host_parts(planes, oh):
    # planes (3, RW, NCC) bf16->f32; select chunk 1's lanes
    sel = planes[:, :, C:2 * C].astype(np.float32)
    return [sel[k] @ oh for k in range(3)]


def make_inputs(rw, seed=0):
    rng = np.random.default_rng(seed)
    rec = rng.standard_normal((rw, NC * C)).astype(np.float32)
    import ml_dtypes
    bf = ml_dtypes.bfloat16
    hi = rec.astype(bf).astype(np.float32)
    r1 = rec - hi
    mid = r1.astype(bf).astype(np.float32)
    lo = (r1 - mid).astype(bf)
    planes = np.stack([hi.astype(bf), mid.astype(bf), lo], axis=0)
    win = rng.integers(0, C, (C,))
    oh = np.zeros((C, C), np.float32)
    oh[win, np.arange(C)] = 1.0
    return planes, oh


def report(tag, got, want):
    d = np.abs(np.asarray(got, np.float32) - want)
    print(f"  {tag}: maxerr={d.max():.3e} neq={(d > 0).mean():.4f}",
          flush=True)


def run_k1(rw):
    planes, oh = make_inputs(rw)
    want = host_parts(planes, oh)

    def kernel(rec_ref, oh_ref, p0, p1, p2, s):
        o = oh_ref[...]
        dims = (((1,), (0,)), ((), ()))

        def part(k):
            return jax.lax.dot_general(
                rec_ref[k][:, C:2 * C], o, dims,
                preferred_element_type=jnp.float32)

        a, b, c = part(0), part(1), part(2)
        p0[...] = a
        p1[...] = b
        p2[...] = c
        s[...] = (a + b) + c

    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((rw, C), jnp.float32)] * 4,
        interpret=INTERPRET,
    )(jnp.asarray(planes), jnp.asarray(oh, jnp.bfloat16))
    print(f"K1 rw={rw} (whole-array, static chunk slice):", flush=True)
    for k in range(3):
        report(f"part{k}", outs[k], want[k])
    report("sum", outs[3], want[0] + want[1] + want[2])


def run_k2(rw):
    planes, oh = make_inputs(rw)
    want = host_parts(planes, oh)
    chunks = jnp.asarray([1], jnp.int32)      # one grid step, chunk 1

    def kernel(chunks_ref, rec_ref, oh_ref, p0, p1, p2, s):
        o = oh_ref[...]
        dims = (((1,), (0,)), ((), ()))

        def part(k):
            return jax.lax.dot_general(
                rec_ref[k][:, :], o, dims,
                preferred_element_type=jnp.float32)

        a, b, c = part(0), part(1), part(2)
        p0[...] = a
        p1[...] = b
        p2[...] = c
        s[...] = (a + b) + c

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((3, rw, C), lambda i, chunks: (0, 0, chunks[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i, chunks: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((rw, C), lambda i, chunks: (0, 0),
                                memory_space=pltpu.VMEM)] * 4,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rw, C), jnp.float32)] * 4,
        interpret=INTERPRET,
    )(chunks, jnp.asarray(planes), jnp.asarray(oh, jnp.bfloat16))
    print(f"K2 rw={rw} (grid + dynamic chunk-offset BlockSpec):",
          flush=True)
    for k in range(3):
        report(f"part{k}", outs[k], want[k])
    report("sum", outs[3], want[0] + want[1] + want[2])


def run_k3(rw):
    planes, oh = make_inputs(rw)
    want = host_parts(planes, oh)
    chunks = jnp.asarray([1], jnp.int32)

    def kernel(chunks_ref, h_ref, m_ref, l_ref, oh_ref, s):
        o = oh_ref[...]
        dims = (((1,), (0,)), ((), ()))

        def part(r):
            return jax.lax.dot_general(r[...], o, dims,
                                       preferred_element_type=jnp.float32)

        s[...] = (part(h_ref) + part(m_ref)) + part(l_ref)

    spec = pl.BlockSpec((rw, C), lambda i, chunks: (0, chunks[i]),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((C, C), lambda i, chunks: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((rw, C), lambda i, chunks: (0, 0),
                                memory_space=pltpu.VMEM)],
    )
    (s,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rw, C), jnp.float32)],
        interpret=INTERPRET,
    )(chunks, jnp.asarray(planes[0]), jnp.asarray(planes[1]),
      jnp.asarray(planes[2]), jnp.asarray(oh, jnp.bfloat16))
    print(f"K3 rw={rw} (three separate plane inputs):", flush=True)
    report("sum", s, want[0] + want[1] + want[2])


for rw in (27, 32):
    run_k1(rw)
    run_k2(rw)
    run_k3(rw)
print("DONE", flush=True)
