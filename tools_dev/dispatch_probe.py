"""Measure tunnel dispatch overhead vs jit argument count.

Times a trivial jitted function called in an UNCHAINED loop (each call
depends on the previous output so the chain forces ordering, but the K
side arguments are re-sent per call). The slope over K estimates the
per-argument dispatch cost; the intercept the per-call cost.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jax.jit(lambda x: x * 2)(jnp.ones(8)))
print("warm", jax.default_backend(), flush=True)

for k in (1, 4, 16, 32, 64):
    args = [jnp.ones((64, 64), jnp.float32) * i for i in range(k)]

    @jax.jit
    def f(tok, *xs):
        acc = tok
        for x in xs:
            acc = acc + x[0, 0]
        return acc

    tok = jnp.zeros((), jnp.float32)
    np.asarray(f(tok, *args))
    n = 50
    t0 = time.perf_counter()
    tok = jnp.zeros((), jnp.float32)
    for _ in range(n):
        tok = f(tok, *args)
    np.asarray(tok)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"K={k:3d}: {ms:.3f} ms/call", flush=True)

# same data shipped as ONE stacked array
for k in (16, 64):
    stacked = jnp.ones((k, 64, 64), jnp.float32)

    @jax.jit
    def g(tok, xs):
        return tok + xs[:, 0, 0].sum()

    tok = jnp.zeros((), jnp.float32)
    np.asarray(g(tok, stacked))
    n = 50
    t0 = time.perf_counter()
    tok = jnp.zeros((), jnp.float32)
    for _ in range(n):
        tok = g(tok, stacked)
    np.asarray(tok)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"stacked K={k:3d}: {ms:.3f} ms/call", flush=True)

# does keeping args resident (same buffers each call) change anything
# vs fresh host uploads?
args = [jnp.ones((64, 64), jnp.float32) for _ in range(32)]
host = [np.ones((64, 64), np.float32) for _ in range(32)]

@jax.jit
def h(tok, *xs):
    acc = tok
    for x in xs:
        acc = acc + x[0, 0]
    return acc

tok = jnp.zeros((), jnp.float32)
np.asarray(h(tok, *args))
n = 30
t0 = time.perf_counter()
tok = jnp.zeros((), jnp.float32)
for _ in range(n):
    tok = h(tok, *[jnp.asarray(a) for a in host])
np.asarray(tok)
print(f"host-upload K=32: {(time.perf_counter()-t0)/n*1000:.3f} ms/call",
      flush=True)
