#!/usr/bin/env python3
"""Which body component is slow: dynamic-slice, ipen gather, or xs stream?"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

B, W, L = 128, 4096, 128
T = W + 2 * (L - 1)
NEV = np.int32(-(1 << 29))
TOT = 16384
rng = np.random.default_rng(0)
arr = jnp.asarray(rng.integers(0, 100, (B, TOT), dtype=np.int32))
ipen = jnp.asarray(rng.integers(-5000, 0, (16385,), dtype=np.int32))
xs_stream = jnp.asarray(rng.integers(0, 100, (T, B, L), dtype=np.int32))

def timeit(f):
    r = f(); jax.block_until_ready(r); np.asarray(r).ravel()[:1]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); r = f(); jax.block_until_ready(r)
        np.asarray(r).ravel()[:1]; ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]

def run_min():
    def step(c, t):
        h1, h2 = c
        h = h1 + h2 + t
        return (h, h1), ()
    @jax.jit
    def f():
        c, _ = jax.lax.scan(step, (jnp.full((B, L), NEV),
                                   jnp.full((B, L), NEV)), jnp.arange(T))
        return c[0]
    return f

def run_dslice(k):
    def step(c, t):
        h1, h2 = c
        h = h1 + h2
        for j in range(k):
            s = jax.lax.dynamic_slice(arr, (0, 9000 - t + j), (B, L))
            h = h + s
        return (h, h1), ()
    @jax.jit
    def f():
        c, _ = jax.lax.scan(step, (jnp.full((B, L), NEV),
                                   jnp.full((B, L), NEV)), jnp.arange(T))
        return c[0]
    return f

def run_xs():
    def step(c, s):
        h1, h2 = c
        h = h1 + h2 + s
        return (h, h1), ()
    @jax.jit
    def f():
        c, _ = jax.lax.scan(step, (jnp.full((B, L), NEV),
                                   jnp.full((B, L), NEV)), xs_stream)
        return c[0]
    return f

def run_take():
    def step(c, t):
        h1, h2, cj = c
        idx = jnp.clip((h1 & 8191) + t - cj, 0, 16384)
        pen = jnp.take(ipen, idx)
        h = h1 + h2 + pen.sum(-1)
        return (h, h1, cj + 1), ()
    @jax.jit
    def f():
        c, _ = jax.lax.scan(step, (jnp.full((B, L), NEV),
                                   jnp.full((B, L), NEV),
                                   jnp.zeros((B, L, 4), jnp.int32)),
                            jnp.arange(T))
        return c[0]
    return f

variants = {"min": run_min, "dslice1": lambda: run_dslice(1),
            "dslice7": lambda: run_dslice(7), "xs_stream": run_xs,
            "ipen_take": run_take}
name = sys.argv[1]
dt = timeit(variants[name]())
print(f"{name:12s} {dt*1e3:8.2f} ms {dt/T*1e6:8.2f} us/step", flush=True)
