#!/usr/bin/env python3
"""Marginal per-step cost via T-scaling, direct jit calls only."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

B, L = 128, 128
NEV = np.int32(-(1 << 29))
TOT = 16384
rng = np.random.default_rng(0)
arr = jax.device_put(rng.integers(0, 100, (B, TOT), dtype=np.int32))
ipen = jax.device_put(rng.integers(-5000, 0, (16385,), dtype=np.int32))

def steady(f, label):
    r = f(); jax.block_until_ready(r); np.asarray(r).ravel()[:1]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = f(); jax.block_until_ready(r)
        np.asarray(r).ravel()[:1]; ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]

def make(name, T):
    if name == "xs":
        xs_in = jnp.tile(jnp.arange(L, dtype=jnp.int32)[None, None, :],
                         (T, B, 1))
        def step(c, s):
            h1, h2 = c
            return (h1 + h2 + s, h1), ()
    elif name == "dslice":
        xs_in = jnp.arange(T)
        def step(c, t):
            h1, h2 = c
            s = jax.lax.dynamic_slice(arr, (0, 9000 - t), (B, L))
            return (h1 + h2 + s, h1), ()
    elif name == "ipen":
        xs_in = jnp.arange(T)
        def step(c, t):
            h1, h2 = c
            idx = jnp.clip((h1[..., None] & 8191) + t, 0, 16384)
            pen = jnp.take(ipen, idx)
            return (h1 + h2 + pen.sum(-1), h1), ()
    else:
        xs_in = jnp.arange(T)
        def step(c, t):
            h1, h2 = c
            return (h1 + h2 + t, h1), ()
    c0 = (jnp.full((B, L), NEV), jnp.full((B, L), NEV))
    @jax.jit
    def f():
        c, _ = jax.lax.scan(step, c0, xs_in)
        return c[0]
    return f

name = sys.argv[1]
d1 = steady(make(name, 1024), name)
d2 = steady(make(name, 4350), name)
marg = (d2 - d1) / (4350 - 1024)
print(f"{name:8s} T1024={d1*1e3:7.2f}ms T4350={d2*1e3:7.2f}ms "
      f"marginal={marg*1e6:7.2f} us/step", flush=True)
