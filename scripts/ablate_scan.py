#!/usr/bin/env python3
"""Scan overhead: total time vs T, unroll, ys emission."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

B, L = 128, 128
NEV = np.int32(-(1 << 29))

def timeit(f):
    r = f(); jax.block_until_ready(r); np.asarray(r).ravel()[:1]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); r = f(); jax.block_until_ready(r)
        np.asarray(r).ravel()[:1]; ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]

def make(T, unroll, emit):
    def step(carry, t):
        h1, h2 = carry
        h = h1 + h2 + t
        return (h, h1), (h[:, -1] if emit else ())
    @jax.jit
    def run():
        c, ys = jax.lax.scan(step, (jnp.full((B, L), NEV),
                                    jnp.full((B, L), NEV)),
                             jnp.arange(T), unroll=unroll)
        return c[0]
    return run

for T in (256, 1024, 4350):
    for unroll in (1, 4, 16):
        for emit in (False, True):
            dt = timeit(make(T, unroll, emit))
            print(f"T={T:5d} unroll={unroll:2d} emit={int(emit)} "
                  f"{dt*1e3:8.2f} ms {dt/T*1e6:7.2f} us/step", flush=True)
