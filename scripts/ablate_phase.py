#!/usr/bin/env python3
"""Phase-separated timing: build, compile, first run, steady run."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

B, L = 128, 128
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
NEV = np.int32(-(1 << 29))
TOT = 16384
rng = np.random.default_rng(0)

def phase(msg, t0):
    print(f"  {msg}: {time.perf_counter()-t0:.2f}s", flush=True)
    return time.perf_counter()

name = sys.argv[1]
t0 = time.perf_counter()
arr = jax.device_put(rng.integers(0, 100, (B, TOT), dtype=np.int32))
ipen = jax.device_put(rng.integers(-5000, 0, (16385,), dtype=np.int32))
jax.block_until_ready((arr, ipen))
t0 = phase("transfer small", t0)
if name == "xs_stream":
    xs = jnp.tile(jnp.arange(L, dtype=jnp.int32)[None, None, :], (T, B, 1))
    jax.block_until_ready(xs)
    t0 = phase(f"transfer xs {T*B*L*4/1e6:.0f}MB", t0)

if name == "dslice1":
    def step(c, t):
        h1, h2 = c
        s = jax.lax.dynamic_slice(arr, (0, 9000 - t), (B, L))
        return (h1 + h2 + s, h1), ()
    xs_in = jnp.arange(T)
elif name == "xs_stream":
    def step(c, s):
        h1, h2 = c
        return (h1 + h2 + s, h1), ()
    xs_in = xs
elif name == "ipen_take":
    def step(c, t):
        h1, h2, cj = c
        idx = jnp.clip((h1[..., None] & 8191) + t - cj, 0, 16384)
        pen = jnp.take(ipen, idx)
        return (h1 + h2 + pen.sum(-1), h1, cj + 1), ()
    xs_in = jnp.arange(T)
else:
    def step(c, t):
        h1, h2 = c
        return (h1 + h2 + t, h1), ()
    xs_in = jnp.arange(T)

if name == "ipen_take":
    c0 = (jnp.full((B, L), NEV), jnp.full((B, L), NEV),
          jnp.zeros((B, L, 4), jnp.int32))
else:
    c0 = (jnp.full((B, L), NEV), jnp.full((B, L), NEV))

@jax.jit
def f():
    c, _ = jax.lax.scan(step, c0, xs_in)
    return c[0]

lowered = f.lower()
t0 = phase("lower", t0)
comp = lowered.compile()
t0 = phase("compile", t0)
r = comp(); jax.block_until_ready(r); np.asarray(r).ravel()[:1]
t0 = phase("run1", t0)
ts = []
for _ in range(3):
    t1 = time.perf_counter()
    r = comp(); jax.block_until_ready(r); np.asarray(r).ravel()[:1]
    ts.append(time.perf_counter() - t1)
dt = sorted(ts)[1]
print(f"{name:12s} T={T} {dt*1e3:8.2f} ms {dt/T*1e6:8.2f} us/step", flush=True)
