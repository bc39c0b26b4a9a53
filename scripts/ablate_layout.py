#!/usr/bin/env python3
"""Layout ablation: trailing small dims vs leading small dims."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

B, W, L = 128, 4096, 128
T = W + 2 * (L - 1)
NEV = np.int32(-(1 << 29))
rng = np.random.default_rng(0)
qp_bad = jnp.asarray(rng.integers(-60, 20, (B, L, 17), dtype=np.int32))
qp_good = jnp.asarray(np.moveaxis(np.asarray(qp_bad), -1, 1).copy())  # (B,17,L)

def timeit(f):
    r = f(); jax.block_until_ready(r); np.asarray(r).ravel()[:1]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = f(); jax.block_until_ready(r)
        np.asarray(r).ravel()[:1]; ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]

def make(mode):
    def step(carry, t):
        h1, h2 = carry
        b_code = h1 & 15
        score = jnp.zeros((B, L), jnp.int32)
        for k in range(17):
            col = qp_bad[:, :, k] if mode == "bad" else qp_good[:, k]
            score = score + jnp.where(b_code == k, col, 0)
        h = h1 + score
        return (h, h1), h[:, -1]
    @jax.jit
    def run():
        c, ys = jax.lax.scan(step, (jnp.full((B, L), NEV),
                                    jnp.full((B, L), NEV)),
                             jnp.arange(T), unroll=4)
        return c[0]
    return run

def make_min():
    def step(carry, t):
        h1, h2 = carry
        h = h1 + h2 + t
        return (h, h1), h[:, -1]
    @jax.jit
    def run():
        c, ys = jax.lax.scan(step, (jnp.full((B, L), NEV),
                                    jnp.full((B, L), NEV)),
                             jnp.arange(T), unroll=4)
        return c[0]
    return run

for name, f in [("min", make_min()), ("onehot_bad", make("bad")),
                ("onehot_good", make("good"))]:
    dt = timeit(f)
    print(f"{name:14s} {dt*1e3:8.2f} ms {dt/T*1e6:7.2f} us/step "
          f"{B*L*W/dt/1e9:7.3f} GCUPS", flush=True)
