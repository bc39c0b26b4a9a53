#!/usr/bin/env python3
"""Probe Pallas capabilities + op costs on the attached TPU.

Measures, inside a fori_loop kernel on (8,128) i32 vregs:
  - baseline loop (carry-only)
  - arithmetic body (~40 vector ops)
  - table lookup strategies for the intron penalty:
      take1024: jnp.take from a (1024,) VMEM table, vector indices
      gather128: jnp.take from a (128,) table (hardware dynamic_gather?)
      chain: compare/select chain over ~190 constants
      analytic: f32 log-tail formula (1 log + mul + trunc)
Usage: python scripts/pallas_probe.py [T]
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def timed(fn, *args):
    r = fn(*args)
    np.asarray(r)                      # force
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / 3


def make_kernel(body):
    def kernel(x_ref, tab_ref, o_ref):
        x0 = x_ref[:]
        tab = tab_ref[:]

        def step(t, carry):
            return body(t, carry, tab)

        o_ref[:] = jax.lax.fori_loop(0, T, step, x0)

    @jax.jit
    def run(x, tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, tab)

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    x = jnp.asarray(np.random.randint(0, 1000, (8, 128), np.int32))
    tab1k = jnp.asarray(np.random.randint(-500, 0, (8, 1024), np.int32))
    tab128 = jnp.asarray(np.random.randint(-500, 0, (8, 128), np.int32))

    # 0) trivial smoke
    def k0(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2 + 1
    y = pl.pallas_call(
        k0, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x) * 2 + 1)
    print("smoke OK", flush=True)

    results = {}

    # 1) carry-only loop
    def body_base(t, c, tab):
        return c + 1
    results["base"] = timed(make_kernel(body_base), x, tab128)

    # 2) ~40-op arithmetic body
    def body_arith(t, c, tab):
        y = c
        for i in range(10):
            y = jnp.maximum(y + i, y * 1)
            y = jnp.where(y > 100000, y - 100000, y)
        return y
    results["arith40"] = timed(make_kernel(body_arith), x, tab128)

    # 3) take from (8,1024) table along lanes — needs per-element gather
    def body_take1k(t, c, tab):
        idx = jnp.clip(c + t, 0, 1023)
        v = jnp.take_along_axis(tab, idx % 1024, axis=1)
        return c + v % 7
    try:
        r = timed(make_kernel(body_take1k), x, tab1k)
        results["take1k_along"] = r
    except Exception as e:
        print("take1k_along FAILED:", str(e)[:200], flush=True)

    # 4) take from (8,128) table along lanes
    def body_take128(t, c, tab):
        idx = (c + t) % 128
        v = jnp.take_along_axis(tab, idx, axis=1)
        return c + v % 7
    try:
        r = timed(make_kernel(body_take128), x, tab128)
        results["take128_along"] = r
    except Exception as e:
        print("take128_along FAILED:", str(e)[:200], flush=True)

    # 5) select chain ~190 constants
    consts = [(i * 64, -i * 3) for i in range(190)]

    def body_chain(t, c, tab):
        idx = c + t
        pen = jnp.full_like(c, -9999)
        for b, v in consts:
            pen = jnp.where(idx >= b, v, pen)
        return c + pen % 7
    results["chain190"] = timed(make_kernel(body_chain), x, tab128)

    # 6) analytic log tail: trunc(fx + ep*ln(n-mu)) in f32
    def body_analytic(t, c, tab):
        n = (c + t).astype(jnp.float32)
        v = jnp.trunc(-100.0 + -30.5 * jnp.log(jnp.maximum(n, 1.0)))
        return c + v.astype(jnp.int32) % 7
    results["analytic_log"] = timed(make_kernel(body_analytic), x, tab128)

    # 7) 4-candidate versions: chain on 4 vregs
    def body_chain4(t, c, tab):
        pens = []
        for k in range(4):
            idx = c + t + k
            pen = jnp.full_like(c, -9999)
            for b, v in consts:
                pen = jnp.where(idx >= b, v, pen)
            pens.append(pen)
        return c + sum(p % 7 for p in pens)
    results["chain190x4"] = timed(make_kernel(body_chain4), x, tab128)

    def body_take1k4(t, c, tab):
        acc = c
        for k in range(4):
            idx = jnp.clip(c + t + k, 0, 1023)
            v = jnp.take_along_axis(tab, idx % 1024, axis=1)
            acc = acc + v % 7
        return acc
    try:
        results["take1k_alongx4"] = timed(make_kernel(body_take1k4), x, tab1k)
    except Exception as e:
        print("take1k_alongx4 FAILED:", str(e)[:200], flush=True)

    base = results.get("base", 0)
    print(f"\nT={T} steps; times per call and per-step marginal vs base:")
    for k, v in results.items():
        marg = (v - base) / T * 1e9
        print(f"  {k:16s} {v*1e3:8.2f} ms   marginal {marg:8.1f} ns/step")


if __name__ == "__main__":
    main()
