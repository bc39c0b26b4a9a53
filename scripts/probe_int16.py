#!/usr/bin/env python3
"""Probe: does int16 elementwise compute run 2x int32 on the VPU?

Times a dependent chain of adds+selects on (GRP, 128) int32 vs
(2*GRP, 128) int16 (same element count per step when int16 packs two
sublanes per vreg row).  If the int16 loop runs ~equal wall time at 2x
the elements, an int16 DP engine doubles throughput; if it runs 2x
slower, Mosaic widens int16 to 32-bit for compute and the rewrite is
pointless.

Run: python scripts/probe_int16.py [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRP, L = 16, 128
OPS = 64          # dependent add/select pairs per step


def build(dtype, rows, steps):
    dt = jnp.int16 if dtype == "i16" else jnp.int32

    def kernel(x_ref, o_ref):
        def body(t, acc):
            v = acc
            for i in range(OPS):
                w = v + np.array(i + 1, dt)
                v = jnp.where(w > v, w - np.array(3, dt), v)
            return v

        o_ref[:] = jax.lax.fori_loop(0, steps, body, x_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, L), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    rng = np.random.default_rng(0)
    for dtype, rows in (("i32", GRP), ("i16", GRP), ("i16", 2 * GRP),
                        ("i32", 2 * GRP)):
        x = rng.integers(-1000, 1000, (rows, L)).astype(
            np.int16 if dtype == "i16" else np.int32)
        try:
            call = build(dtype, rows, steps)
            f = jax.jit(lambda a: call(a))
            np.asarray(f(x))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(f(x))
                times.append(time.perf_counter() - t0)
            times.sort()
            us = times[2] * 1e6 / steps
            eps = rows * L * OPS / (us * 1e3)   # Gelem-ops/s
            print(f"{dtype} rows={rows:2d}: {us:.4f} us/step "
                  f"{eps:.1f} Gelem-op/s")
        except Exception as exc:                 # noqa: BLE001
            print(f"{dtype} rows={rows}: FAILED "
                  f"{type(exc).__name__}: {str(exc).splitlines()[0][:90]}")


if __name__ == "__main__":
    main()
