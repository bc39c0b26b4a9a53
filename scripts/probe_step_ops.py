#!/usr/bin/env python3
"""Micro-probe: per-step cost of the kernel's data-movement idioms.

Times, per fori_loop step (all on a dependent int32 carry so nothing is
hoisted):
  floor     : carry-only loop
  rollbig   : pltpu.roll of a (112,256) tile by CHUNK-1 (ecw scheme)
  roll64    : pltpu.roll of a (64,128) tile by 1 + lane-0 where (w shift)
  dynroll   : concat 2x(64,128) + dynamic pltpu.roll (old window scheme)
  subread   : dynamic sublane read ecw2[t2] of a (256,112) tile
  subtrans  : subread + transpose (1,112)->(112,1)
  maskred   : masked cross-lane sum of (3,16,256) (old fills extract)
  gather16  : one take_along_axis on (16,128)
  sel112    : where(lane==0, fill, x) on (112,256)

Run: python scripts/probe_step_ops.py [steps]
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

GRP, L, CHUNK, SG3 = 16, 128, 256, 112


def build(variant, steps):
    def kernel(x_ref, big_ref, big2_ref, o_ref):
        def body(t2, carry):
            acc, big = carry
            if variant == "floor":
                acc = acc + t2
            elif variant == "rollbig":
                big = pltpu.roll(big, CHUNK - 1, 1)
                acc = acc + big[:GRP, :L]
            elif variant == "roll64":
                w = pltpu.roll(big[:64, :L], 1, 1)
                w = jnp.where(jax.lax.broadcasted_iota(
                    jnp.int32, (64, L), 1) == 0, acc[:1, :1], w)
                acc = acc + w[:GRP]
            elif variant == "dynroll":
                wide = jnp.concatenate([big[:64, :L], big[:64, L:2 * L]],
                                       axis=1)
                w = pltpu.roll(wide, -(acc[0, 0] & 127), 1)[:, :L]
                acc = acc + w[:GRP]
            elif variant == "subread":
                row = big2_ref[(t2 + acc[0, 0]) & 255]   # (SG3,)
                acc = acc + row[:1].astype(jnp.int32)
            elif variant == "subtrans":
                row = big2_ref[(t2 + acc[0, 0]) & 255]
                col = row.reshape(SG3, 1) * 1            # relayout
                acc = acc + col[:GRP]
            elif variant == "maskred":
                el3 = jax.lax.broadcasted_iota(jnp.int32, (3, GRP, CHUNK),
                                               2)
                fv = jnp.sum(jnp.where(el3 == (t2 & 255),
                                       big[:48].reshape(3, GRP, CHUNK),
                                       0), axis=2, keepdims=True)
                acc = acc + fv[0]
            elif variant == "gather16":
                g = jnp.take_along_axis(big[:GRP, :L],
                                        (acc & 127), axis=1)
                acc = acc + g
            elif variant == "sel112":
                big = jnp.where(jax.lax.broadcasted_iota(
                    jnp.int32, (SG3, CHUNK), 1) == 0, acc[0, 0], big)
                acc = acc + big[:GRP, :L]
            return (acc & 1023, big)

        acc, _ = jax.lax.fori_loop(
            0, steps, body, (x_ref[:], big_ref[:]))
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((GRP, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1024, (GRP, L)).astype(np.int32)
    big = rng.integers(0, 1024, (SG3, CHUNK)).astype(np.int32)
    big2 = rng.integers(0, 1024, (CHUNK, SG3)).astype(np.int32)
    base = None
    for v in ("floor", "rollbig", "roll64", "dynroll", "subread",
              "subtrans", "maskred", "gather16", "sel112"):
        try:
            call = build(v, steps)
            f = jax.jit(lambda a, b, c: call(a, b, c))
            np.asarray(f(x, big, big2))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(f(x, big, big2))
                times.append(time.perf_counter() - t0)
            times.sort()
            us = times[2] * 1e6 / steps
            if v == "floor":
                base = us
            print(f"{v:9s}: {us:.4f} us/step"
                  + (f"  (+{us-base:.4f})" if base is not None and
                     v != "floor" else ""))
        except Exception as exc:                     # noqa: BLE001
            print(f"{v:9s}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
