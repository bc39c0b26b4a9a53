#!/usr/bin/env python3
"""Probe 2: costs of the Mosaic-legal operand-window patterns.

Marginal per-step cost measured by T-differencing (run at T and 2T,
marginal = (t2 - t1) / T) which cancels the fixed dispatch floor.

Patterns probed on (8,128) i32 carries:
  base       carry-only loop
  arith40    ~50 vector ops
  chain190x4 4x compare/select chain over 190 constants (ipen strawman)
  headchain..analytic  head-chain (~40 runs) + f32 Frechet-ish tail x4
  dynroll    2 outer-dim tile reads from (NBT,64,128) + lane concat +
             dynamic pltpu.roll + 8 sublane-group slices (the operand
             window pattern)
  bext3      3 boundary-stream lane extracts from (8,128) chunk blocks
  mock       dynroll + bext3 + ~70-op recurrence mock + headchain ipen
             + candidate insert mock  (full step estimate)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
SOP = 8            # stacked sliding operands
GRP = 8
NBT = 128          # number of 128-lane tiles (NB = 16384)


def make_run(body, T):
    def kernel(stk_ref, bstr_ref, x_ref, o_ref):
        x0 = x_ref[:]

        def step(t, carry):
            return body(t, carry, stk_ref, bstr_ref)

        o_ref[:] = jax.lax.fori_loop(0, T, step, x0)

    @jax.jit
    def run(stk, bstr, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(stk, bstr, x)

    return run


def timed(fn, *args):
    r = fn(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(5):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / 5


def marginal(body):
    stk = jnp.asarray(
        np.random.randint(-100, 100, (NBT, SOP * GRP, 128), np.int32))
    bstr = jnp.asarray(
        np.random.randint(-100, 100, (GRP, 128), np.int32))
    x = jnp.asarray(np.random.randint(0, 100, (GRP, 128), np.int32))
    t1 = timed(make_run(body, T0), stk, bstr, x)
    t2 = timed(make_run(body, 2 * T0), stk, bstr, x)
    return (t2 - t1) / T0 * 1e9, t1


def main():
    print("devices:", jax.devices(), flush=True)
    results = {}

    def body_base(t, c, stk, bstr):
        return c + 1
    results["base"] = marginal(body_base)
    print("base done", flush=True)

    def body_arith(t, c, stk, bstr):
        y = c
        for i in range(10):
            y = jnp.maximum(y + i, y * 1)
            y = jnp.where(y > 100000, y - 100000, y)
        return y
    results["arith40"] = marginal(body_arith)
    print("arith40 done", flush=True)

    consts = [(i * 64, -i * 3) for i in range(190)]

    def body_chain4(t, c, stk, bstr):
        acc = c
        for k in range(4):
            idx = c + t + k
            pen = jnp.full_like(c, -9999)
            for b, v in consts:
                pen = jnp.where(idx >= b, v, pen)
            acc = acc + pen % 7
        return acc
    results["chain190x4"] = marginal(body_chain4)
    print("chain190x4 done", flush=True)

    hconsts = [(i * 3, -i * 5) for i in range(40)]

    def body_headtail4(t, c, stk, bstr):
        acc = c
        for k in range(4):
            idx = c + t + k
            pen = jnp.full_like(c, -9999)
            for b, v in hconsts:
                pen = jnp.where(idx >= b, v, pen)
            nf = idx.astype(jnp.float32)
            tail = jnp.trunc(-100.0 - 30.5 * jnp.log(jnp.maximum(nf, 1.0))
                             ).astype(jnp.int32)
            pen = jnp.where(idx >= 120, tail, pen)
            acc = acc + pen % 7
        return acc
    results["headtail4"] = marginal(body_headtail4)
    print("headtail4 done", flush=True)

    def dynroll_read(t, stk):
        base = (NBT * 128 - 400) - jax.lax.rem(t, 8192)   # decreasing
        q = jnp.clip(base // 128, 0, NBT - 2)
        r = base - q * 128                    # base mod 128
        t0_ = stk[q]
        t1_ = stk[q + 1]
        wide = jnp.concatenate([t0_, t1_], axis=1)      # (64, 256)
        rolled = pltpu.roll(wide, -r, 1)
        ops = [rolled[k * GRP:(k + 1) * GRP, :128] for k in range(SOP)]
        return ops

    def body_dynroll(t, c, stk, bstr):
        ops = dynroll_read(t, stk)
        acc = c
        for o in ops:
            acc = acc + o
        return acc
    results["dynroll8"] = marginal(body_dynroll)
    print("dynroll8 done", flush=True)

    def body_bext(t, c, stk, bstr):
        elanes = jax.lax.broadcasted_iota(jnp.int32, (GRP, 128), 1)
        t2 = jax.lax.rem(t, 128)
        acc = c
        for _ in range(3):
            v = jnp.sum(jnp.where(elanes == t2, bstr[:], 0), axis=1,
                        keepdims=True)
            acc = acc + v
        return acc
    results["bext3"] = marginal(body_bext)
    print("bext3 done", flush=True)

    NCAND = 4

    def body_mock(t, c, stk, bstr):
        elanes = jax.lax.broadcasted_iota(jnp.int32, (GRP, 128), 1)
        ops = dynroll_read(t, stk)
        code, isdon, isacc, sig5, accb, d5cls, j40, j41 = ops
        t2 = jax.lax.rem(t, 128)
        fills = []
        for _ in range(3):
            fills.append(jnp.sum(jnp.where(elanes == t2, bstr[:], 0),
                                 axis=1, keepdims=True))
        lanes = elanes
        # recurrence mock (~40 ops): shifts + max-chain
        h1 = c
        up = jnp.where(lanes == 0, fills[0], jnp.roll(h1, 1, 1))
        dg = jnp.where(lanes == 0, fills[1], jnp.roll(h1 + 1, 1, 1))
        score = jnp.zeros_like(c)
        for k in range(5):
            score = score + jnp.where(code == k, c + k, 0)
        hv = dg + score
        fv = jnp.maximum(up - 80, up * 1) - 30
        ev = jnp.maximum(jnp.where(lanes == 0, fills[2], h1) - 80, hv) - 30
        mx = jnp.maximum(jnp.maximum(hv, fv), ev)
        # ipen head+tail x4 + candidate close/insert mock
        cvs = [c + k for k in range(NCAND)]
        cjs = [c - k for k in range(NCAND)]
        for l in range(NCAND):
            idx = mx - cjs[l] + t
            pen = jnp.full_like(c, -9999)
            for b, v in hconsts:
                pen = jnp.where(idx >= b, v, pen)
            nf = idx.astype(jnp.float32)
            tail = jnp.trunc(-100.0 - 30.5 *
                             jnp.log(jnp.maximum(nf, 1.0))).astype(jnp.int32)
            pen = jnp.where(idx >= 120, tail, pen)
            xc = cvs[l] + pen + accb + jnp.where(d5cls == 0, j40, j41)
            ok = (isacc != 0) & (xc >= mx)
            mx = jnp.where(ok, xc, mx)
        # donor insert mock (3 states x 4 cands)
        for k in range(3):
            x = mx + sig5 + k
            pos = ((cvs[0] >= x).astype(jnp.int32) + (cvs[1] >= x)
                   + (cvs[2] >= x) + (cvs[3] >= x))
            elig = (isdon != 0) & (mx > -999999)
            ncv = []
            for j in range(NCAND):
                ins = (pos == j) & elig
                shf = (pos < j) & elig
                pj = j - 1 if j else 0
                ncv.append(jnp.where(ins, x,
                                     jnp.where(shf, cvs[pj], cvs[j])))
            cvs = ncv
        return jnp.where(mx > 10 ** 8, c, mx % 1000 + c % 3)
    results["mock_full"] = marginal(body_mock)
    print("mock_full done", flush=True)

    print(f"\nT0={T0}; per-step marginal (differenced) and t(T0):")
    for k, (m, t1) in results.items():
        print(f"  {k:12s} marginal {m:8.1f} ns/step   t(T0)={t1*1e3:8.2f} ms")
    m = results["mock_full"][0]
    print(f"\nmock_full implies {1024/m*1000:.2f} GCUPS at (8,128)/step"
          if m > 0 else "")


if __name__ == "__main__":
    main()
