#!/usr/bin/env python3
"""Ablation harness: where does the wavefront step's time go on-chip?

Times lax.scan variants with pieces of the DP step stripped, at bench
geometry, printing per-step and per-cell cost for each variant.
Usage: python scripts/ablate_dp.py [B] [W] [L]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
W = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
L = int(sys.argv[3]) if len(sys.argv) > 3 else 128
T = W + 2 * (L - 1)
NCAND = 4
NEV = np.int32(-(1 << 29))
TOT = 16384 + 2 * (L + W + 4)


def timeit(f, *args, iters=3):
    r = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = f(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def report(name, dt):
    cells = B * L * W
    print(f"{name:28s} {dt*1e3:9.2f} ms  {dt/T*1e6:8.2f} us/step  "
          f"{cells/dt/1e9:8.3f} GCUPS", flush=True)


rng = np.random.default_rng(0)
ops = {k: jnp.asarray(rng.integers(0, 100, (B, TOT), dtype=np.int32))
       for k in ["c", "d", "a", "s5", "ab", "d5"]}
joint = jnp.asarray(rng.integers(0, 100, (B, TOT, 4), dtype=np.int32))
ipen = jnp.asarray(rng.integers(-5000, 0, (16385,), dtype=np.int32))
qp = jnp.asarray(rng.integers(-60, 20, (B, L, 17), dtype=np.int32))
gop, gep, llmt = -80, -20, 20


def carry0():
    return (jnp.full((B, L), NEV), jnp.full((B, L), NEV),
            jnp.full((B, L), NEV), jnp.full((B, L), NEV),
            jnp.full((B, L, NCAND), NEV),
            jnp.zeros((B, L, NCAND), jnp.int32),
            jnp.zeros((B, L, NCAND), jnp.int32))


def make(variant, c0=None):
    v0 = variant.replace("_arg", "")
    do_slices = v0 in ("slices", "recur", "cand", "full")
    do_recur = v0 in ("recur", "cand", "full")
    do_cand = v0 in ("cand", "full")
    do_ipen = v0.startswith("full")
    tabsz = {"full": 16384, "full1k": 1023, "full512": 511,
             "full128": 127, "fullsplit": -1}.get(v0, 16384)

    def step(carry, t, *, coff=None):
        h1, h2, f1, e1, cv, cj, cd = carry
        base = (9000 - t) if coff is None else (coff - t)

        def sl(a):
            return jax.lax.dynamic_slice(a, (0, base), (B, L))
        if do_slices:
            b_code = sl(ops["c"])
            isdon = sl(ops["d"]) > 50
            isacc = sl(ops["a"]) > 50
            sig5 = sl(ops["s5"])
            accb = sl(ops["ab"])
            d5cls = sl(ops["d5"]) & 3
            j4 = jax.lax.dynamic_slice(joint, (0, base, 0), (B, L, 4))
        else:
            b_code = (h1 & 15)
            isdon = h1 > 0
            isacc = f1 > 0
            sig5 = h1 & 63
            accb = f1 & 63
            d5cls = h1 & 3
            j4 = cv & 63
        score = jnp.zeros((B, L), jnp.int32)
        for k in range(17):
            score = score + jnp.where(b_code == k, qp[:, :, k], 0)
        if not do_recur:
            h_out = h1 + score + sig5 + accb
            return (h_out, h1, f1 + 1, e1 + 1, cv, cj, cd), h_out[:, -1]
        up_h = jnp.concatenate([jnp.full((B, 1), NEV), h1[:, :-1]], axis=1)
        up_f = jnp.concatenate([jnp.full((B, 1), NEV), f1[:, :-1]], axis=1)
        diag_h = jnp.concatenate([jnp.full((B, 1), NEV), h2[:, :-1]],
                                 axis=1)
        h_val = diag_h + score
        mx_val, mx_k = h_val, jnp.zeros((B, L), jnp.int32)
        xo = up_h + gop
        f_val = jnp.where(xo >= up_f, xo, up_f) + gep
        gt = f_val > mx_val
        mx_val = jnp.where(gt, f_val, mx_val)
        mx_k = jnp.where(gt, 2, mx_k)
        xo = h1 + gop
        e_val = jnp.where(xo >= e1, xo, e1) + gep
        ge = e_val >= mx_val
        mx_val = jnp.where(ge, e_val, mx_val)
        mx_k = jnp.where(ge, 1, mx_k)
        if do_cand:
            n = (9000 + t) - jnp.arange(L)[None, :]
            ilen = n[:, :, None] - cj
            if do_ipen and tabsz < 0:
                # round-2 candidate fix: one bare-clip small take + an
                # arithmetically-computed tail, one select between them
                head = jnp.take(ipen, jnp.clip(ilen, 0, 1023))
                nf = jnp.maximum(ilen - 200, 1).astype(jnp.float32)
                tail = (-3000.0 - 47.0 * jnp.log(nf)).astype(jnp.int32)
                pen = jnp.where(ilen >= 1024, tail, head)
            elif do_ipen:
                pen = jnp.take(ipen, jnp.clip(ilen, 0, tabsz))
            else:
                pen = jnp.clip(ilen, -5000, 0)
            j16 = jnp.zeros((B, L, NCAND), jnp.int32)
            for c in range(4):
                j16 = j16 + jnp.where(cd == c, j4[..., c][..., None]
                                      if do_slices else j4, 0)
            xc = cv + pen + accb[:, :, None] + j16
            ok = isacc[:, :, None] & (ilen >= llmt) & (cv > NEV // 2)
            xc = jnp.where(ok, xc, NEV)
            sv = [h_val, e_val, f_val]
            for k in range(3):
                cur = sv[k]
                for l in range(NCAND):
                    take = (cd[..., l] == k) & (xc[..., l] >= cur)
                    cur = jnp.where(take, xc[..., l], cur)
                sv[k] = cur
                ge = cur >= mx_val
                mx_val = jnp.where(ge, cur, mx_val)
                mx_k = jnp.where(ge, k, mx_k)
            h_val, e_val, f_val = sv
            # donor push x3
            for k in range(3):
                fv = sv[k]
                elig = isdon & (fv > mx_val + gop)
                x = fv + sig5
                pos = jnp.sum(cv >= x[..., None], axis=-1)
                slot = jnp.arange(NCAND)[None, None, :]
                ins = (slot == pos[..., None]) & elig[..., None]
                shf = (slot > pos[..., None]) & elig[..., None]

                def place(arr, new):
                    sh = jnp.concatenate([arr[..., :1], arr[..., :-1]],
                                         axis=-1)
                    return jnp.where(ins, new[..., None],
                                     jnp.where(shf, sh, arr))
                cv = place(cv, x)
                cj = place(cj, n)
                cd = place(cd, jnp.full((B, L), k, jnp.int32))
        h_out = mx_val
        return (h_out, h1, f_val, e_val, cv, cj, cd), h_out[:, -1]

    if variant.endswith("_arg"):
        @jax.jit
        def run(coff=jnp.asarray(9000)):
            f = functools.partial(step, coff=coff)
            c, ys = jax.lax.scan(f, carry0(), jnp.arange(T), unroll=4)
            return c[0], ys
    else:
        @jax.jit
        def run():
            c, ys = jax.lax.scan(step, carry0(), jnp.arange(T), unroll=4)
            return c[0], ys
    return run


import sys as _s
for v in [_s.argv[4] if len(_s.argv) > 4 else "full"]:
    f = make(v)
    if len(_s.argv) > 5 and _s.argv[5] == "profile":
        r = f(); jax.block_until_ready(r)
        import jax.profiler as _jp
        with _jp.trace("/tmp/jxprof2"):
            r = f(); jax.block_until_ready(r)
            np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    dt = timeit(f)
    report(v, dt)
