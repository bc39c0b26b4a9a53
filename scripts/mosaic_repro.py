#!/usr/bin/env python3
"""Growable repro for the Mosaic relayout failure.

Level 0: bare skeleton with the real BlockSpec structure.
Each level adds one more piece of the real kernel's step.
Usage: python scripts/mosaic_repro.py [max_level]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRP, L, CHUNK = 8, 128, 128
NEV = np.int32(-(2**31 // 16 * 7))
Tpad, n_chunks = 896, 7
NBT, SOP, NCLS, NCLASS = 12, 7, 1, 5
NCAND = 4
B = int(__import__("os").environ.get("REPRO_B", 16))
nblk = B // GRP


LTREPRO = 128


def build(level):
    if level == 50:
        # grid=(nblk, n_chunks): chunk as grid dim, carry in scratch,
        # static block stores, flat fori, depth-1 dynamic tile reads
        def kernel(sca_ref, dl_ref, stk_ref, fl_ref,
                   bh_out, bf_out, row_out, rc_out, st_ref):
            i = pl.program_id(0)
            c = pl.program_id(1)
            base0 = sca_ref[2]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (GRP, L), 1)
            elanes = jax.lax.broadcasted_iota(jnp.int32, (GRP, CHUNK), 1)
            negv = jnp.full((GRP, L), NEV)
            enegv = jnp.full((GRP, CHUNK), NEV)
            dl = dl_ref[:]
            st = st_ref[:]                     # (2, GRP, L)
            fresh = c == 0
            h1 = jnp.where(fresh, negv, st[0])
            h2 = jnp.where(fresh, negv, st[1])
            fl = fl_ref[0]                     # (3, GRP, CHUNK)
            fl0, fl1, fl2 = fl[0], fl[1], fl[2]

            def body(t2, carry):
                h1, h2, ebh, ebf = carry
                t = c * CHUNK + t2
                bq = jnp.clip(base0 - t + 128, 0, NBT * 128 - 256)
                q = bq // 128
                rr = bq - q * 128
                wide = jnp.concatenate([stk_ref[q], stk_ref[q + 1]],
                                       axis=1)
                w = pltpu.roll(wide, -rr, 1)[:, :L]
                fv = jnp.sum(jnp.where(elanes == t2, fl0, 0), axis=1,
                             keepdims=True)
                h_out = (h1 + 1 + w[0:GRP] + w[3 * GRP:4 * GRP]
                         + jnp.where(lanes == 0, fv, h2) + dl)
                ebh = jnp.where(elanes == t2, h_out[:, L - 1:L], ebh)
                ebf = jnp.where(elanes == t2, fv, ebf)
                return (h_out, h1, ebh, ebf)

            h1, h2, ebh, ebf = jax.lax.fori_loop(
                0, CHUNK, body, (h1, h2, enegv, enegv))
            st_ref[0] = h1
            st_ref[1] = h2
            bh_out[:] = ebh
            bf_out[:] = ebf
            row_out[:] = ebh
            rc_out[:] = ebf

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk, n_chunks),
            in_specs=[
                pl.BlockSpec((GRP, L), lambda i, c, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NBT, SOP * GRP, 128),
                             lambda i, c, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, GRP, CHUNK),
                             lambda i, c, s: (c, 0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((GRP, CHUNK),
                                    lambda i, c, s: (i, c),
                                    memory_space=pltpu.VMEM)] * 4,
            scratch_shapes=[pltpu.VMEM((2, GRP, L), jnp.int32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, Tpad), jnp.int32)] * 4,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=128 * 1024 * 1024))

    if level >= 32:
        def kernel(sca_ref, dl_ref, nb_ref, mb_ref, ec_ref, colm_ref,
                   colm1_ref, qp_ref, stk_ref, fills_ref,
                   bh_out, bf_out, row_out, rc_out):
            negv = jnp.full((GRP, L), NEV)
            enegv = jnp.full((GRP, CHUNK), NEV)

            def step(t, carry):
                h1, h2, ebh = carry
                if level == 37:
                    h_out = h1 + 1 + h2 * 0
                else:
                    wS = stk_ref[3]
                    h_out = h1 + 1 + wS[0:GRP] + wS[3 * GRP:4 * GRP]
                if level >= 33:
                    elanes = jax.lax.broadcasted_iota(
                        jnp.int32, (GRP, CHUNK), 1)
                    t2 = jax.lax.rem(t, CHUNK)
                    ebh = jnp.where(elanes == t2, h_out[:, L - 1:L], ebh)
                return (h_out, h1, ebh)

            def chunk_body(c, dp_carry):
                carry = jax.lax.fori_loop(
                    0, CHUNK, lambda t2, cc: step(c * CHUNK + t2, cc),
                    dp_carry + (enegv,))
                dp_carry, ebh = carry[:2], carry[2]
                o = pl.multiple_of(c * CHUNK, CHUNK)
                bh_out[:, pl.ds(o, CHUNK)] = ebh if level >= 33 else enegv
                bf_out[:, pl.ds(o, CHUNK)] = enegv
                row_out[:, pl.ds(o, CHUNK)] = enegv
                rc_out[:, pl.ds(o, CHUNK)] = enegv
                return dp_carry

            if level in (41, 42, 43, 44, 45, 46):
                elanes41 = jax.lax.broadcasted_iota(
                    jnp.int32, (GRP, CHUNK), 1)
                base0v = 900 + LTREPRO
                if level == 44:
                    enegv = jnp.multiply(elanes41, 0) + NEV

                def body41(t, carry):
                    h1, h2, ebh = carry
                    t2 = jax.lax.rem(t, CHUNK)
                    h_out = h1 + 1
                    if level >= 42:
                        bq = jnp.clip(base0v - t, 0,
                                      NBT * nblk * 128 - 256)
                        q = bq // 128
                        rr = bq - q * 128
                        wide = jnp.concatenate(
                            [stk_ref[q], stk_ref[q + 1]], axis=1)
                        w = pltpu.roll(wide, -rr, 1)[:, :L]
                        h_out = h_out + w[0:GRP] + w[3 * GRP:4 * GRP]
                    if level >= 43:
                        fl = fills_ref[jnp.minimum(t // CHUNK,
                                                   n_chunks - 1)]
                        h_out = h_out + fl[0:GRP]
                    ebh = jnp.where(elanes41 == t2, h_out[:, L - 1:L],
                                    ebh)

                    if level == 45:
                        o = pl.multiple_of((t // CHUNK) * CHUNK, CHUNK)
                        bh_out[:, pl.ds(o, CHUNK)] = ebh
                        bf_out[:, pl.ds(o, CHUNK)] = ebh
                        row_out[:, pl.ds(o, CHUNK)] = enegv
                        rc_out[:, pl.ds(o, CHUNK)] = enegv
                    elif level == 46:
                        @pl.when(t2 == CHUNK - 1)
                        def _():
                            o = pl.multiple_of(t - (CHUNK - 1), CHUNK)
                            bh_out[:, pl.ds(o, CHUNK)] = ebh
                    else:
                        @pl.when(t2 == CHUNK - 1)
                        def _():
                            o = pl.multiple_of(t - (CHUNK - 1), CHUNK)
                            bh_out[:, pl.ds(o, CHUNK)] = ebh
                            bf_out[:, pl.ds(o, CHUNK)] = ebh
                            row_out[:, pl.ds(o, CHUNK)] = enegv
                            rc_out[:, pl.ds(o, CHUNK)] = enegv

                    return (h_out, h1, ebh)

                jax.lax.fori_loop(0, n_chunks * CHUNK, body41,
                                  (negv, negv, enegv))
            elif level == 40:
                base0v = 900 + LTREPRO
                elanes40 = jax.lax.broadcasted_iota(
                    jnp.int32, (GRP, CHUNK), 1)

                def body40(t, carry):
                    h1, h2, ebh = carry
                    t2 = jax.lax.rem(t, CHUNK)
                    bq = jnp.clip(base0v - t, 0, NBT * nblk * 128 - 256)
                    q = bq // 128
                    rr = bq - q * 128
                    wide = jnp.concatenate([stk_ref[q], stk_ref[q + 1]],
                                           axis=1)
                    w = pltpu.roll(wide, -rr, 1)[:, :L]
                    fl = fills_ref[jnp.minimum(t // CHUNK,
                                               n_chunks - 1)]
                    h_out = (h1 + 1 + w[0:GRP] + w[3 * GRP:4 * GRP]
                             + fl[0:GRP])
                    ebh = jnp.where(elanes40 == t2, h_out[:, L - 1:L],
                                    ebh)

                    @pl.when(t2 == CHUNK - 1)
                    def _():
                        o = pl.multiple_of(t - (CHUNK - 1), CHUNK)
                        bh_out[:, pl.ds(o, CHUNK)] = ebh
                        bf_out[:, pl.ds(o, CHUNK)] = ebh
                        row_out[:, pl.ds(o, CHUNK)] = enegv
                        rc_out[:, pl.ds(o, CHUNK)] = enegv

                    return (h_out, h1, ebh)

                jax.lax.fori_loop(0, n_chunks * CHUNK, body40,
                                  (negv, negv, enegv))
            elif level == 38:
                base0v = 900 + LTREPRO

                def chunk38(c, dp_carry):
                    fl = fills_ref[jnp.minimum(c, n_chunks - 1)]
                    bqmin = base0v - (c + 1) * CHUNK + 1
                    q0 = jnp.clip(bqmin // 128, 0, NBT * nblk - 3)

                    def inner(t2, carry):
                        h1, h2, ebh = carry
                        t = c * CHUNK + t2
                        bq = base0v - t
                        rr = jnp.clip(bq - q0 * 128, 0, 255)
                        w = pltpu.roll(wide, -rr, 1)[:, :L]
                        h_out = (h1 + 1 + w[0:GRP] + w[3*GRP:4*GRP]
                                 + fl[0:GRP])
                        elanes = jax.lax.broadcasted_iota(
                            jnp.int32, (GRP, CHUNK), 1)
                        ebh = jnp.where(elanes == t2,
                                        h_out[:, L - 1:L], ebh)
                        return (h_out, h1, ebh)

                    wide = jnp.concatenate(
                        [stk_ref[q0], stk_ref[q0 + 1], stk_ref[q0 + 2]],
                        axis=1)
                    carry = jax.lax.fori_loop(0, CHUNK, inner,
                                              dp_carry + (enegv,))
                    dp_carry, ebh = carry[:2], carry[2]
                    o = pl.multiple_of(c * CHUNK, CHUNK)
                    bh_out[:, pl.ds(o, CHUNK)] = ebh
                    bf_out[:, pl.ds(o, CHUNK)] = enegv
                    row_out[:, pl.ds(o, CHUNK)] = enegv
                    rc_out[:, pl.ds(o, CHUNK)] = enegv
                    return dp_carry

                jax.lax.fori_loop(0, n_chunks, chunk38, (negv, negv))
            elif level == 36:
                carry = jax.lax.fori_loop(
                    0, n_chunks * CHUNK, lambda t, cc: step(t, cc),
                    (negv, negv, enegv))
                bh_out[:, 0:CHUNK] = carry[0][:, 0:CHUNK]
            else:
                hfin = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                         (negv, negv))
                if level == 35:
                    rc_out[:, CHUNK:2 * CHUNK] = hfin[0][:, 0:CHUNK]
                else:
                    bh_out[:, 0:CHUNK] = hfin[0][:, 0:CHUNK]
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nblk,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
            out_shape=[jax.ShapeDtypeStruct((B, Tpad), jnp.int32)] * 4,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024))

    def kernel(sca_ref, dl_ref, nb_ref, mb_ref, ec_ref, colm_ref,
               colm1_ref, qp_ref, stk_ref, fills_ref,
               bh_out, bf_out, row_out, rc_out):
        m0 = sca_ref[0]
        lw0 = sca_ref[1]
        base0 = sca_ref[2]
        a_exgr = sca_ref[4]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (GRP, L), 1)
        elanes = jax.lax.broadcasted_iota(jnp.int32, (GRP, CHUNK), 1)
        el3 = jax.lax.broadcasted_iota(jnp.int32, (3, GRP, CHUNK), 2)
        negv = jnp.full((GRP, L), NEV)
        zero = jnp.zeros((GRP, L), jnp.int32)
        enegv = jnp.full((GRP, CHUNK), NEV)
        dl = dl_ref[:]
        Nb = nb_ref[:]
        Mb = mb_ref[:]
        e_const = ec_ref[:]
        col_m = colm_ref[:]
        col_m1 = colm1_ref[:]
        dln = dl - lanes
        mrow = m0 + lanes
        m_ok = (mrow >= 1) & (mrow <= Mb)
        li = jnp.clip(Mb - m0, 0, L - 1)
        li_mask = lanes == li
        internal_m = (mrow < Mb) | (a_exgr == 0)
        qp = [qp_ref[k] for k in range(NCLASS)]

        def shift_right(x, fill):
            y = jnp.roll(x, 1, 1)
            return jnp.where(lanes == 0, fill, y)

        def step(t, fl, carry):
            h1, h2, ebh, ebf, erow, erc = carry
            t2 = jax.lax.rem(t, CHUNK)
            sc = m0 + lw0 + 1 + t
            n = sc + dln
            r_off = t - 2 * lanes
            active = ((r_off >= 0) & (r_off < 512) & (n >= 1)
                      & (n <= Nb) & m_ok)
            first = r_off == 0

            h_out = h1 + 1
            if level in (1, 6):     # operand roll read
                bq = jnp.clip(base0 - t + 128, 0, NBT * 128 - 256)
                q = bq // 128
                r = bq - q * 128
                blk = jnp.concatenate([stk_ref[q], stk_ref[q + 1]],
                                      axis=2)
                w = pltpu.roll(blk, -r, 2)[:, :, :L]
                h_out = h_out + w[0] + w[3] + w[4]
            if level in (5, 6):     # one-hot score from static tile
                wS = stk_ref[3]
                b_code = wS[0]
                score = jnp.zeros((GRP, L), jnp.int32)
                for k in range(NCLASS):
                    score = score + jnp.where(b_code == k, qp[k], 0)
                h_out = h_out + score
            if level == 7:          # roll read w/o concat (single tile)
                bq = jnp.clip(base0 - t + 128, 0, NBT * 128 - 256)
                q = bq // 128
                r = bq - q * 128
                w = pltpu.roll(stk_ref[q], -r, 2)
                h_out = h_out + w[0] + w[3]
            if level in (9, 30, 31):  # static tile read only
                wS = stk_ref[3]
                h_out = h_out + wS[0:GRP] + wS[3*GRP:4*GRP]
            if level == 10:         # dynamic outer index, no roll/concat
                bq = jnp.clip(base0 - t + 128, 0, NBT * 128 - 256)
                q = bq // 128
                wS = stk_ref[q]
                h_out = h_out + wS[0:GRP] + wS[3*GRP:4*GRP]
            if level == 11:         # static read of fills ref only
                flS = fills_ref[2]
                h_out = h_out + flS[0:GRP][:, :L]
            if level == 12:         # dyn outer + concat + roll (2-D)
                bq = jnp.clip(base0 - t + 128, 0, NBT * 128 - 256)
                q = bq // 128
                r = bq - q * 128
                blk = jnp.concatenate([stk_ref[q], stk_ref[q + 1]],
                                      axis=1)
                w = pltpu.roll(blk, -r, 1)[:, :L]
                h_out = h_out + w[0:GRP] + w[3*GRP:4*GRP]
            if level == 8:          # concat + static slice, no roll
                bq = jnp.clip(base0 - t + 128, 0, NBT * 128 - 256)
                q = bq // 128
                blk = jnp.concatenate([stk_ref[q], stk_ref[q + 1]],
                                      axis=2)
                w = blk[:, :, :L]
                h_out = h_out + w[0] + w[3]
            if 2 <= level <= 4:     # fills extract + shifts + edge logic
                fv = jnp.sum(jnp.where(el3 == t2, fl, 0), axis=2,
                             keepdims=True)
                up_h = shift_right(h1, fv[1])
                diag_h = shift_right(h2, fv[0])
                edge = first & (n != 1)
                left_h = jnp.where(n == 1, col_m,
                                   jnp.where(edge, e_const,
                                             jnp.where(first, NEV, h1)))
                diag_h = jnp.where(n == 1, col_m1, diag_h)
                at_top = r_off >= 512 - 1
                up_h = jnp.where(at_top, NEV, up_h)
                h_out = h_out + up_h + diag_h + left_h + shift_right(
                    h1, fv[2]) * 0
            if 3 <= level <= 4:     # active masking of h_out
                h_out = jnp.where(active, h_out, NEV)
            # emissions
            lane_sel = elanes == t2
            ebh = jnp.where(lane_sel, h_out[:, L - 1:L], ebh)
            ebf = jnp.where(lane_sel, h_out[:, L - 1:L], ebf)
            if level == 4:          # row/rc reductions
                row_v = jnp.sum(jnp.where(li_mask, h_out, 0), axis=1,
                                keepdims=True)
                n0 = sc + dl[:, 0]
                rcl = n0 - Nb[:, 0]
                rc_v = jnp.sum(jnp.where(lanes == rcl[:, None], h_out, 0),
                               axis=1, keepdims=True)
                erow = jnp.where(lane_sel, row_v, erow)
                erc = jnp.where(lane_sel, rc_v, erc)
            if level in (30, 31):
                ebh = jnp.where(lane_sel, h_out[:, L - 1:L],
                                ebh) if level == 31 else ebh
            return (h_out, h1, ebh, ebf, erow, erc)

        def chunk_body(c, dp_carry):
            carry = dp_carry + (enegv, enegv, enegv, enegv)
            fl = fills_ref[c]

            def inner(t2, carry):
                return step(c * CHUNK + t2, fl, carry)

            carry = jax.lax.fori_loop(0, CHUNK, inner, carry)
            dp_carry, (ebh, ebf, erow, erc) = carry[:2], carry[2:]
            o = pl.multiple_of(c * CHUNK, CHUNK)
            if level == 30:
                ebh = ebf = erow = erc = enegv
            bh_out[:, pl.ds(o, CHUNK)] = ebh
            bf_out[:, pl.ds(o, CHUNK)] = ebf
            row_out[:, pl.ds(o, CHUNK)] = erow
            rc_out[:, pl.ds(o, CHUNK)] = erc
            return dp_carry

        hfin = jax.lax.fori_loop(0, n_chunks, chunk_body, (negv, negv))
        if level in (30, 31):
            bh_out[:, 0:CHUNK] = hfin[0][:, 0:CHUNK]

    def bspec(*shape):
        return pl.BlockSpec((GRP,) + shape,
                            lambda i, s: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    import os
    if os.environ.get("REPRO_FULLSPEC"):
        fs = pl.BlockSpec(memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nblk,),
            in_specs=[fs] * 9, out_specs=[fs] * 4)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[
                bspec(L), bspec(L), bspec(L), bspec(L), bspec(L),
                bspec(L),
                pl.BlockSpec((NCLASS, GRP, L), lambda i, s: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NBT, SOP * GRP, 128),
                             lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_chunks, 3 * GRP, CHUNK),
                             lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[bspec(Tpad)] * 4,
        )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, Tpad), jnp.int32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024))


def main():
    maxlev = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)
    sca = jnp.asarray([1, -256, 900, 0, 1, 0, 0, 0], jnp.int32)
    mk = lambda *s: jnp.asarray(rng.integers(-3, 3, s).astype(np.int32))
    args = (sca, mk(B, L), mk(B, L) + 100, mk(B, L) + 90, mk(B, L),
            mk(B, L), mk(B, L), mk(NCLASS, B, L),
            mk(nblk * NBT, (8 if "REPRO_SOP8" in __import__("os").environ else SOP) * GRP, 128),
            mk(nblk * n_chunks, 3 * GRP, CHUNK))
    levs = ([int(x) for x in sys.argv[1:]] if len(sys.argv) > 1
            else list(range(maxlev + 1)))
    args50 = (sca, mk(B, L), mk(nblk * NBT, SOP * GRP, 128),
              mk(n_chunks, 3, B, CHUNK))
    for lev in levs:
        try:
            a = args50 if lev == 50 else args
            r = jax.jit(lambda *x: build(lev)(*x))(*a)
            np.asarray(r[0])
            print(f"PASS level {lev}", flush=True)
        except Exception as e:  # noqa: BLE001
            key = [l for l in str(e).split("\n") if "relayout" in l
                   or "Mosaic failed" in l][:1]
            print(f"FAIL level {lev} | {' '.join(key)[:200]}", flush=True)


if __name__ == "__main__":
    main()
