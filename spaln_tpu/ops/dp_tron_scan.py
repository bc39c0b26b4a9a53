"""Protein x translated-genome spliced DP as a JAX wavefront scan.

TPU re-design of the reference's SimdAln2h1 slab engine (fwd2h1_simd.h):
vector lane i owns aa row m = m0 + i; at step t it computes the cell

    n_i(t) = (3*m0 + lw - 1) + t - 3i        (r = n - 3m in [lw-1, up])

so every dependency is a lane-shift of a short history ring:
  left   (m, n-1..n-3)   same lane @ t-1..t-3   (E queue / E opens)
  codon  (m-1, n-3)      lane i-1  @ t-6        (diagonal)
  slide  (m-1, n-2/n-1)  lane i-1  @ t-5 / t-4  (1/2-nt frameshifts)
  vert   (m-1, n)        lane i-1  @ t-3        (aa deletion)

Genome operands stream as contiguous slices of pre-reversed arrays.  The
three splice phases keep separate NCAND=4 donor-candidate lists per lane;
phase +-1 closes re-score the junction codon through the 256-entry
junction tron tables.  Matches the scalar oracle (dp_tron_ref) exactly —
differential tests assert identical scores and paths.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .params import DpFlags, NEVSEL
from .dp_tron_ref import (TronDpParams, DEAD, DIAG, NEWD, VERT, SLA1, SLA2,
                          VERL, HORI, HOR1, HOR2, HORL, SPIN, _IS_VERT,
                          DIR2NOD)
from ..score.codepot import TronSignals

NCAND = 4
I32 = jnp.int32
NEV = np.int32(NEVSEL)
_VERT_MASK = np.zeros(64, dtype=np.int32)
for _d in (VERT, SLA1, SLA2, VERL):
    _VERT_MASK[_d] = 1
    _VERT_MASK[_d | SPIN] = 1
_NOD_OF = np.full(64, -1, dtype=np.int32)
for _d, _k in DIR2NOD.items():
    _NOD_OF[_d] = _k
    _NOD_OF[_d | SPIN] = _k


def _insert_cand(cv, cj, cd, c3d, x, jnc, kdir, d3v, push):
    """Masked insertion into (L, NCAND) sorted lists; ties displace
    existing entries (H-engine `x >=` insertion, fwd2h1.cc:553-558)."""
    pos = jnp.sum(cv > x[:, None], axis=1)
    slot = jnp.arange(NCAND)[None, :]
    here = (slot == pos[:, None]) & push[:, None]
    shift = (slot > pos[:, None]) & push[:, None]

    def place(arr, new):
        shifted = jnp.concatenate([arr[:, :1], arr[:, :-1]], axis=1)
        return jnp.where(here, new[:, None], jnp.where(shift, shifted, arr))

    return (place(cv, x), place(cj, jnc), place(cd, kdir), place(c3d, d3v))


def build_tron_operands(a, bn, sig: TronSignals, prm: TronDpParams,
                        ipen_tab, Mpad, pad_extra, flags: DpFlags,
                        Npad: int | None = None):
    """Host stage: phase-split reversed operand arrays + query profiles.

    Lane n-values step by 3 per lane, so operands are stored reshaped as
    B3[k, p] = arr_padded[(Lp3-1-k)*3 + p]: the kernel reads value_i =
    arr[S - 3i] as the contiguous rows B3[k0 + i, p] with p = S' mod 3.
    """
    M, N = len(a), len(bn)
    alpha = prm.qprof_mtx.shape[1]
    qprof = np.zeros((Mpad + 1, alpha), dtype=np.int32)
    qprof[:M] = prm.qprof_mtx[np.asarray(a, dtype=np.int64)]
    qprof[M:] = prm.qprof_mtx[np.asarray(a[-1:], dtype=np.int64)]

    pad = (pad_extra // 2 // 3) * 3
    Nsz = Npad if Npad is not None else N
    Ltot = -(-(pad + Nsz + pad) // 3) * 3
    Lp3 = Ltot // 3

    def b3(x, fill=0, width=None):
        shape = (Ltot,) if width is None else (Ltot, width)
        out = np.full(shape, fill, dtype=np.int32)
        out[pad:pad + N] = x
        if width is None:
            return out.reshape(Lp3, 3)[::-1].copy()
        return out.reshape(Lp3, 3, width)[::-1].copy()

    accb = sig.sig3.astype(np.int32) - sig.tabs.tab3[sig.dinc3]
    ops = {
        "rb_bt": b3(sig.btron.astype(np.int32), fill=2),
        "rb_sigE": b3(sig.sigE),
        "rb_sig5": b3(sig.sig5.astype(np.int32)),
        "rb_accb": b3(accb),
        "rb_d5": b3(sig.dinc5.astype(np.int32)),
        "rb_d3": b3(sig.dinc3.astype(np.int32)),
        "rb_phs5": b3(sig.phs5.astype(np.int32), fill=-2),
        "rb_phs3": b3(sig.phs3.astype(np.int32), fill=-2),
        "rb_joint": b3(sig.acc_joint.astype(np.int32), width=16),
        "ipen": ipen_tab.astype(np.int32),
        "t1": sig.spj_tron1.astype(np.int32),
        "t2": sig.spj_tron2.astype(np.int32),
    }
    return ops, qprof, pad, Lp3


@functools.lru_cache(maxsize=64)
def _tron_scan(L, W, gop, gep, ge1, ge2, gw1, gw2, gw3, minl,
               T, pad2, Lp3, emit_trace, dagp=False, lgop=0, lgep=0,
               gw3l=0):
    """lw, m0, M, N are traced; only the padded geometry recompiles."""
    vm = jnp.asarray(_VERT_MASK)
    nod_of = jnp.asarray(_NOD_OF)
    n_nod = 5 if dagp else 3

    def step(carry, t, *, qp0, qp1, ops, m0, lw, M, N, a_exgr):
        (hh, hd, ff, ee, ed, ff2, fd2, ee2, ed2, cv, cj, cd, c3d,
         bnd_h, bnd_hd, bnd_f, bnd_f2, bnd_f2d, row_h, rc_h) = carry
        # hh: (6, L) H history (hh[0] = t-1 ... hh[5] = t-6); hd dirs
        # ff: (3, L) F history; ee: (3, L) E queue vals; ed dirs
        # ff2/fd2: (3, L) F2 val+dir history, ee2/ed2: E2 queue (dagp)
        a_exgr = jnp.asarray(a_exgr, bool)
        lanes = jnp.arange(L)
        m = m0 + lanes
        c0 = 3 * m0 + lw - 1
        n = (c0 + t) - 3 * lanes
        # lane i's band offset: r = (lw-1) + t - 6i (the n-stagger is 3i,
        # and r = n - 3m drops another 3i)
        r_off = t - 6 * lanes
        started = r_off >= 0
        in_band = r_off < W
        active = (started & in_band & (n >= 0) & (n <= N)
                  & (m >= 1) & (m <= M))
        first = r_off == 0
        q = t % 3

        def shift(v):                     # lane i <- lane i-1
            return jnp.concatenate([jnp.full((1,), NEV), v[:-1]])

        def shifti(v, fill=0):
            return jnp.concatenate([jnp.full((1,), fill, v.dtype), v[:-1]])

        # ---- neighbor values from history (lane-shifted)
        up_h3 = shift(hh[2])              # (m-1, n)    H
        up_d3 = shifti(hd[2])
        up_h4 = shift(hh[3])              # (m-1, n-1)
        up_d4 = shifti(hd[3])
        up_h5 = shift(hh[4])              # (m-1, n-2)
        up_d5 = shifti(hd[4])
        hq_v = shift(hh[5])               # (m-1, n-3)  diagonal source
        hq_d = shifti(hd[5])
        up_f3 = shift(ff[2])              # (m-1, n)    F
        up_f23 = shift(ff2[2])            # (m-1, n)    F2 (dagp)
        up_fd23 = shifti(fd2[2])
        left1, left2, left3 = hh[0], hh[1], hh[2]
        ld1, ld3 = hd[0], hd[2]

        # lane 0 boundary from previous slab / init row: values at
        # (m0-1, n0), (m0-1, n0-1), (m0-1, n0-2), (m0-1, n0-3)
        n0 = c0 + t
        bl = jnp.clip(n0 - 3, 0, None)
        bh4 = jax.lax.dynamic_slice_in_dim(bnd_h, bl, 4)
        bd4 = jax.lax.dynamic_slice_in_dim(bnd_hd, bl, 4)
        bf4 = jax.lax.dynamic_slice_in_dim(bnd_f, bl, 4)
        okb = (n0 >= 3) & (n0 <= N)
        up_h3 = up_h3.at[0].set(jnp.where(okb, bh4[3], NEV))
        up_d3 = up_d3.at[0].set(jnp.where(okb, bd4[3], DEAD))
        up_h4 = up_h4.at[0].set(jnp.where(okb & (n0 >= 1), bh4[2], NEV))
        up_d4 = up_d4.at[0].set(jnp.where(okb, bd4[2], DEAD))
        up_h5 = up_h5.at[0].set(jnp.where(okb & (n0 >= 2), bh4[1], NEV))
        up_d5 = up_d5.at[0].set(jnp.where(okb, bd4[1], DEAD))
        hq_v = hq_v.at[0].set(jnp.where(okb, bh4[0], NEV))
        hq_d = hq_d.at[0].set(jnp.where(okb, bd4[0], DEAD))
        up_f3 = up_f3.at[0].set(jnp.where(okb, bf4[3], NEV))
        if dagp:
            bf24 = jax.lax.dynamic_slice_in_dim(bnd_f2, bl, 4)
            bfd24 = jax.lax.dynamic_slice_in_dim(bnd_f2d, bl, 4)
            up_f23 = up_f23.at[0].set(jnp.where(okb, bf24[3], NEV))
            up_fd23 = up_fd23.at[0].set(jnp.where(okb, bfd24[3], DEAD))

        # band-right edge: vertical sources invalid (r+1..r+3 > up)
        at_top = r_off >= W - 1
        at_top2 = r_off >= W - 2
        at_top3 = r_off >= W - 3
        up_h3 = jnp.where(at_top3, NEV, up_h3)
        up_f3 = jnp.where(at_top3, NEV, up_f3)
        up_f23 = jnp.where(at_top3, NEV, up_f23)
        up_h4 = jnp.where(at_top2, NEV, up_h4)
        up_h5 = jnp.where(at_top, NEV, up_h5)

        # lane (re)activation resets
        eq = jnp.where(first[None, :], NEV, ee)
        edq = jnp.where(first[None, :], 0, ed)
        eq2 = jnp.where(first[None, :], NEV, ee2)
        edq2 = jnp.where(first[None, :], 0, ed2)
        cv = jnp.where(first[:, None, None], NEV, cv)
        cj = jnp.where(first[:, None, None], 0, cj)
        cd = jnp.where(first[:, None, None], 0, cd)
        c3d = jnp.where(first[:, None, None], 0, c3d)

        # ---- phase-split reversed slices: value_i = arr[n_i + o] read as
        # rows B3[k0 + i, p] with S' = pad + c0 + t + o, p = S' mod 3
        def sl(key, o):
            S = pad2 + (c0 + t) + o
            k0 = Lp3 - 1 - S // 3
            p = S % 3
            blk = jax.lax.dynamic_slice(ops[key], (k0, 0), (L, 3))
            return jnp.where(p == 0, blk[:, 0],
                             jnp.where(p == 1, blk[:, 1], blk[:, 2]))

        def sl16(key, o):
            S = pad2 + (c0 + t) + o
            k0 = Lp3 - 1 - S // 3
            p = S % 3
            blk = jax.lax.dynamic_slice(ops[key], (k0, 0, 0), (L, 3, 16))
            return jnp.where(p == 0, blk[:, 0, :],
                             jnp.where(p == 1, blk[:, 1, :], blk[:, 2, :]))

        bt_n2 = sl("rb_bt", -2)                  # btron[n-2]
        bt_n1p = sl("rb_bt", 1)                  # btron[n+1]
        sigE_n2 = sl("rb_sigE", -2)              # sigE[n-2]
        sigE_n1p = sl("rb_sigE", 1)              # sigE[n+1]
        phs5_n = sl("rb_phs5", 0)                # phs5[n]
        phs3_n = sl("rb_phs3", 0)                # phs3[n]
        sig5_n = sl("rb_sig5", 0)
        sig5_n1 = sl("rb_sig5", -1)              # sig5[n-1]
        sig5_np1 = sl("rb_sig5", 1)              # sig5[n+1]
        accb_n = sl("rb_accb", 0)
        accb_n1 = sl("rb_accb", -1)
        accb_np1 = sl("rb_accb", 1)
        d5_n = sl("rb_d5", 0)
        d5_n1 = sl("rb_d5", -1)
        d5_np1 = sl("rb_d5", 1)
        d3_n = sl("rb_d3", 0)
        d3_n1 = sl("rb_d3", -1)
        d3_np1 = sl("rb_d3", 1)
        joint_n = sl16("rb_joint", 0)
        joint_n1 = sl16("rb_joint", -1)
        joint_np1 = sl16("rb_joint", 1)

        # ================= recurrence (fwd2h1.cc:361-575) ================
        score = jnp.take_along_axis(qp0, bt_n2[:, None], axis=1)[:, 0]
        h_ok = n >= 3
        h_val = jnp.where(h_ok, hq_v + score + sigE_n2, NEV)
        h_dir = jnp.where(h_ok,
                          jnp.where((hq_d == DIAG) | (hq_d == NEWD)
                                    | (hq_d == (DIAG | SPIN)),
                                    DIAG, NEWD),
                          DEAD)
        mx_val, mx_k, mx_dir = h_val, jnp.zeros(L, I32), h_dir

        # ---- vertical
        y = up_f3 + gep
        x = up_h5 + jnp.where(vm[jnp.clip(up_d5, 0, 63)] == 1, ge1, gw1)
        f_val = jnp.where(x > y, x, y)
        f_dir = jnp.where(x > y, SLA2, VERT)
        f_open = x > y
        x = up_h4 + jnp.where(vm[jnp.clip(up_d4, 0, 63)] == 1, ge2, gw2)
        t2_ = x > f_val
        f_val = jnp.where(t2_, x, f_val)
        f_dir = jnp.where(t2_, SLA1, f_dir)
        f_open = f_open | t2_
        x = up_h3 + gw3
        t3_ = x >= f_val
        f_val = jnp.where(t3_, x, f_val)
        f_dir = jnp.where(t3_, VERT, f_dir)
        f_open = jnp.where(t3_, True, f_open)
        t4_ = (~t3_) & (y >= f_val)
        f_val = jnp.where(t4_, y, f_val)
        f_dir = jnp.where(t4_, VERT, f_dir)
        f_open = jnp.where(t4_, False, f_open)
        gt = f_val > mx_val
        mx_val = jnp.where(gt, f_val, mx_val)
        mx_k = jnp.where(gt, 2, mx_k)
        mx_dir = jnp.where(gt, f_dir, mx_dir)

        # ---- long deletion F2 (dagp, fwd2h1.cc:413-425); extension
        # copies the prior dir (*f2 = f2[3]) so SPIN propagates
        f2_val = jnp.full(L, NEV)
        f2_dir = jnp.zeros(L, I32)
        f2_open = jnp.zeros(L, bool)
        if dagp:
            x = up_h3 + gw3l
            y = up_f23 + lgep
            f2_open = x >= y
            f2_val = jnp.where(f2_open, x, y)
            f2_dir = jnp.where(f2_open, VERL, up_fd23)
            gt = f2_val > mx_val
            mx_val = jnp.where(gt, f2_val, mx_val)
            mx_k = jnp.where(gt, 4, mx_k)
            mx_dir = jnp.where(gt, f2_dir, mx_dir)

        # ---- horizontal (rotating queue slot q)
        ev = eq[q]
        edir = edq[q]
        e_open = jnp.zeros(L, bool)
        ok3 = r_off > 2
        x = jnp.where(ok3, left3 + gw3, NEV)
        ev3 = ev + gep
        opened3 = ok3 & (x > ev3)
        spin3 = jnp.where(opened3, ld3 & SPIN, edir & SPIN)
        ev = jnp.where(ok3, jnp.where(opened3, x, ev3)
                       + jnp.where(n >= 2, sigE_n2, 0), ev)
        edir = jnp.where(ok3, spin3 | HORI, edir)
        e_open = e_open | opened3
        # long insertion E2 (dagp, fwd2h1.cc:439-448), mx-checked here
        # (before the 2/1-nt E1 updates), matching the scalar order
        ev2 = eq2[q]
        edir2 = edq2[q]
        e2_open = jnp.zeros(L, bool)
        if dagp:
            x2 = jnp.where(ok3, left3 + gw3l, NEV)
            ev23 = ev2 + lgep
            opened23 = ok3 & (x2 > ev23)
            spin23 = jnp.where(opened23, ld3 & SPIN, edir2 & SPIN)
            ev2 = jnp.where(ok3, jnp.where(opened23, x2, ev23)
                            + jnp.where(n >= 2, sigE_n2, 0), ev2)
            edir2 = jnp.where(ok3, spin23 | HORL, edir2)
            e2_open = opened23
            ge2_ = ev2 > mx_val
            mx_val = jnp.where(ge2_, ev2, mx_val)
            mx_k = jnp.where(ge2_, 3, mx_k)
            mx_dir = jnp.where(ge2_, edir2, mx_dir)
        ok2 = r_off > 1
        x = jnp.where(ok2, left2 + gw2, NEV)
        t2e = x > ev
        ev = jnp.where(t2e, x, ev)
        edir = jnp.where(t2e, (hd[1] & SPIN) | HOR2, edir)
        e_open = jnp.where(t2e, True, e_open)
        x = left1 + gw1
        t1e = x > ev
        ev = jnp.where(t1e, x, ev)
        edir = jnp.where(t1e, (ld1 & SPIN) | HOR1, edir)
        e_open = jnp.where(t1e, True, e_open)
        ge_ = ev > mx_val
        mx_val = jnp.where(ge_, ev, mx_val)
        mx_k = jnp.where(ge_, 1, mx_k)
        mx_dir = jnp.where(ge_, edir, mx_dir)

        internal = (~a_exgr) | (m < M)
        state_v = [h_val, ev, f_val, ev2, f2_val][:n_nod]
        state_d = [h_dir, edir, f_dir, edir2, f2_dir][:n_nod]

        # ---- acceptor closes over phases {-1, 0, +1}
        spj_jnc = [jnp.zeros(L, I32) for _ in range(n_nod)]
        spj_phs = [jnp.zeros(L, I32) for _ in range(n_nod)]
        acc_any = internal & active & (n < N) & (phs3_n != -2)
        for phs, accb_p, joint_p in ((-1, accb_np1, joint_np1),
                                     (0, accb_n, joint_n),
                                     (1, accb_n1, joint_n1)):
            pm = acc_any & (((phs3_n == 2) & (phs != 0))
                            | (phs3_n == phs))
            nb = n - phs
            pi = phs + 1
            ilen = nb[:, None] - cj[:, pi, :]
            pen = jnp.take(ops["ipen"],
                           jnp.clip(ilen, 0, ops["ipen"].shape[0] - 1))
            # candidate c3d packs (dinc3[nb5] << 4) | dinc5[nb5]
            cand_d5 = cd[:, pi, :] * 0 + (c3d[:, pi, :] & 15)
            xc = (cv[:, pi, :] + pen + accb_p[:, None]
                  + jnp.take_along_axis(joint_p, cand_d5, axis=1))
            # phase +-1 junction codon rescoring for dir-0 candidates
            if phs != 0:
                w4 = jnp.clip(16 * ((c3d[:, pi, :] >> 4) & 15)
                              + (d5_np1 if phs == -1
                                 else d5_n1)[:, None], 0, 255)
                if phs == 1:
                    tr = jnp.take(ops["t1"], w4)
                    adj = jnp.take_along_axis(
                        qp0, jnp.clip(tr, 0, 25), axis=1)
                else:
                    tr = jnp.take(ops["t2"], w4)
                    adj = jnp.take_along_axis(
                        qp1, jnp.clip(tr, 0, 25), axis=1)
                    bt_adj = jnp.take_along_axis(
                        qp1, jnp.clip(bt_n1p[:, None], 0, 25), axis=1)
                    adj = jnp.where((n[:, None] + 1) < N,
                                    adj - bt_adj - sigE_n1p[:, None], 0)
                xc = xc + jnp.where(cd[:, pi, :] == 0, adj, 0)
            okc = (pm[:, None] & (ilen >= minl)
                   & (cv[:, pi, :] > NEV // 2))
            if phs == 1:
                okc = okc & (cd[:, pi, :] != 2)
            xc = jnp.where(okc, xc, NEV)
            for k in range(n_nod):
                cur = state_v[k]
                jnc_k = spj_jnc[k]
                php_k = spj_phs[k]
                for l in range(NCAND):
                    take = (cd[:, pi, l] == k) & (xc[:, l] > cur) \
                        & okc[:, l]
                    cur = jnp.where(take, xc[:, l], cur)
                    jnc_k = jnp.where(take, cj[:, pi, l] + 1, jnc_k)
                    php_k = jnp.where(take, phs, php_k)
                state_v[k] = cur
                spj_jnc[k] = jnc_k
                spj_phs[k] = php_k
                sd_new = (DIAG, HORI, VERT, HORL, VERL)[k] | SPIN
                state_d[k] = jnp.where(jnc_k > 0, sd_new, state_d[k])
                gt2 = (jnc_k > 0) & (cur > mx_val)
                mx_val = jnp.where(gt2, cur, mx_val)
                mx_k = jnp.where(gt2, k, mx_k)
                mx_dir = jnp.where(gt2, state_d[k], mx_dir)
        if dagp:
            h_val, ev, f_val, ev2, f2_val = state_v
            h_dir, edir, f_dir, edir2, f2_dir = state_d
        else:
            h_val, ev, f_val = state_v
            h_dir, edir, f_dir = state_d

        # ---- winner into H
        h_out = mx_val
        hd_out = mx_dir

        # ---- donor pushes over phases
        don_any = internal & active & (n < N) & (phs5_n != -2)
        hd_nod = nod_of[jnp.clip(mx_dir & 15, 0, 63)]
        for phs, sig5_p in ((-1, sig5_np1), (0, sig5_n), (1, sig5_n1)):
            pm = don_any & (((phs5_n == 2) & (phs != 0))
                            | (phs5_n == phs))
            nb = n - phs
            pi = phs + 1
            d3_p = (d3_np1, d3_n, d3_n1)[pi]
            d5_p = (d5_np1, d5_n, d5_n1)[pi]
            for k in range(n_nod):
                crossspj = (phs == 1 and k == 0)
                if crossspj:
                    fv, fdir = hq_v, hq_d
                else:
                    fv = (h_out, ev, f_val, ev2, f2_val)[k]
                    fdir = (hd_out, edir, f_dir, edir2, f2_dir)[k]
                elig = pm
                if k == 0 and not crossspj:
                    elig = elig & (hd_nod == 0)
                elig = elig & (fdir != DEAD) & ((fdir & SPIN) == 0)
                if not crossspj:
                    z = mx_val + jnp.where(
                        (hd_nod == 0) | (((k - hd_nod) % 2) != 0),
                        (0, 0, gop, gop, lgop)[k], 0)
                    prune = (k != hd_nod) & (hd_nod >= 0) & (fv <= z)
                    elig = elig & ~prune
                x = fv + sig5_p
                # candidate stores (dinc3[nb5] << 4) | dinc5[nb5]: exon
                # tail for junction re-coding, intron head for the joint
                code = ((d3_p & 15) << 4) | (d5_p & 15)
                cvp, cjp, cdp, c3p = _insert_cand(
                    cv[:, pi, :], cj[:, pi, :], cd[:, pi, :],
                    c3d[:, pi, :], x, nb,
                    jnp.full(L, k, I32), code, elig)
                cv = cv.at[:, pi, :].set(cvp)
                cj = cj.at[:, pi, :].set(cjp)
                cd = cd.at[:, pi, :].set(cdp)
                c3d = c3d.at[:, pi, :].set(c3p)

        # ---- masked commit
        h_out = jnp.where(active, h_out, NEV)
        hd_c = jnp.where(active, hd_out, DEAD).astype(I32)
        f_out = jnp.where(active, f_val, NEV)
        eq = eq.at[q].set(jnp.where(active, ev, eq[q]))
        edq = edq.at[q].set(jnp.where(active, edir, edq[q]))
        f2_out = jnp.where(active, f2_val, NEV)
        f2d_c = jnp.where(active, f2_dir, DEAD).astype(I32)
        eq2 = eq2.at[q].set(jnp.where(active, ev2, eq2[q]))
        edq2 = edq2.at[q].set(jnp.where(active, edir2, edq2[q]))

        # ---- boundary / result writes
        li = L - 1
        nl = jnp.clip(n[li], 0, N + 1)
        wl = active[li]
        bnd_h = jax.lax.dynamic_update_slice_in_dim(
            bnd_h, jnp.where(wl, h_out[li], bnd_h[nl])[None], nl, 0)
        bnd_hd = jax.lax.dynamic_update_slice_in_dim(
            bnd_hd, jnp.where(wl, hd_c[li], bnd_hd[nl])[None], nl, 0)
        bnd_f = jax.lax.dynamic_update_slice_in_dim(
            bnd_f, jnp.where(wl, f_out[li], bnd_f[nl])[None], nl, 0)
        if dagp:
            bnd_f2 = jax.lax.dynamic_update_slice_in_dim(
                bnd_f2, jnp.where(wl, f2_out[li], bnd_f2[nl])[None], nl, 0)
            bnd_f2d = jax.lax.dynamic_update_slice_in_dim(
                bnd_f2d, jnp.where(wl, f2d_c[li],
                                   bnd_f2d[nl])[None], nl, 0)
        mi = jnp.clip(M - m0, 0, L - 1)
        nr = jnp.clip(n[mi], 0, N + 1)
        wr = (M - m0 >= 0) & (M - m0 < L) & active[mi]
        row_h = jax.lax.dynamic_update_slice_in_dim(
            row_h, jnp.where(wr, h_out[mi], row_h[nr])[None], nr, 0)
        rcl = jnp.argmax(jnp.where(n == N, 1, 0))
        wc = (n[rcl] == N) & active[rcl]
        mc = jnp.clip(m[rcl], 0, row_h.shape[0] - 1)
        rc_h = jax.lax.dynamic_update_slice_in_dim(
            rc_h, jnp.where(wc, h_out[rcl], rc_h[jnp.clip(
                mc, 0, rc_h.shape[0] - 1)])[None],
            jnp.clip(mc, 0, rc_h.shape[0] - 1), 0)

        hh_n = jnp.concatenate([h_out[None], hh[:5]])
        hd_n = jnp.concatenate([hd_c[None], hd[:5]])
        ff_n = jnp.concatenate([f_out[None], ff[:2]])
        ff2_n = jnp.concatenate([f2_out[None], ff2[:2]])
        fd2_n = jnp.concatenate([f2d_c[None], fd2[:2]])
        carry = (hh_n, hd_n, ff_n, eq, edq, ff2_n, fd2_n, eq2, edq2,
                 cv, cj, cd, c3d,
                 bnd_h, bnd_hd, bnd_f, bnd_f2, bnd_f2d, row_h, rc_h)
        if not emit_trace:
            return carry, ()
        # dirs fit 5 bits (<= HORL|SPIN = 27); winner node in bits 5-7
        fl_h = (jnp.clip(hd_out, 0, 31).astype(jnp.uint8)
                | (mx_k.astype(jnp.uint8) << 5))
        fl_h = jnp.where(active, fl_h, jnp.uint8(255))
        fl_e = (edir & 31).astype(jnp.uint8) | jnp.where(
            e_open, jnp.uint8(0x80), jnp.uint8(0))
        fl_f = (f_dir & 31).astype(jnp.uint8) | jnp.where(
            f_open, jnp.uint8(0x80), jnp.uint8(0))
        fl_e2 = (edir2 & 31).astype(jnp.uint8) | jnp.where(
            e2_open, jnp.uint8(0x80), jnp.uint8(0))
        fl_f2 = (f2_dir & 31).astype(jnp.uint8) | jnp.where(
            f2_open, jnp.uint8(0x80), jnp.uint8(0))
        spj_out = jnp.stack(spj_jnc, axis=1)
        php_out = jnp.stack(spj_phs, axis=1).astype(jnp.int8)
        return carry, (fl_h, fl_e, fl_f, spj_out, php_out, fl_e2, fl_f2)

    @jax.jit
    def run(carry0, qp0, qp1, ops, m0, lw, M, N, a_exgr):
        f = functools.partial(step, qp0=qp0, qp1=qp1, ops=ops, m0=m0,
                              lw=lw, M=M, N=N, a_exgr=a_exgr)
        return jax.lax.scan(f, carry0, jnp.arange(T))
    return run


def tron_init_row(sig: TronSignals, prm: TronDpParams, N: int,
                  a_exgl: bool = True):
    """Top-row H values/dirs over n = 0..N+1 (initH_ng semantics for the
    default free-end mode: reseed at translation starts, carry coding
    potential, 1/2-nt shifts)."""
    h = np.zeros(N + 2, dtype=np.int64)
    hd = np.full(N + 2, DEAD, dtype=np.int32)
    if not a_exgl:
        return h.astype(np.int32), hd
    sigS = sig.sigS
    sigE = sig.sigE

    def s_at(n):
        return int(sigS[n]) if 0 <= n < N else 0

    h[0] = max(s_at(1), 0)
    for i, n in enumerate(range(1, N + 2), start=1):
        if i < 3:
            h[n] = max(s_at(n + 1), 0)
            hd[n] = DEAD
        else:
            h[n] = h[n - 3] + prm.gep
            hd[n] = HORI
            if 0 <= n - 3 < N:
                h[n] += int(sigE[n - 3])
            x = h[n - 1] + prm.gap_w1
            if x > h[n]:
                h[n], hd[n] = x, HOR1
            x = h[n - 2] + prm.gap_w2
            if x > h[n]:
                h[n], hd[n] = x, HOR2
        x = max(s_at(n + 1), 0)
        if h[n] < x:
            h[n], hd[n] = x, DEAD
    return h.astype(np.int32), hd


@dataclass
class TronTraceScan:
    fl_h: list
    fl_e: list
    fl_f: list
    spj: list
    php: list
    L: int
    lw: int
    W: int
    fl_e2: list | None = None       # dagp long-gap planes
    fl_f2: list | None = None

    def cell(self, m, n):
        s = (m - 1) // self.L
        i = (m - 1) % self.L
        m0 = 3 * (s * self.L + 1)
        t = n - m0 - self.lw + 1 + 3 * i
        return s, t, i


def forward_tron_scan(a: np.ndarray, bn: np.ndarray, sig: TronSignals,
                      prm: TronDpParams, ipen_tab: np.ndarray,
                      lw: int | None = None, up: int | None = None,
                      flags: DpFlags | None = None, L: int = 64,
                      score_only: bool = False):
    """Run the tron wavefront for one problem."""
    flags = flags or DpFlags()
    M, N = len(a), len(bn)
    if lw is None:
        lw, up = -3 * M, N
    W = up - lw + 2
    n_slabs = (M + L - 1) // L
    Mpad = n_slabs * L
    Ngeom = -(-N // 384) * 384          # bucketed: reuse compilations
    pad_extra = 2 * (L + W + 16)
    T = W + 6 * (L - 1)
    opsd, qprof, pad, Lp3 = build_tron_operands(a, bn, sig, prm, ipen_tab,
                                                Mpad, pad_extra, flags,
                                                Npad=Ngeom)
    # bucket the intron-penalty table length too (values past the true
    # length are never read: intron length <= N)
    ipad = -(-len(opsd["ipen"]) // 512) * 512
    opsd["ipen"] = np.pad(opsd["ipen"], (0, ipad - len(opsd["ipen"])),
                          mode="edge")
    ops = {k: jnp.asarray(v) for k, v in opsd.items()}
    run = _tron_scan(L, W, prm.gop, prm.gep, prm.gap_e1,
                     prm.gap_e2, prm.gap_w1, prm.gap_w2, prm.gap_w3,
                     prm.intron_minl, T, pad, Lp3,
                     not score_only, dagp=prm.dagp, lgop=prm.lgop,
                     lgep=prm.lgep, gw3l=prm.gap_w3l)
    bh0, bd0 = tron_init_row(sig, prm, N, flags.a_exgl)
    bh0 = np.pad(bh0, (0, Ngeom - N), constant_values=NEV)
    bd0 = np.pad(bd0, (0, Ngeom - N), constant_values=DEAD)
    bnd_h = jnp.asarray(bh0)
    bnd_hd = jnp.asarray(bd0)
    bnd_f = jnp.full(Ngeom + 2, NEV)
    bnd_f2 = jnp.full(Ngeom + 2, NEV)
    bnd_f2d = jnp.zeros(Ngeom + 2, I32)
    row_h = jnp.full(Ngeom + 2, NEV)
    rc_h = jnp.full(max(Mpad + 2, Ngeom + 2), NEV)
    traces = []
    for s in range(n_slabs):
        m0 = s * L + 1
        qp0 = jnp.asarray(qprof[m0 - 1:m0 - 1 + L])
        qp1 = jnp.asarray(qprof[m0:m0 + L])
        carry0 = (
            jnp.full((6, L), NEV), jnp.zeros((6, L), I32),
            jnp.full((3, L), NEV),
            jnp.full((3, L), NEV), jnp.zeros((3, L), I32),
            jnp.full((3, L), NEV), jnp.zeros((3, L), I32),
            jnp.full((3, L), NEV), jnp.zeros((3, L), I32),
            jnp.full((L, 3, NCAND), NEV),
            jnp.zeros((L, 3, NCAND), I32),
            jnp.zeros((L, 3, NCAND), I32),
            jnp.zeros((L, 3, NCAND), I32),
            bnd_h, bnd_hd, bnd_f, bnd_f2, bnd_f2d, row_h, rc_h)
        carry, ys = run(carry0, qp0, qp1, ops, m0, lw, M, N, flags.a_exgr)
        (bnd_h, bnd_hd, bnd_f, bnd_f2, bnd_f2d, row_h,
         rc_h) = carry[13:20]
        if not score_only:
            traces.append(tuple(np.asarray(y) for y in ys))
    row_np = np.asarray(row_h).astype(np.int64)
    rc_np = np.asarray(rc_h).astype(np.int64)
    sigT = sig.sigT
    best_val, best_m, best_n = row_np[N], M, N
    if flags.a_exgr:
        for n in range(max(3 * M + lw - 1, 3), N + 1):
            v = row_np[n]
            if n - 3 >= 0 and 0 <= n - 2 < N and sigT[n - 2] > 0:
                vt = row_np[n - 3] + int(sigT[n - 2])
                if vt > v:
                    v = vt
            if v > best_val:
                best_val, best_m, best_n = v, M, n
    if flags.b_exgr:
        for r in range(N - 3 * M + 1, min(up, N) + 1):
            if (N - r) % 3 == 0:
                mm = (N - r) // 3
                if 1 <= mm < M and rc_np[mm] > best_val:
                    best_val, best_m, best_n = rc_np[mm], mm, N
    tr = None
    if not score_only:
        tr = TronTraceScan(fl_h=[t[0] for t in traces],
                           fl_e=[t[1] for t in traces],
                           fl_f=[t[2] for t in traces],
                           spj=[t[3] for t in traces],
                           php=[t[4] for t in traces],
                           L=L, lw=lw, W=W,
                           fl_e2=[t[5] for t in traces],
                           fl_f2=[t[6] for t in traces])
        tr.row_h = row_np      # debug visibility
        tr.rc_h = rc_np
    return int(best_val), best_m, best_n, tr


def traceback_tron_scan(tr: TronTraceScan, end_m: int, end_n: int,
                        guard: int = 10_000_000):
    """Same op stream as traceback_tron_ref, from wavefront planes."""
    ops = []
    m, n = end_m, end_n
    state = 0
    steps = 0
    while steps < guard and m > 0 and n > 0:
        steps += 1
        s, t, i = tr.cell(m, n)
        if t < 0 or t >= tr.fl_h[s].shape[0]:
            break
        if state == 0:
            hd = int(tr.fl_h[s][t, i])
            if hd == 255:
                break
            winner = (hd >> 5) & 7
            if winner != 0:
                state = winner
                continue
            jnc = int(tr.spj[s][t, i, 0])
            if jnc:
                phs = int(tr.php[s][t, i, 0])
                nb5, nb3 = jnc - 1, n - phs
                ops.append(('I', m, nb5, nb3, phs))
                if phs == 0:
                    n = nb5
                elif phs == 1:
                    ops.append(('D', m, n))
                    m, n = m - 1, nb5 + 1 - 3
                else:
                    n = nb5 - 1
                continue
            if (hd & 15) == DEAD:
                break
            ops.append(('D', m, n))
            m, n = m - 1, n - 3
            continue
        if state in (1, 3):
            jnc = int(tr.spj[s][t, i, state])
            if jnc:
                phs = int(tr.php[s][t, i, state])
                ops.append(('I', m, jnc - 1, n - phs, phs))
                n = jnc - 1 + phs
                continue
            ed = int((tr.fl_e if state == 1 else tr.fl_e2)[s][t, i])
            base = ed & 15
            opened = bool(ed & 0x80)
            w = {HORI: 3, HOR2: 2, HOR1: 1, HORL: 3}.get(base, 3)
            ops.append(('E', m, n, w))
            n -= w
            if opened:
                state = 0
            continue
        jnc = int(tr.spj[s][t, i, state])
        if jnc:
            phs = int(tr.php[s][t, i, state])
            ops.append(('I', m, jnc - 1, n - phs, phs))
            n = jnc - 1 + phs
            continue
        fd = int((tr.fl_f if state == 2 else tr.fl_f2)[s][t, i])
        base = fd & 15
        opened = bool(fd & 0x80)
        step_n = {VERT: 0, SLA2: 2, SLA1: 1, VERL: 0}.get(base, 0)
        ops.append(('F', m, n, step_n))
        m -= 1
        n -= step_n
        if opened:
            state = 0
    ops.reverse()
    return ops
