"""Banded spliced DP as a JAX wavefront scan — the TPU compute path.

Re-designs the reference's SIMD slab engine (fwd2s1_simd.cc:309-457) for
TPU/XLA: a rhomboidal wavefront where vector lane i owns query row
m = m0 + i and at scan step t computes the single cell

    n_i(t) = (m0 + lw + 1 + t) - i          (band offset r = lw + 1 + t - 2i)

so every dependency is a lane-shift of the previous one or two steps'
outputs: left (E/H) = same lane @ t-1, up (F/H) = lane i-1 @ t-1,
diag = lane i-1 @ t-2.  All genome-indexed operands (residues, splice
signals, acceptor tables) are read as contiguous slices of pre-reversed
arrays, so each step is pure VPU work with no gathers except the
intron-length penalty lookup.

Splice state per lane: the NCAND=4 donor-candidate list (value, junction,
state, donor dinucleotide) kept sorted by value with masked insertion —
the vectorized equivalent of fwd2s1.cc:380-406 — plus the psp orphan-exon
bitmask.  Tie-breaking and comparison directions follow the scalar oracle
(SURVEY.md A.4) exactly; tests assert bit-identical scores and paths.

Query rows beyond one slab of L lanes run as consecutive slabs; slab i+1
reads its top boundary (H/F of the previous slab's last row, per n) from
buffers the previous slab scatter-writes one element per step.

Scores are x10 fixed-point int32 (no re-basing needed, unlike the
reference's int16 lanes, fwd2s1_simd.cc:458-465).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .params import DpParams, DpFlags, NEVSEL
from ..score.splice import SpliceSignals

NCAND = 4
I32 = jnp.int32
NEV = np.int32(NEVSEL)


@dataclass
class SplicedOperands:
    """Device-ready per-problem operands (host-built, padded)."""
    qprof: np.ndarray       # (Mpad, 17) int32: substitution row per query pos
    rb_code: np.ndarray     # (Npad+PAD,) int8 reversed genome codes
    rb_isdon: np.ndarray    # reversed donor mask (int32 0/1)
    rb_isacc: np.ndarray
    rb_sig5: np.ndarray     # reversed donor signal
    rb_accb: np.ndarray     # reversed acceptor base sig3 - tab3[dinc3]
    rb_dinc5: np.ndarray    # reversed donor dinucleotide codes
    rb_joint: np.ndarray    # (Npad+PAD, 16) reversed tab53[16*d5 + dinc3[n]]
    ipen: np.ndarray        # (Npad+1,) intron penalty by length
    colinit: np.ndarray     # (Mpad+1,) H[m][0] init column
    M: int
    N: int


def build_operands(a: np.ndarray, b: np.ndarray, prm: DpParams,
                   sig: SpliceSignals | None, Mpad: int, Npad: int,
                   flags: DpFlags, pad_extra: int) -> SplicedOperands:
    M, N = len(a), len(b)
    qprof = np.zeros((Mpad, prm.qprof_mtx.shape[1]), dtype=np.int32)
    qprof[:M] = prm.qprof_mtx[np.asarray(a, dtype=np.int64)]

    def rev(x, fill=0, width=None):
        # right-aligned at pad2 + Npad so index pad2 + Npad - n addresses
        # b[n-1] uniformly for any N <= Npad (geometry bucketing)
        out = np.full(Npad + pad_extra, fill, dtype=np.int32) if width is None \
            else np.full((Npad + pad_extra, width), fill, dtype=np.int32)
        o = pad_extra // 2 + Npad - N
        out[o:o + N] = x[::-1]
        return out

    if sig is not None:
        accb = sig.sig3.astype(np.int32) - sig.tabs.tab3[sig.dinc3]
        rb_isdon = rev(sig.is_donor.astype(np.int32))
        rb_isacc = rev(sig.is_accpt.astype(np.int32))
        rb_sig5 = rev(sig.sig5.astype(np.int32))
        rb_accb = rev(accb)
        rb_dinc5 = rev(sig.dinc5.astype(np.int32))
        rb_joint = rev(sig.acc_joint, width=16)
        ipen = prm.intron_table(Npad + 1)
    else:
        z = np.zeros(N, dtype=np.int32)
        rb_isdon = rev(z)
        rb_isacc = rev(z)
        rb_sig5 = rev(z)
        rb_accb = rev(z)
        rb_dinc5 = rev(z)
        rb_joint = rev(np.zeros((N, 16), np.int32), width=16)
        ipen = np.full(Npad + 1, NEVSEL // 2, dtype=np.int32)

    rb_code = rev(np.asarray(b, dtype=np.int32))
    colinit = np.zeros(Mpad + 1, dtype=np.int64)
    if not flags.b_exgl:
        ms = np.arange(1, Mpad + 1)
        colinit[1:] = prm.gop + prm.gep * ms
    return SplicedOperands(qprof=qprof, rb_code=rb_code, rb_isdon=rb_isdon,
                           rb_isacc=rb_isacc, rb_sig5=rb_sig5,
                           rb_accb=rb_accb, rb_dinc5=rb_dinc5,
                           rb_joint=rb_joint, ipen=ipen,
                           colinit=colinit.astype(np.int32), M=M, N=N)


def _insert_candidate(cv, cj, cd, c5, x, jnc, kdir, d5, do_push):
    """Masked insertion of (x, jnc, kdir, d5) into the sorted candidate
    list (L, NCAND), evicting the worst.  Ties keep existing entries first
    (reference scans from the tail with strict >, fwd2s1.cc:393-398)."""
    pos = jnp.sum(cv >= x[:, None], axis=1)              # insertion slot
    slot = jnp.arange(NCAND)[None, :]
    ins_here = (slot == pos[:, None]) & do_push[:, None]
    shift = (slot > pos[:, None]) & do_push[:, None]

    def place(arr, new):
        shifted = jnp.concatenate(
            [arr[:, :1], arr[:, :-1]], axis=1)           # arr[j-1]
        return jnp.where(ins_here, new[:, None],
                         jnp.where(shift, shifted, arr))

    return (place(cv, x), place(cj, jnc), place(cd, kdir), place(c5, d5))


def _make_step(L, W, gop, gep, llmt, pad2, Npad, Mpad,
               n_states=3, emit_trace=True):
    """Build the scan step function (closures over static geometry).
    lw, m0, M, N are traced so one compilation serves every band
    placement / sequence length within the padded geometry."""

    def step(carry, t, *, qprof_slab, ops, m0, lw, M, N, mrow, a_exgr):
        (h1, h2, f1, e1, psp, cv, cj, cd, c5,
         bnd_h, bnd_f, row_h, rc_h) = carry
        a_exgr = jnp.asarray(a_exgr, bool)   # python-bool ~ is arithmetic
        lanes = jnp.arange(L)
        m = m0 + lanes                                    # (L,)
        n = (m0 + lw + 1 + t) - lanes
        r_off = t - 2 * lanes                             # r - (lw+1)
        started = r_off >= 0
        in_band = r_off < W
        active = (started & in_band & (n >= 1) & (n <= N)
                  & (m >= 1) & (m <= M))
        first = r_off == 0                                # lane (re)activates

        # ---- reversed-array slices: index pad/2 + (N-1) - (n-1)
        # slice value at (base + i) = original[n_i - 1]; splice signals are
        # indexed by the boundary position n itself, so they use base - 1
        base = pad2 + Npad - (m0 + lw + 1 + t)            # index for lane 0
        sl = lambda arr, o=0: jax.lax.dynamic_slice_in_dim(arr, base + o, L)
        b_code = sl(ops["rb_code"])
        isdon = sl(ops["rb_isdon"], -1) != 0
        isacc = sl(ops["rb_isacc"], -1) != 0
        sig5 = sl(ops["rb_sig5"], -1)
        accb = sl(ops["rb_accb"], -1)
        dinc5 = sl(ops["rb_dinc5"], -1)
        joint = jax.lax.dynamic_slice(ops["rb_joint"], (base - 1, 0),
                                      (L, 16))

        # per-lane substitution score s(a[m-1], b[n-1])
        score = jnp.take_along_axis(qprof_slab, b_code[:, None],
                                    axis=1)[:, 0]

        # ---- neighbor values
        up_h = jnp.concatenate([jnp.full((1,), NEV), h1[:-1]])
        up_f = jnp.concatenate([jnp.full((1,), NEV), f1[:-1]])
        diag_h = jnp.concatenate([jnp.full((1,), NEV), h2[:-1]])
        # lane 0 reads the previous slab / init row boundary
        n0 = m0 + lw + 1 + t
        bh = jax.lax.dynamic_slice_in_dim(bnd_h, jnp.maximum(n0 - 1, 0), 2)
        bf = jax.lax.dynamic_slice_in_dim(bnd_f, jnp.maximum(n0 - 1, 0), 2)
        up_h = up_h.at[0].set(jnp.where(n0 <= N + 1, bh[1], NEV))
        up_f = up_f.at[0].set(jnp.where(n0 <= N + 1, bf[1], NEV))
        diag_h = diag_h.at[0].set(jnp.where(n0 - 1 <= N, bh[0], NEV))
        left_h = h1
        # column-0 overrides
        col_m = jnp.take(ops["colinit"], jnp.clip(m, 0, Mpad))
        col_m1 = jnp.take(ops["colinit"], jnp.clip(m - 1, 0, Mpad))
        left_h = jnp.where(n == 1, col_m, jnp.where(first, NEV, left_h))
        diag_h = jnp.where(n == 1, col_m1, diag_h)
        # band-right edge: vertical sources invalid
        at_top = r_off >= W - 1
        up_h = jnp.where(at_top, NEV, up_h)
        up_f = jnp.where(at_top, NEV, up_f)
        e1 = jnp.where(first, NEV, e1)
        psp = jnp.where(first, 0, psp)
        cv = jnp.where(first[:, None], NEV, cv)
        cj = jnp.where(first[:, None], 0, cj)
        cd = jnp.where(first[:, None], 0, cd)
        c5 = jnp.where(first[:, None], 0, c5)

        # ================= recurrence (order = fwd2s1.cc:276-431) =========
        h_val = diag_h + score                            # Diagonal
        mx_val, mx_k = h_val, jnp.zeros(L, jnp.int32)
        # Vertical (F): new-gap >= extend
        xo = up_h + gop
        f_open = xo >= up_f
        f_val = jnp.where(f_open, xo, up_f) + gep
        gt = f_val > mx_val
        mx_val = jnp.where(gt, f_val, mx_val)
        mx_k = jnp.where(gt, 2, mx_k)
        # Horizontal (E1)
        xo = left_h + gop
        e_open = xo >= e1
        e_val = jnp.where(e_open, xo, e1) + gep
        psp = jnp.where(e_open, jnp.where(psp != 0, 1, 0), psp & 1)
        ge = e_val >= mx_val
        mx_val = jnp.where(ge, e_val, mx_val)
        mx_k = jnp.where(ge, 1, mx_k)

        # ---- acceptor close (fwd2s1.cc:333-354)
        internal = (~a_exgr) | (m < M)
        acc_ok = isacc & internal & active & (n < N)
        ilen = n[:, None] - cj                            # (L, NCAND)
        pen = jnp.take(ops["ipen"], jnp.clip(ilen, 0, Npad))
        j16 = jnp.take_along_axis(joint, jnp.clip(c5, 0, 15), axis=1)
        xc = cv + pen + accb[:, None] + j16
        cand_ok = (acc_ok[:, None] & (ilen >= llmt) & (cv > NEV // 2))
        xc = jnp.where(cand_ok, xc, NEV)
        state_vals = [h_val, e_val, f_val]
        spj = []
        for k in range(n_states):
            cur = state_vals[k]
            jnc_k = jnp.zeros(L, jnp.int32)
            for l in range(NCAND):                        # best-first order
                take = (cd[:, l] == k) & (xc[:, l] >= cur) & cand_ok[:, l]
                cur = jnp.where(take, xc[:, l], cur)
                jnc_k = jnp.where(take, cj[:, l] + 1, jnc_k)
            state_vals[k] = cur
            spj.append(jnc_k)
            closed = jnc_k > 0
            psp = jnp.where(closed, psp | (4, 1, 8)[k], psp)
            ge = closed & (cur >= mx_val)
            mx_val = jnp.where(ge, cur, mx_val)
            mx_k = jnp.where(ge, k, mx_k)
        h_val, e_val, f_val = state_vals

        # ---- winner into H
        h_out = mx_val
        hdir = mx_k

        # ---- donor push (fwd2s1.cc:380-406)
        don_ok = isdon & internal & active & (n < N)
        GOPk = (0, gop, gop)                              # GOP[k//2]
        for k in range(n_states):
            fv = (h_val, e_val, f_val)[k]
            # k = 0 only pushed when diag won
            elig = don_ok & ((mx_k == 0) if k == 0 else True)
            elig &= (psp & (4, 1, 8)[k]) == 0
            z = mx_val + jnp.where((mx_k == 0) | (((k - mx_k) % 2) != 0),
                                   GOPk[k // 2], 0)
            prune = (k != mx_k) & (fv <= z)
            elig &= ~prune
            x = fv + sig5
            cv, cj, cd, c5 = _insert_candidate(
                cv, cj, cd, c5, x, n, jnp.full(L, k, jnp.int32),
                dinc5, elig)

        # ---- masked commit
        h_out = jnp.where(active, h_out, NEV)
        f_out = jnp.where(active, f_val, NEV)
        e1 = jnp.where(active, e_val, e1)

        # ---- boundary / result scatter-writes
        last_lane = L - 1
        nl = jnp.clip(n[last_lane], 0, N + 1)
        wl = active[last_lane]
        bnd_h = jax.lax.dynamic_update_slice_in_dim(
            bnd_h, jnp.where(wl, h_out[last_lane], bnd_h[nl])[None], nl, 0)
        bnd_f = jax.lax.dynamic_update_slice_in_dim(
            bnd_f, jnp.where(wl, f_out[last_lane], bnd_f[nl])[None], nl, 0)
        # final-row / right-column trackers
        mrow_i = mrow - m0                                # lane of row M
        in_slab = (mrow_i >= 0) & (mrow_i < L)
        li = jnp.clip(mrow_i, 0, L - 1)
        nr = jnp.clip(n[li], 0, N + 1)
        wr = in_slab & active[li]
        row_h = jax.lax.dynamic_update_slice_in_dim(
            row_h, jnp.where(wr, h_out[li], row_h[nr])[None], nr, 0)
        rcl = jnp.argmax(jnp.where(n == N, 1, 0))
        wc = (n[rcl] == N) & active[rcl]
        mc = jnp.clip(m[rcl], 0, Mpad + 1)
        rc_h = jax.lax.dynamic_update_slice_in_dim(
            rc_h, jnp.where(wc, h_out[rcl], rc_h[mc])[None], mc, 0)

        carry = (h_out, h1, f_out, e1, psp, cv, cj, cd, c5,
                 bnd_h, bnd_f, row_h, rc_h)
        if not emit_trace:
            return carry, ()
        # ---- traceback emissions
        flags8 = (hdir.astype(jnp.uint8)
                  | (e_open.astype(jnp.uint8) << 2)
                  | (f_open.astype(jnp.uint8) << 3))
        flags8 = jnp.where(active, flags8, jnp.uint8(255))
        spj_out = jnp.stack(spj, axis=1).astype(jnp.int32)   # (L, 3)
        return carry, (flags8, spj_out)

    return step


def forward_spliced_scan(a: np.ndarray, b: np.ndarray, prm: DpParams,
                         sig: SpliceSignals | None = None,
                         lw: int | None = None, up: int | None = None,
                         flags: DpFlags | None = None, L: int = 128):
    """Run the wavefront engine for one problem. Returns
    (score, end_m, end_n, SliceTrace) with host traceback planes."""
    flags = flags or DpFlags()
    M, N = len(a), len(b)
    if lw is None:
        lw, up = -M, N
    W = up - lw + 1
    n_slabs = (M + L - 1) // L
    Mpad = n_slabs * L
    Ngeom = -(-N // 256) * 256          # bucketed: reuse compilations
    pad_extra = 2 * (L + W + 4)
    opsd = build_operands(a, b, prm, sig, Mpad, Ngeom, flags, pad_extra)

    ops = {
        "rb_code": jnp.asarray(opsd.rb_code),
        "rb_isdon": jnp.asarray(opsd.rb_isdon),
        "rb_isacc": jnp.asarray(opsd.rb_isacc),
        "rb_sig5": jnp.asarray(opsd.rb_sig5),
        "rb_accb": jnp.asarray(opsd.rb_accb),
        "rb_dinc5": jnp.asarray(opsd.rb_dinc5),
        "rb_joint": jnp.asarray(opsd.rb_joint),
        "ipen": jnp.asarray(opsd.ipen),
        "colinit": jnp.asarray(opsd.colinit),
    }
    T = W + 2 * (L - 1)

    # init-row boundary (row m0 - 1 = 0): H[0][n]
    if flags.a_exgl:
        bnd_h = np.zeros(Ngeom + 2, dtype=np.int32)
    else:
        ns = np.arange(Ngeom + 2)
        bnd_h = (prm.gop + prm.gep * ns).astype(np.int32)
        bnd_h[0] = 0
    bnd_h[N + 1:] = NEVSEL
    bnd_f = np.full(Ngeom + 2, NEVSEL, dtype=np.int32)
    row_h = jnp.full(Ngeom + 2, NEV)
    rc_h = jnp.full(Mpad + 2, NEV)
    bnd_h = jnp.asarray(bnd_h)
    bnd_f = jnp.asarray(bnd_f)

    all_flags, all_spj = [], []
    scan = _scan_slab(L, W, prm.gop, prm.gep, prm.intron_llmt, T,
                      pad_extra // 2, Ngeom, Mpad)
    for s in range(n_slabs):
        m0 = s * L + 1
        qprof_slab = jnp.asarray(opsd.qprof[m0 - 1:m0 - 1 + L])
        carry0 = (
            jnp.full(L, NEV), jnp.full(L, NEV), jnp.full(L, NEV),
            jnp.full(L, NEV), jnp.zeros(L, jnp.int32),
            jnp.full((L, NCAND), NEV), jnp.zeros((L, NCAND), jnp.int32),
            jnp.zeros((L, NCAND), jnp.int32), jnp.zeros((L, NCAND),
                                                        jnp.int32),
            bnd_h, bnd_f, row_h, rc_h)
        carry, (fl, sp) = scan(carry0, qprof_slab, ops, m0, lw, M, N, M,
                               flags.a_exgr)
        bnd_h, bnd_f, row_h, rc_h = carry[9], carry[10], carry[11], carry[12]
        all_flags.append(np.asarray(fl))
        all_spj.append(np.asarray(sp))

    row_h = np.asarray(row_h)
    rc_h = np.asarray(rc_h)
    # final score selection (lastS_ng semantics)
    best_val, best_m, best_n = int(row_h[N]), M, N
    if flags.a_exgr:
        n_lo = max(M + lw, 0) + 1
        for n in range(n_lo, N):
            if row_h[n] > best_val:
                best_val, best_m, best_n = int(row_h[n]), M, n
    if flags.b_exgr:
        m_lo = max(N - up, 1)
        for m in range(m_lo, M):
            if rc_h[m] > best_val:
                best_val, best_m, best_n = int(rc_h[m]), m, N
    trace = SliceTrace(flags=all_flags, spj=all_spj, L=L, lw=lw, W=W)
    return best_val, best_m, best_n, trace


@functools.lru_cache(maxsize=128)
def _scan_slab(L, W, gop, gep, llmt, T, pad2, Npad, Mpad,
               emit_trace=True, batched=False):
    """Compile one slab runner per static geometry (cached).  Band
    placement (lw) and true lengths (M, N) are traced arguments, so only
    the padded geometry (L, W/T, Npad, Mpad) forces a new compilation."""
    step = _make_step(L, W, gop, gep, llmt, pad2, Npad, Mpad,
                      emit_trace=emit_trace)

    def run1(carry0, qprof_slab, ops, m0, lw, M, N, mrow, a_exgr):
        f = functools.partial(step, qprof_slab=qprof_slab, ops=ops, m0=m0,
                              lw=lw, M=M, N=N, mrow=mrow, a_exgr=a_exgr)
        return jax.lax.scan(f, carry0, jnp.arange(T))

    if batched:
        # batch axis over problems: carry/operands batched, step scalar
        # args (m0, a_exgr) shared, per-problem lw/M/N/mrow batched (each
        # problem may place its band independently)
        run1 = jax.vmap(run1,
                        in_axes=(0, 0, 0, None, 0, 0, 0, 0, None))
    return jax.jit(run1)


@dataclass
class BatchProblem:
    """Device-resident batched operands (host prep separated from the DP
    execute so benchmarks measure pure device throughput)."""
    ops: dict
    qprof_all: object          # jnp (B, Mpad, alpha)
    bnd_h0: object
    bnd_f0: object
    Ms: list
    Ns: list
    lws: list
    Ms_j: object
    Ns_j: object
    lws_j: object
    B: int
    L: int
    W: int
    lw: int
    up: int
    Mpad: int
    Nmax: int
    T: int
    pad2: int
    n_slabs: int
    flags: DpFlags


def prepare_spliced_batch(queries: list, genomes: list, prm: DpParams,
                          sigs: list | None = None,
                          lw: int = None, up: int = None,
                          flags: DpFlags | None = None,
                          L: int = 128,
                          lws: list | None = None,
                          W: int | None = None) -> BatchProblem:
    """Host stage: pad B problems to a common geometry and ship operands.

    Either one (lw, up) band for the whole batch, or per-problem band
    placements ``lws`` with a common width ``W`` (each problem's band is
    [lws[i], lws[i] + W - 1])."""
    flags = flags or DpFlags()
    B = len(queries)
    Ms = [len(q) for q in queries]
    Ns = [len(g) for g in genomes]
    Mmax, Nmax = max(Ms), max(Ns)
    if lws is None:
        if lw is None:
            lw, up = -Mmax, Nmax
        W = up - lw + 1
        lws = [lw] * B
    else:
        assert W is not None
        lw, up = min(lws), max(lws) + W - 1
    n_slabs = (Mmax + L - 1) // L
    Mpad = n_slabs * L
    Nmax = -(-Nmax // 256) * 256        # bucketed: reuse compilations
    pad_extra = 2 * (L + W + 4)
    T = W + 2 * (L - 1)

    keys = ("rb_code", "rb_isdon", "rb_isacc", "rb_sig5", "rb_accb",
            "rb_dinc5", "rb_joint", "ipen", "colinit")
    stacked = {k: [] for k in keys}
    qprofs = []
    for i in range(B):
        sig = sigs[i] if sigs is not None else None
        od = build_operands(np.asarray(queries[i]), np.asarray(genomes[i]),
                            prm, sig, Mpad, Nmax, flags, pad_extra)
        # build_operands right-aligns reversed data at pad2 + Nmax, so
        # index pad2 + Nmax - n addresses b[n-1] uniformly across
        # problems of different N
        for k, arr in (("rb_code", od.rb_code), ("rb_isdon", od.rb_isdon),
                       ("rb_isacc", od.rb_isacc), ("rb_sig5", od.rb_sig5),
                       ("rb_accb", od.rb_accb), ("rb_dinc5", od.rb_dinc5),
                       ("rb_joint", od.rb_joint)):
            stacked[k].append(arr)
        stacked["ipen"].append(od.ipen)
        stacked["colinit"].append(od.colinit)
        qprofs.append(od.qprof)
    ops = {k: jnp.asarray(np.stack(v)) for k, v in stacked.items()}
    qprof_all = jnp.asarray(np.stack(qprofs))          # (B, Mpad, 17)

    if flags.a_exgl:
        bnd_h = np.zeros((B, Nmax + 2), dtype=np.int32)
    else:
        ns = np.arange(Nmax + 2)
        bnd_h = np.broadcast_to((prm.gop + prm.gep * ns).astype(np.int32),
                                (B, Nmax + 2)).copy()
        bnd_h[:, 0] = 0
    for i in range(B):
        bnd_h[i, Ns[i] + 1:] = NEVSEL
    bnd_f = np.full((B, Nmax + 2), NEVSEL, dtype=np.int32)
    return BatchProblem(ops=ops, qprof_all=qprof_all,
                        bnd_h0=jnp.asarray(bnd_h), bnd_f0=jnp.asarray(bnd_f),
                        Ms=Ms, Ns=Ns, lws=lws, Ms_j=jnp.asarray(Ms),
                        Ns_j=jnp.asarray(Ns), lws_j=jnp.asarray(lws),
                        B=B, L=L, W=W, lw=lw, up=up,
                        Mpad=Mpad, Nmax=Nmax, T=T, pad2=pad_extra // 2,
                        n_slabs=n_slabs, flags=flags)


def run_spliced_batch(bp: BatchProblem, prm: DpParams,
                      score_only: bool = True, block: bool = True):
    """Device stage: run all slabs; returns (row_h, rc_h, traces_raw)."""
    B, L = bp.B, bp.L
    scan = _scan_slab(L, bp.W, prm.gop, prm.gep,
                      prm.intron_llmt, bp.T, bp.pad2, bp.Nmax, bp.Mpad,
                      emit_trace=not score_only, batched=True)
    bnd_h, bnd_f = bp.bnd_h0, bp.bnd_f0
    row_h = jnp.full((B, bp.Nmax + 2), NEV)
    rc_h = jnp.full((B, bp.Mpad + 2), NEV)
    traces = []
    for s in range(bp.n_slabs):
        m0 = s * L + 1
        qprof_slab = jax.lax.dynamic_slice_in_dim(bp.qprof_all, m0 - 1, L,
                                                  axis=1)
        carry0 = (
            jnp.full((B, L), NEV), jnp.full((B, L), NEV),
            jnp.full((B, L), NEV), jnp.full((B, L), NEV),
            jnp.zeros((B, L), jnp.int32),
            jnp.full((B, L, NCAND), NEV),
            jnp.zeros((B, L, NCAND), jnp.int32),
            jnp.zeros((B, L, NCAND), jnp.int32),
            jnp.zeros((B, L, NCAND), jnp.int32),
            bnd_h, bnd_f, row_h, rc_h)
        carry, ys = scan(carry0, qprof_slab, bp.ops, m0, bp.lws_j,
                         bp.Ms_j, bp.Ns_j, bp.Ms_j, bp.flags.a_exgr)
        bnd_h, bnd_f, row_h, rc_h = (carry[9], carry[10], carry[11],
                                     carry[12])
        if not score_only:
            traces.append(ys)
    if block:
        row_h.block_until_ready()
    return row_h, rc_h, traces


def collect_batch_results(bp: BatchProblem, row_h, rc_h, traces,
                          score_only: bool):
    """Host stage: final score/end extraction (lastS_ng semantics)."""
    row_np = np.asarray(row_h)
    rc_np = np.asarray(rc_h)
    flags = bp.flags
    scores = np.empty(bp.B, dtype=np.int64)
    ends = np.empty((bp.B, 2), dtype=np.int64)
    for i in range(bp.B):
        M, N = bp.Ms[i], bp.Ns[i]
        lw, up = bp.lws[i], bp.lws[i] + bp.W - 1
        bv, bm, bn = int(row_np[i, N]), M, N
        if flags.a_exgr:
            n_lo = max(M + lw, 0) + 1
            seg = row_np[i, n_lo:N]
            if len(seg) and seg.max() > bv:
                k = int(np.argmax(seg))
                bv, bm, bn = int(seg[k]), M, n_lo + k
        if flags.b_exgr:
            m_lo = max(N - up, 1)
            seg = rc_np[i, m_lo:M]
            if len(seg) and seg.max() > bv:
                k = int(np.argmax(seg))
                bv, bm, bn = int(seg[k]), m_lo + k, N
        scores[i] = bv
        ends[i] = (bm, bn)
    if score_only:
        return scores, ends, None
    btraces = []
    for i in range(bp.B):
        fl = [np.asarray(ys[0][i]) for ys in traces]
        sp = [np.asarray(ys[1][i]) for ys in traces]
        btraces.append(SliceTrace(flags=fl, spj=sp, L=bp.L, lw=bp.lws[i],
                                  W=bp.W))
    return scores, ends, btraces


def forward_spliced_batch(queries: list, genomes: list, prm: DpParams,
                          sigs: list | None = None,
                          lw: int = None, up: int = None,
                          flags: DpFlags | None = None, L: int = 128,
                          score_only: bool = True):
    """Batched wavefront engine: B problems padded to common geometry and
    vmapped over the slab scan — the throughput path for genome mapping
    (replaces the reference's ThQueue worker pool, spaln.cc:1220-1468)."""
    bp = prepare_spliced_batch(queries, genomes, prm, sigs=sigs, lw=lw,
                               up=up, flags=flags, L=L)
    row_h, rc_h, traces = run_spliced_batch(bp, prm, score_only=score_only)
    return collect_batch_results(bp, row_h, rc_h, traces, score_only)


@dataclass
class SliceTrace:
    """Traceback planes per slab: flags (T, L) uint8, spj (T, L, 3)."""
    flags: list
    spj: list
    L: int
    lw: int
    W: int

    def cell(self, m: int, n: int):
        s = (m - 1) // self.L
        i = (m - 1) % self.L
        m0 = s * self.L + 1
        t = (n - m) - self.lw - 1 + 2 * i
        return s, t, i

    def hdir(self, m, n):
        s, t, i = self.cell(m, n)
        return int(self.flags[s][t, i]) & 3

    def eopen(self, m, n):
        s, t, i = self.cell(m, n)
        return bool(self.flags[s][t, i] & 4)

    def fopen(self, m, n):
        s, t, i = self.cell(m, n)
        return bool(self.flags[s][t, i] & 8)

    def spj_at(self, k, m, n):
        s, t, i = self.cell(m, n)
        return int(self.spj[s][t, i, k])


def traceback_spliced_scan(tr: SliceTrace, end_m: int, end_n: int,
                           guard: int = 10_000_000):
    """Same op stream as traceback_spliced_ref, from wavefront planes."""
    ops = []
    m, n = end_m, end_n
    state = 0
    steps = 0
    while steps < guard and m > 0 and n >= 1:
        steps += 1
        if state == 0:
            hd = tr.hdir(m, n)
            fl = tr.flags[tr.cell(m, n)[0]][tr.cell(m, n)[1],
                                            tr.cell(m, n)[2]]
            if fl == 255:
                break
            if hd == 0:
                jnc = tr.spj_at(0, m, n)
                if jnc:
                    ops.append(('I', m, jnc - 1, n))
                    n = jnc - 1
                    continue
                ops.append(('D', m, n))
                m, n = m - 1, n - 1
                continue
            if hd == 3:
                break
            state = hd
            continue
        jnc = tr.spj_at(state, m, n)
        if jnc:
            ops.append(('I', m, jnc - 1, n))
            n = jnc - 1
            continue
        if state == 1:
            opened = tr.eopen(m, n)
            ops.append(('E', m, n))
            n -= 1
            if opened:
                state = 0
            continue
        opened = tr.fopen(m, n)
        ops.append(('F', m, n))
        m -= 1
        if opened:
            state = 0
    ops.reverse()
    return ops
