"""Banded spliced DP as a Pallas TPU kernel — the speed-of-light path.

Same wavefront decomposition as dp_spliced_scan (lane i owns query row
m0+i; step t computes n_i(t) = m0+lw+1+t-i), but authored as a hand-tiled
Mosaic kernel: each program sweeps one CHUNK-step block of the band for
one group of GRP problems, with the carry in (GRP,128) vector registers
and every operand resident in VMEM.  Replaces the reference's SIMD slab
engine (fwd2s1_simd.cc:309-457) at the level of the hardware the TPU
actually has: an 8x128 VPU and ~4 (8,128) int32 ops per cycle.

Round-3 redesign (all three were measured dominant on chip):

  * INCREMENTAL WINDOW.  The wavefront's genome window moves one column
    per step; instead of re-materializing it each step with a 2-tile
    concat + dynamic pltpu.roll (Mosaic forbids unaligned lane slices),
    the window lives in the loop carry and shifts right by one lane per
    step.  The entering lane-0 column comes from a per-chunk "entering
    columns" tile cut from a REVERSED copy of the operand stack, itself
    shifted left once per step so the next value is always a static
    [:, :1] slice.  One constant-shift roll replaces the dynamic roll.
  * CARRIED INTRON PENALTY.  The 120-entry compare/select chain over
    the penalty value runs (x4 candidates = ~480 selects/step, measured
    31% of the step) is replaced by a carried per-candidate penalty:
    the exact table (rebuilt densely from the same ipen_key the scan
    engine chains over, so equality is by construction) is gathered
    directly while ilen < 128 (tpu.dynamic_gather on a broadcast head
    row) and beyond that decremented by a boundary bit looked up in a
    bit-packed mask (one dynamic_gather per candidate per step).  The
    table's deltas are {0,-1} for every length >= 58 for all fitted ILD
    mixtures (prep asserts this and the caller falls back to the scan
    engine otherwise).
  * GATHERED EMISSIONS.  Slab-boundary fills and the row/right-column
    result extractions were masked cross-lane reductions; fills now ride
    the same entering-columns roll (their lane-0 value IS the per-step
    fill), and row/rc extraction is a single lane-gather at the target
    lane (take_along_axis -> tpu.dynamic_gather) instead of a
    where+sum over 128 lanes.

Mosaic rules honored (probed on hardware, scripts/mosaic_repro.py):
dynamic lane slices only at 128-multiples (all dynamic rolls happen once
per chunk program, on tiles selected by scalar-prefetch-driven
index_maps); all ref reads at loop depth 1; emissions flushed with
static full-block stores; the DP carry crosses chunk programs in VMEM
scratch (grid iterates c innermost, re-initialized at c == 0).

Score-only mode (the genome-mapping hot loop).  Traceback runs on the
lax.scan engine (dp_spliced_scan) — mapping calls are heavily
score-only, and full trace planes would blow VMEM.

Results are bit-identical to the scan engine / scalar oracle; tests
assert this on a CPU interpret-mode run and on chip.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import DpParams, NEVSEL
from .dp_spliced_scan import BatchProblem, _pads, _win_update, NCAND

NEV = np.int32(NEVSEL)
CHUNK = int(os.environ.get("SPALN_PALLAS_CHUNK", 256))  # steps/program
GRP = int(os.environ.get("SPALN_PALLAS_GRP", 16))       # problems/program
UNROLL = int(os.environ.get("SPALN_PALLAS_UNROLL", 2))   # loop unroll
# the step loop runs CHUNK // UNROLL iterations; a non-divisible override
# would silently skip the last CHUNK % UNROLL steps of every chunk
assert CHUNK % UNROLL == 0, "SPALN_PALLAS_CHUNK must divide by UNROLL"
LT = 128                         # left guard tile in the operand stack
PHEAD = 128                      # direct-gather head of the ipen table
MAX_NBROW = 64                   # boundary-bitmask row cap (ipen_tiles)


def compress_classes(qprof_all, rb_code) -> tuple:
    """Compress the 17-letter substitution one-hot to the genome classes
    present in this batch (bit-exact: qprof columns are subset and
    rb_code recoded to class ids).  Returns (qprof_cls (B, Mpad, C),
    code_cls (B, NB) int32, C)."""
    code = np.asarray(rb_code)
    classes = np.unique(code)
    remap = np.zeros(int(classes.max()) + 1, dtype=np.int32)
    for ci, v in enumerate(classes):
        remap[v] = ci
    code_cls = remap[code]
    qprof = np.asarray(qprof_all)                # (B, Mpad, 17)
    ncol = qprof.shape[2]
    cls_cols = np.clip(classes, 0, ncol - 1)
    qprof_cls = qprof[:, :, cls_cols]            # (B, Mpad, C)
    return qprof_cls, code_cls, len(classes)


def dense_ipen(ipen_key, nmax: int) -> np.ndarray:
    """Reconstruct the dense penalty table the scan engine's select
    chain evaluates (value runs -> per-length values, 0..nmax)."""
    tab = np.full(nmax + 1, NEVSEL // 2, dtype=np.int32)
    for b, v in ipen_key:
        if b <= nmax:
            tab[b:] = v
    return tab


def ipen_tiles(ipen_key, nmax: int) -> tuple:
    """Head row + boundary bitmask rows for the carried-penalty scheme.

    Returns (head (GRP,128) int32, bits (nbrow*GRP, 128) int32, nbrow).
    Raises ValueError when the table's deltas beyond PHEAD leave {0,-1}
    (caller falls back to the scan engine)."""
    tab = dense_ipen(ipen_key, max(nmax, PHEAD))
    d = np.diff(tab.astype(np.int64))
    bad = np.nonzero((d != 0) & (d != -1))[0] + 1
    if len(bad) and bad.max() >= PHEAD:
        raise ValueError("intron penalty deltas outside {0,-1} beyond "
                         f"head (n={int(bad.max())})")
    head = np.broadcast_to(tab[:PHEAD], (GRP, PHEAD)).astype(np.int32)
    pmax = -(-(nmax + 2) // 4096) * 4096
    # the kernel selects a bitmask row with an unrolled nbrow-1 compare
    # chain per candidate per step and keeps all rows in VMEM; a huge
    # window would reintroduce exactly the select-chain cost the carried
    # penalty removed — beyond this bound the scan engine is faster
    if pmax // 4096 > MAX_NBROW:
        raise ValueError(f"window too long for the boundary bitmask "
                         f"({pmax // 4096} rows > {MAX_NBROW})")
    isb = np.zeros(pmax, dtype=np.int64)
    isb[1:len(tab)] = -d                          # 1 where the value drops
    words = np.zeros(pmax // 32, dtype=np.int64)
    idx = np.nonzero(isb)[0]
    np.bitwise_or.at(words, idx >> 5, 1 << (idx & 31))
    words = words.astype(np.uint32).view(np.int32)
    nbrow = pmax // 4096
    bits = np.zeros((nbrow * GRP, 128), np.int32)
    for r in range(nbrow):
        bits[r * GRP:(r + 1) * GRP] = np.broadcast_to(
            words[r * 128:(r + 1) * 128], (GRP, 128))
    return np.ascontiguousarray(head), bits, nbrow


@functools.partial(jax.jit, static_argnames=("nbs", "pade"))
def _build_stack_device(code8, don8, acc8, sig16, accb16, d5c8, j416,
                        nbs, pade):
    """Stack every sliding genome-side operand into group-major tiles
    (nblk*NBT, SOP*GRP, 128) int32, on device, bit-packed:
      word 0: code | isdon<<5 | isacc<<6 | d5cls<<7
      word 1: sig5 (low 16, signed) | accb<<16
      word 2+: joint4 class pairs (low/high 16)
    Stack column LT + j = operand column j; rows read at base-1 by the
    step are pre-shifted so every row shares the window position.
    Also returns the column-REVERSED stack (same tiling) feeding the
    per-chunk entering-columns tile.  Operands arrive downcast
    (int8/int16) to keep the transfer small."""
    B, NB = code8.shape
    ncls = j416.shape[2]

    def shift1(a):
        return jnp.pad(a[:, :-1], ((0, 0), (1, 0)))

    def lo16(a):
        return a.astype(jnp.int32) & 0xffff

    w0 = (code8.astype(jnp.int32)
          | (shift1(don8).astype(jnp.int32) << 5)
          | (shift1(acc8).astype(jnp.int32) << 6)
          | (shift1(d5c8).astype(jnp.int32) << 7))
    w1 = (lo16(shift1(sig16))
          | (shift1(accb16).astype(jnp.int32) << 16))
    rows = [w0, w1]
    for c in range(0, ncls, 2):
        lo = lo16(shift1(j416[:, :, c]))
        hi = (shift1(j416[:, :, c + 1]).astype(jnp.int32) << 16
              if c + 1 < ncls else jnp.zeros_like(lo))
        rows.append(lo | hi)
    sop = len(rows)
    stk = jnp.stack(rows, 0)                     # (SOP, B, NB)
    stk = jnp.pad(stk, ((0, 0), (0, 0), (LT, nbs - LT - NB)))
    nbt = nbs // 128
    nblk = B // GRP

    def tile(x):
        x = x.reshape(sop, nblk, GRP, nbt, 128)
        return x.transpose(1, 3, 0, 2, 4).reshape(nblk * nbt, sop * GRP,
                                                  128)

    # flat column-reversed copy, padded so any Tpad-long entering-column
    # slice is in range (pad regions decode to inert operands and the
    # corresponding lanes are inactive-masked in the kernel)
    rflat = jnp.pad(stk[:, :, ::-1], ((0, 0), (0, 0), (pade, pade)))
    return tile(stk), rflat


def _make_kernel(L, W, T, gop, gep, llmt, ncls, nclass, sop, nbs, nbrow,
                 interpret, emit_links=False, emit_trace=False,
                 dagp=False, lgop=0, lgep=0):
    """The Pallas kernel body: one CHUNK-step block of one slab sweep.

    emit_links: the multi-intermediate UDH forward (fwd2s1_simd.h mode
    table role, 221-229; link packing 334-347): every state additionally
    carries the packed (column * 8 + state) crossing link at the previous
    slab boundary, links ride the same selects as the values, and four
    extra emission streams (boundary-H/F, final-row, right-column links)
    feed the host backwalk (dp_spliced_udh).  Bit-identical to the scan
    engine's emit_links mode by construction.

    emit_trace: the full-plane traceback forward (forward+Vmf mode of
    the reference's table): per-step flags (winner state + gap-open
    bits) and per-state junction planes stream to HBM as extra outputs;
    the host traceback walks them exactly like the scan engine's."""
    assert not (emit_links and emit_trace)
    assert not (emit_links and dagp), \
        "UDH-links + double affine rides the scan engine"
    _ablate = os.environ.get("SPALN_PALLAS_ABLATE", "")  # timing probes
    Tpad = -(-T // CHUNK) * CHUNK
    n_chunks = Tpad // CHUNK
    nstate = 5 if dagp else 3            # H / E1 / F [/ E2 / F2]
    # GOP[k//2] of the scan engine, pre-indexed by k (aln.h hf order)
    GOPk = (0, 0, gop, gop, lgop) if dagp else (0, 0, gop)
    PSPB = (4, 1, 8, 2, 16)              # psp bits (aln.h:56-59)
    # candidate metadata packs (n << MSH) | (k << 2) | d5cls; 5 states
    # need 3 bits for k
    MSH = 5 if dagp else 4
    KM = 7 if dagp else 3
    NST = ((7 if dagp else 5) + 3 * NCAND
           + ((4 + NCAND) if emit_links else 0))
    NEM = 8 if emit_links else (5 if dagp else 4)   # emission planes
    NF = 4 if dagp else 3                # lane-0 fill rows
    nbt = nbs // 128
    SG = sop * GRP
    roll = ((lambda x, s, a: jnp.roll(x, s, a)) if interpret
            else pltpu.roll)

    def gather_lane(x, idx):
        """out[i,j] = x[i, idx[i,j]] (tpu.dynamic_gather along lanes)."""
        return jnp.take_along_axis(x, idx, axis=1)

    def kernel(sca_ref,
               dl_ref, nb_ref, mb_ref, econst_ref, colm_ref, colm1_ref,
               qp_ref,                           # (nclass, GRP, L)
               wta_ref, wtb_ref,                 # (1, SG, 128) w-init
               iph_ref,                          # (GRP, 128) ipen head
               ipb_ref,                          # (nbrow*GRP, 128) bits
               ecs_ref,                          # (1,1,CHUNK,SG) ops
               fcs_ref,                          # (1,1,CHUNK,NF*GRP)
               em_out,                           # (NEM, GRP, CHUNK) block
               *refs):                           # [fl,spj outs,] scratch
        if emit_trace:
            fl_out, spj_out, st_ref = refs       # planes + scratch
        else:
            st_ref, = refs
        c = pl.program_id(1)
        m0 = sca_ref[0]
        lw0 = sca_ref[1]
        base0 = sca_ref[2]        # pad2 + Npad - (m0 + lw0 + 1)
        a_exgr = sca_ref[4]

        lanes = jax.lax.broadcasted_iota(jnp.int32, (GRP, L), 1)
        dl = dl_ref[:]
        Nb = nb_ref[:]
        Mb = mb_ref[:]
        e_const = econst_ref[:]
        col_m = colm_ref[:]
        col_m1 = colm1_ref[:]
        dln = dl - lanes                         # step-invariant
        mrow = m0 + lanes
        m_ok = (mrow >= 1) & (mrow <= Mb)
        li = jnp.clip(Mb - m0, 0, L - 1)
        internal_m = (mrow < Mb) | (a_exgr == 0)
        negv = jnp.full((GRP, L), NEV)
        zero = jnp.zeros((GRP, L), jnp.int32)
        enegv = jnp.full((GRP, CHUNK), NEV)      # emission accumulators
        elanes = jax.lax.broadcasted_iota(jnp.int32, (GRP, CHUNK), 1)
        qp = [qp_ref[k] for k in range(nclass)]
        iph = iph_ref[:]
        ipb = [ipb_ref[r * GRP:(r + 1) * GRP] for r in range(nbrow)]

        # ---- per-chunk window init: the original 2-tile concat + one
        # dynamic roll, at t = c*CHUNK only (Mosaic-legal: outer-dim
        # dynamic tile choice happens in the index_maps)
        t0c = c * CHUNK
        bq = jnp.clip(base0 - t0c + LT, 0, nbs - 256)
        r0 = bq - (bq // 128) * 128
        wwide = jnp.concatenate([wta_ref[0], wtb_ref[0]], axis=1)
        w_init = roll(wwide, -r0, 1)[:, :L]      # (SG, L)


        # ---- DP carry: scratch planes, re-initialized at chunk 0
        fresh = c == 0
        st = st_ref[:]

        def ld(k, init):
            return jnp.where(fresh, init, st[k])

        h1 = ld(0, negv)
        h2 = ld(1, negv)
        f1 = ld(2, negv)
        e1 = ld(3, negv)
        psp = ld(4, zero)
        nfix = 5
        if dagp:
            f2 = ld(5, negv)
            e2 = ld(6, negv)
            nfix = 7
        else:
            f2 = e2 = None
        cvs = [ld(nfix + l, negv) for l in range(NCAND)]
        cms = [ld(nfix + NCAND + l, zero)
               for l in range(NCAND)]              # cj<<MSH|k<<2|c5
        cps = [ld(nfix + 2 * NCAND + l, zero) for l in range(NCAND)]
        if emit_links:
            base = nfix + 3 * NCAND
            lk = [ld(base + j, zero) for j in range(4)]  # h1/h2/f/e links
            lkc = [ld(base + 4 + l, zero) for l in range(NCAND)]
        else:
            lk, lkc = None, None

        def shift_right(x, fill):
            y = jnp.roll(x, 1, 1) if interpret else pltpu.roll(x, 1, 1)
            return jnp.where(lanes == 0, fill, y)

        def step(t2, ecol, fcol, carry):
            f2 = e2 = None
            if emit_links:
                (h1, h2, f1, e1, psp, cvs, cms, cps, lk, lkc, w,
                 em) = carry
                lkh1, lkh2, lkf, lke = lk
            elif dagp:
                (h1, h2, f1, e1, f2, e2, psp, cvs, cms, cps, w,
                 em) = carry
            else:
                (h1, h2, f1, e1, psp, cvs, cms, cps, w,
                 em) = carry
            t = t0c + t2
            sc = m0 + lw0 + 1 + t
            n = sc + dln
            r_off = t - 2 * lanes
            active = ((r_off >= 0) & (r_off < W) & (n >= 1) & (n <= Nb)
                      & m_ok)
            first = r_off == 0

            # ---- unpack the carried window
            w0 = w[0:GRP]
            w1 = w[GRP:2 * GRP]
            b_code = w0 & 31
            isdon = (w0 & 32) != 0
            isacc = (w0 & 64) != 0
            d5cls = (w0 >> 7) & 3
            sig5 = (w1 << 16) >> 16
            accb = w1 >> 16
            j4 = []
            for cc in range(ncls):
                wj = w[(2 + cc // 2) * GRP:(3 + cc // 2) * GRP]
                j4.append((wj << 16) >> 16 if cc % 2 == 0 else wj >> 16)

            score = jnp.zeros((GRP, L), jnp.int32)
            if _ablate == "noscore":
                score = score + b_code + qp[0]
            else:
                for k in range(nclass):
                    score = score + jnp.where(b_code == k, qp[k], 0)

            # ---- slab-boundary fills: lane 0 of the rolled tile
            fv = fcol.reshape(NF, GRP, 1)
            up_h = shift_right(h1, fv[1])
            up_f = shift_right(f1, fv[2])
            diag_h = shift_right(h2, fv[0])
            up_f2 = shift_right(f2, fv[3]) if dagp else None
            if emit_links:
                # lane-0 sources sit ON the intermediate row: their link
                # is their own (column, state) — pack_link(n0, st)
                n0c = sc + dl[:, :1]
                lk_up_h = shift_right(lkh1, n0c << 3)
                lk_up_f = shift_right(lkf, (n0c << 3) | 2)
                lk_diag = shift_right(lkh2, (n0c - 1) << 3)

            if _ablate == "noedge":   # timing probe: skip edge logic
                left_h = h1
                lk_left = lkh1 if emit_links else None
            else:
                edge = first & (n != 1)
                left_h = jnp.where(n == 1, col_m,
                                   jnp.where(edge, e_const,
                                             jnp.where(first, NEV, h1)))
                diag_h = jnp.where(n == 1, col_m1, diag_h)
                at_top = r_off >= W - 1
                up_h = jnp.where(at_top, NEV, up_h)
                up_f = jnp.where(at_top, NEV, up_f)
                e1 = jnp.where(first, NEV, e1)
                psp = jnp.where(first, 0, psp)
                cvs = [jnp.where(first, NEV, cc) for cc in cvs]
                cms = [jnp.where(first, 0, cc) for cc in cms]
                if dagp:
                    up_f2 = jnp.where(at_top, NEV, up_f2)
                    e2 = jnp.where(first, NEV, e2)
                if emit_links:
                    # column-0 / band-edge init cells descend from col 0
                    lk_left = jnp.where((n == 1) | edge, 0, lkh1)
                    lk_diag = jnp.where(n == 1, 0, lk_diag)

            # ---- recurrence (order = fwd2s1.cc:276-431)
            h_val = diag_h + score
            mx_val, mx_k = h_val, zero
            if emit_links:
                lk_mx = lk_diag
            xo = up_h + gop
            f_open = xo >= up_f
            f_val = jnp.where(f_open, xo, up_f) + gep
            gt = f_val > mx_val
            mx_val = jnp.where(gt, f_val, mx_val)
            mx_k = jnp.where(gt, 2, mx_k)
            if emit_links:
                lkf = jnp.where(f_open, lk_up_h, lk_up_f)
                lk_mx = jnp.where(gt, lkf, lk_mx)
            # Vertical2 (F2, long gap, -yl3): strict > into the max
            f2_open = f2_val = None
            if dagp:
                xo = up_h + lgop
                f2_open = xo >= up_f2
                f2_val = jnp.where(f2_open, xo, up_f2) + lgep
                gt = f2_val > mx_val
                mx_val = jnp.where(gt, f2_val, mx_val)
                mx_k = jnp.where(gt, 4, mx_k)
            prev_psp = psp
            xo = left_h + gop
            e_open = xo >= e1
            e_val = jnp.where(e_open, xo, e1) + gep
            psp = jnp.where(e_open, jnp.where(prev_psp != 0, 1, 0),
                            prev_psp & 1)
            ge = e_val >= mx_val
            mx_val = jnp.where(ge, e_val, mx_val)
            mx_k = jnp.where(ge, 1, mx_k)
            if emit_links:
                lke = jnp.where(e_open, lk_left, lke)
                lk_mx = jnp.where(ge, lke, lk_mx)
                lk_states = [lk_diag, lke, lkf]
            # Horizontal2 (E2, long gap)
            e2_open = e2_val = None
            if dagp:
                xo = left_h + lgop
                e2_open = xo >= e2
                e2_val = jnp.where(e2_open, xo, e2) + lgep
                psp = jnp.where(e2_open,
                                jnp.where(prev_psp != 0, psp | 2, psp),
                                psp | (prev_psp & 2))
                ge = e2_val >= mx_val
                mx_val = jnp.where(ge, e2_val, mx_val)
                mx_k = jnp.where(ge, 3, mx_k)

            # ---- carried intron penalty (exact table; see module doc)
            ncp = []
            for l in range(NCAND):
                ilen = n - (cms[l] >> MSH)
                if _ablate == "noipen":
                    ncp.append(cps[l])
                    continue
                il = jnp.clip(ilen, 0, nbrow * 4096 - 1)
                wq = il >> 5
                lo = wq & 127
                brow = ipb[0]
                for rr_ in range(1, nbrow):
                    brow = jnp.where((wq >> 7) == rr_, ipb[rr_], brow)
                bits = gather_lane(brow, lo)
                isb = (jax.lax.shift_right_logical(bits, il & 31)) & 1
                penh = gather_lane(iph, il & (PHEAD - 1))
                pen = jnp.where(il < PHEAD, penh, cps[l] - isb)
                ncp.append(pen)
            cps = ncp

            # ---- acceptor close (fwd2s1.cc:333-354)
            acc_ok = isacc & internal_m & active & (n < Nb)
            if _ablate == "noclose":
                acc_ok = acc_ok & False
            state_vals = [h_val, e_val, f_val, e2_val, f2_val][:nstate]
            xcs, oks = [], []
            for l in range(NCAND):
                ilen = n - (cms[l] >> MSH)
                jv = zero
                for cc in range(ncls):
                    jv = jv + jnp.where((cms[l] & 3) == cc, j4[cc], 0)
                ok = acc_ok & (ilen >= llmt) & (cvs[l] > NEV // 2)
                xcs.append(jnp.where(ok, cvs[l] + cps[l] + accb + jv,
                                     NEV))
                oks.append(ok)
            spj = []
            for k in range(nstate):
                cur = state_vals[k]
                closed = jnp.zeros((GRP, L), bool)
                jnc_k = zero
                for l in range(NCAND):
                    take = (((cms[l] >> 2) & KM) == k) & \
                        (xcs[l] >= cur) & oks[l]
                    cur = jnp.where(take, xcs[l], cur)
                    closed = closed | take
                    if emit_links:
                        lk_states[k] = jnp.where(take, lkc[l],
                                                 lk_states[k])
                    if emit_trace:
                        jnc_k = jnp.where(take, (cms[l] >> MSH) + 1,
                                          jnc_k)
                state_vals[k] = cur
                spj.append(jnc_k)
                psp = jnp.where(closed, psp | PSPB[k], psp)
                ge = closed & (cur >= mx_val)
                mx_val = jnp.where(ge, cur, mx_val)
                mx_k = jnp.where(ge, k, mx_k)
                if emit_links:
                    lk_mx = jnp.where(ge, lk_states[k], lk_mx)
            h_out = mx_val
            hdir = mx_k

            # ---- donor push (fwd2s1.cc:380-406)
            don_ok = isdon & internal_m & active & (n < Nb)
            if _ablate == "nopush":
                don_ok = don_ok & False
            for k in range(nstate):
                fvk = state_vals[k]
                elig = don_ok if k else (don_ok & (mx_k == 0))
                elig = elig & ((psp & PSPB[k]) == 0)
                z = mx_val + jnp.where(
                    (mx_k == 0) | (((k - mx_k) % 2) != 0), GOPk[k], 0)
                elig = elig & ~((k != mx_k) & (fvk <= z))
                x = fvk + sig5
                pos = ((cvs[0] >= x).astype(jnp.int32)
                       + (cvs[1] >= x) + (cvs[2] >= x) + (cvs[3] >= x))
                meta = (n << MSH) | (k << 2) | d5cls
                ncv, ncm, ncp, ncl = [], [], [], []
                for j in range(NCAND):
                    ins = (pos == j) & elig
                    shf = (pos < j) & elig
                    pj = j - 1 if j else 0
                    ncv.append(jnp.where(ins, x,
                                         jnp.where(shf, cvs[pj], cvs[j])))
                    ncm.append(jnp.where(ins, meta,
                                         jnp.where(shf, cms[pj], cms[j])))
                    ncp.append(jnp.where(ins, zero,
                                         jnp.where(shf, cps[pj],
                                                   cps[j])))
                    if emit_links:
                        ncl.append(jnp.where(ins, lk_states[k],
                                             jnp.where(shf, lkc[pj],
                                                       lkc[j])))
                cvs, cms, cps = ncv, ncm, ncp
                if emit_links:
                    lkc = ncl

            h_out = jnp.where(active, h_out, NEV)
            f_out = jnp.where(active, state_vals[2], NEV)
            e1 = jnp.where(active, state_vals[1], e1)
            if dagp:
                f2_out = jnp.where(active, state_vals[4], NEV)
                e2 = jnp.where(active, state_vals[3], e2)

            # ---- emissions into lane t2 (one shared mask; row/rc are
            # single lane-gathers, not masked cross-lane reductions)
            if emit_links:
                lkh_c = jnp.where(active, lk_mx, 0)
            if _ablate == "noemit":
                pass
            else:
                lane_sel = elanes == t2
                ebh, ebf, erow, erc = em[:4]
                ebh = jnp.where(lane_sel, h_out[:, L - 1:L], ebh)
                ebf = jnp.where(lane_sel, f_out[:, L - 1:L], ebf)
                row_v = gather_lane(h_out, li)[:, :1]
                rcl = jnp.clip(sc + dl - Nb, 0, L - 1)
                rc_v = gather_lane(h_out, rcl)[:, :1]
                erow = jnp.where(lane_sel, row_v, erow)
                erc = jnp.where(lane_sel, rc_v, erc)
                em4 = (ebh, ebf, erow, erc)
                if dagp:
                    ebf2 = em[4]
                    ebf2 = jnp.where(lane_sel, f2_out[:, L - 1:L], ebf2)
                    em4 = em4 + (ebf2,)
                if emit_links:
                    lbh, lbf, lrow, lrc = em[4:]
                    lbh = jnp.where(lane_sel, lkh_c[:, L - 1:L], lbh)
                    lbf = jnp.where(lane_sel, lk_states[2][:, L - 1:L],
                                    lbf)
                    lrow_v = gather_lane(lkh_c, li)[:, :1]
                    lrc_v = gather_lane(lkh_c, rcl)[:, :1]
                    lrow = jnp.where(lane_sel, lrow_v, lrow)
                    lrc = jnp.where(lane_sel, lrc_v, lrc)
                    em = em4 + (lbh, lbf, lrow, lrc)
                else:
                    em = em4

            # ---- slide the window (entering column at lane 0)
            wsh = jnp.roll(w, 1, 1) if interpret else pltpu.roll(w, 1, 1)
            w = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (SG, L), 1) == 0,
                ecol, wsh)

            if emit_links:
                lk_new = (lkh_c, lkh1, lk_states[2], lk_states[1])
                return (h_out, h1, f_out, e1, psp, cvs, cms, cps,
                        lk_new, lkc, w, em)
            if dagp:
                carry_out = (h_out, h1, f_out, e1, f2_out, e2, psp,
                             cvs, cms, cps, w, em)
            else:
                carry_out = (h_out, h1, f_out, e1, psp, cvs, cms, cps,
                             w, em)
            if emit_trace:
                # flag layout matches the scan engine: bits 0-2 winner
                # state, 3 eopen, 4 fopen, 5 e2open, 6 f2open; 255 =
                # inactive cell
                flags = (hdir | (e_open.astype(jnp.int32) << 3)
                         | (f_open.astype(jnp.int32) << 4))
                if dagp:
                    flags = (flags | (e2_open.astype(jnp.int32) << 5)
                             | (f2_open.astype(jnp.int32) << 6))
                flags = jnp.where(active, flags, 255)
                return carry_out, (flags, spj)
            return carry_out

        em0 = (enegv,) * NEM
        if emit_links:
            carry0 = (h1, h2, f1, e1, psp, cvs, cms, cps,
                      tuple(lk), lkc, w_init, em0)
        elif dagp:
            carry0 = (h1, h2, f1, e1, f2, e2, psp, cvs, cms, cps,
                      w_init, em0)
        else:
            carry0 = (h1, h2, f1, e1, psp, cvs, cms, cps, w_init, em0)

        def step_n(u, carry):
            # manual unroll (pallas fori_loop supports only unroll=1 or
            # full): widens the VLIW scheduling window AND amortizes the
            # entering-columns read — one dynamic-sublane block read +
            # one lane->sublane relayout serves UNROLL steps
            t2u = u * UNROLL
            rse = ecs_ref[0, 0, pl.ds(t2u, UNROLL)]    # (UNROLL, SG)
            rsf = fcs_ref[0, 0, pl.ds(t2u, UNROLL)]    # (UNROLL, NF*GRP)
            if UNROLL > 1:
                ce = rse.reshape(UNROLL, SG).T
                cf = rsf.reshape(UNROLL, NF * GRP).T
            else:
                ce = rse.reshape(SG, 1)
                cf = rsf.reshape(NF * GRP, 1)
            fls, spjs = [], []
            for d in range(UNROLL):
                out = step(t2u + d, ce[:, d:d + 1], cf[:, d:d + 1],
                           carry)
                if emit_trace:
                    carry, (flags, spj) = out
                    fls.append(flags)
                    spjs.append(spj)
                else:
                    carry = out
            if emit_trace:
                # UNROLL consecutive trace planes stored as one block
                fl_out[pl.ds(t2u, UNROLL)] = jnp.stack(fls, 0)
                for k in range(nstate):
                    spj_out[k, pl.ds(t2u, UNROLL)] = jnp.stack(
                        [s_[k] for s_ in spjs], 0)
            return carry

        out = jax.lax.fori_loop(0, CHUNK // UNROLL, step_n, carry0)
        f2 = e2 = None
        if emit_links:
            (h1, h2, f1, e1, psp, cvs, cms, cps, lk, lkc, _w,
             em) = out
        elif dagp:
            (h1, h2, f1, e1, f2, e2, psp, cvs, cms, cps, _w,
             em) = out
        else:
            (h1, h2, f1, e1, psp, cvs, cms, cps, _w,
             em) = out

        st_ref[0] = h1
        st_ref[1] = h2
        st_ref[2] = f1
        st_ref[3] = e1
        st_ref[4] = psp
        nfix = 5
        if dagp:
            st_ref[5] = f2
            st_ref[6] = e2
            nfix = 7
        for l in range(NCAND):
            st_ref[nfix + l] = cvs[l]
            st_ref[nfix + NCAND + l] = cms[l]
            st_ref[nfix + 2 * NCAND + l] = cps[l]
        if emit_links:
            base = nfix + 3 * NCAND
            for j in range(4):
                st_ref[base + j] = lk[j]
            for l in range(NCAND):
                st_ref[base + 4 + l] = lkc[l]
        em_out[:] = jnp.stack(em, axis=0)

    return kernel, Tpad, n_chunks, NST, NEM


@functools.lru_cache(maxsize=64)
def _slab_call(B, L, W, T, gop, gep, llmt, ncls, nclass, sop, nbt, nbrow,
               interpret=False, emit_links=False, emit_trace=False,
               dagp=False, lgop=0, lgep=0):
    """Jitted pallas_call for one static geometry."""
    nbs = nbt * 128
    kernel, Tpad, n_chunks, NST, NEM = _make_kernel(
        L, W, T, gop, gep, llmt, ncls, nclass, sop, nbs, nbrow,
        interpret, emit_links=emit_links, emit_trace=emit_trace,
        dagp=dagp, lgop=lgop, lgep=lgep)
    nblk = B // GRP
    SG = sop * GRP
    sop_c = sop
    nstate = 5 if dagp else 3
    NF = 4 if dagp else 3

    def bspec(*shape):
        return pl.BlockSpec((GRP,) + shape,
                            lambda i, c, s: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # window-init tiles: stack blocks q(c) and q(c)+1 where
    # q(c) = clip(base0 - c*CHUNK + LT, 0, nbs-256) // 128 of group i
    def wtile(d):
        def imap(i, c, s):
            bq = jnp.clip(s[2] - c * CHUNK + LT, 0, nbs - 256)
            return (i * nbt + bq // 128 + d, 0, 0)
        return pl.BlockSpec((1, SG, 128), imap, memory_space=pltpu.VMEM)

    in_specs = [
        bspec(L), bspec(L), bspec(L), bspec(L), bspec(L), bspec(L),
        pl.BlockSpec((nclass, GRP, L), lambda i, c, s: (0, i, 0),
                     memory_space=pltpu.VMEM),
        wtile(0), wtile(1),
        pl.BlockSpec((GRP, 128), lambda i, c, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, CHUNK, SG),
                     lambda i, c, s: (i, c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, CHUNK, NF * GRP),
                     lambda i, c, s: (i, c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    em_spec = pl.BlockSpec((NEM, GRP, CHUNK), lambda i, c, s: (0, i, c),
                           memory_space=pltpu.VMEM)
    em_shape = jax.ShapeDtypeStruct((NEM, B, Tpad), jnp.int32)
    if emit_trace:
        out_specs = [
            em_spec,
            pl.BlockSpec((CHUNK, GRP, L), lambda i, c, s: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nstate, CHUNK, GRP, L),
                         lambda i, c, s: (0, c, i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            em_shape,
            jax.ShapeDtypeStruct((Tpad, B, L), jnp.int32),
            jax.ShapeDtypeStruct((nstate, Tpad, B, L), jnp.int32),
        ]
    else:
        out_specs, out_shape = em_spec, em_shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((NST, GRP, L), jnp.int32)],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
    )

    def slab_step(sca, dl, nb, mb, ec, colm, colm1, qp_slab, stk, rflat,
                  iph, ipb, r0s, n0_base, ns, bnd_h, bnd_f, bnd_f2,
                  row_h, rc_h,
                  wstart, cb0, cr0, cc0, wl, wr, wc, PBn, PBm):
        # boundary fill streams: diag / up_h / up_f [/ up_f2], chunked
        ts = jnp.arange(Tpad, dtype=jnp.int32)
        n0t = n0_base[:, None] + ts[None, :]     # (B, Tpad)
        oku = n0t <= ns[:, None] + 1
        okd = (n0t - 1) <= ns[:, None]
        Bfull = bnd_h.shape[0]
        wh = jax.lax.dynamic_slice(bnd_h, (0, wstart), (Bfull, Tpad + 1))
        wf = jax.lax.dynamic_slice(bnd_f, (0, wstart), (Bfull, Tpad + 1))
        diag = jnp.where(okd, wh[:, :Tpad], NEV)
        uph = jnp.where(oku, wh[:, 1:], NEV)
        upf = jnp.where(oku, wf[:, 1:], NEV)
        frows = [diag, uph, upf]
        if dagp:
            wf2 = jax.lax.dynamic_slice(bnd_f2, (0, wstart),
                                        (Bfull, Tpad + 1))
            frows.append(jnp.where(oku, wf2[:, 1:], NEV))
        fills = jnp.stack(frows, 0)              # (NF, B, Tpad)

        # time-major entering-columns + fills block (see kernel doc):
        # ecs[i, c, u, :SG] = reversed-stack column r0s + c*CHUNK + u of
        # group i; ecs[i, c, u, SG:] = this step's boundary fills
        ecs_ops = jax.lax.dynamic_slice(
            rflat, (0, 0, r0s), (sop_c, Bfull, Tpad))
        ops_p = ecs_ops.reshape(sop_c, nblk, GRP, n_chunks,
                                CHUNK).transpose(1, 3, 4, 0, 2)
        ops_p = ops_p.reshape(nblk, n_chunks, CHUNK, SG)
        fl_p = fills.reshape(NF, nblk, GRP, n_chunks,
                             CHUNK).transpose(1, 3, 4, 0, 2)
        fl_p = fl_p.reshape(nblk, n_chunks, CHUNK, NF * GRP)

        out = call(
            sca, dl, nb, mb, ec, colm, colm1, qp_slab,
            stk, stk, iph, ipb, ops_p, fl_p)
        if emit_trace:
            em, fl_pl, spj_pl = out
        else:
            em, fl_pl, spj_pl = out, None, None
        bh_v, bf_v, row_v, rc_v = em[0], em[1], em[2], em[3]
        bnd_h = _win_update(bnd_h, bh_v, wl, cb0, PBn)
        bnd_f = _win_update(bnd_f, bf_v, wl, cb0, PBn)
        if dagp:
            bnd_f2 = _win_update(bnd_f2, em[4], wl, cb0, PBn)
        row_h = _win_update(row_h, row_v, wr, cr0, PBn)
        rc_h = _win_update(rc_h, rc_v, wc, cc0, PBm)
        if emit_links:
            # raw per-step link streams (B, Tpad): boundary-H/F,
            # final-row, right-column — backwalk indexes them by t
            return (bnd_h, bnd_f, bnd_f2, row_h, rc_h,
                    em[4], em[5], em[6], em[7])
        if emit_trace:
            return bnd_h, bnd_f, bnd_f2, row_h, rc_h, fl_pl, spj_pl
        return bnd_h, bnd_f, bnd_f2, row_h, rc_h

    jitted = jax.jit(slab_step)
    jitted.raw = slab_step
    return jitted, Tpad


def _prepare_device(bp: BatchProblem, Bp: int, ipen_key) -> dict:
    """One-time per-batch device preparation, cached on the
    BatchProblem: class-compressed substitution profiles, the group-major
    operand tile stacks (forward + reversed, built on device from
    downcast uploads), intron-penalty head/bitmask tiles, and the
    per-slab constants (band placement scalars, column inits, write-back
    masks).  Alignment calls reuse a batch's prep across engine calls;
    the per-call work is then just the slab sweeps themselves."""
    prep = getattr(bp, "_pallas_prep", None)
    if prep is not None and prep["key"] == (Bp, CHUNK, GRP):
        return prep

    def oph(k):
        h = getattr(bp, "ops_host", None)
        return h[k] if h is not None and k in h else np.asarray(bp.ops[k])

    B, L = bp.B, bp.L
    PBn, TOTn, PBm, TOTm = _pads(L, bp.T, bp.Nmax, bp.Mpad)
    T = bp.T
    Tpad = -(-T // CHUNK) * CHUNK

    def pad_b(x):
        x = np.asarray(x)
        if x.shape[0] == B and Bp != B:
            return np.concatenate(
                [x, np.repeat(x[:1], Bp - B, axis=0)], axis=0)
        return x

    qprof_cls, code_cls, nclass = compress_classes(
        (bp.qprof_host if getattr(bp, "qprof_host", None) is not None
         else np.asarray(bp.qprof_all)), oph("rb_code"))
    NB = code_cls.shape[1]
    nbs = LT + (-(-NB // 128) * 128) + 384
    nbt = nbs // 128
    j4 = pad_b(oph("rb_joint4"))
    for name, arr in (("sig5", oph("rb_sig5")),
                      ("accb", oph("rb_accb")),
                      ("joint4", j4)):
        a = np.asarray(arr)
        assert a.min() >= -32768 and a.max() < 32768, \
            f"rb_{name} exceeds int16 packing range"
    # candidate metadata packs the intron start column as n<<4 into an
    # int32 plane; genome columns >= 2^27 would silently corrupt it
    assert bp.Nmax < (1 << 27), \
        "window too long for packed candidate metadata (n << 4 in int32)"
    sop = 2 + (j4.shape[2] + 1) // 2
    pade = Tpad + 256
    stk_d, rflat_d = _build_stack_device(
        jnp.asarray(pad_b(code_cls).astype(np.int8)),
        jnp.asarray(pad_b(oph("rb_isdon")).astype(np.int8)),
        jnp.asarray(pad_b(oph("rb_isacc")).astype(np.int8)),
        jnp.asarray(pad_b(oph("rb_sig5")).astype(np.int16)),
        jnp.asarray(pad_b(oph("rb_accb")).astype(np.int16)),
        jnp.asarray(pad_b(oph("rb_d5cls")).astype(np.int8)),
        jnp.asarray(j4.astype(np.int16)),
        nbs=nbs, pade=pade)

    iph, ipb, nbrow = ipen_tiles(ipen_key, bp.Nmax + 1)

    deltas = pad_b(np.asarray(bp.deltas, dtype=np.int32))
    Ns = pad_b(np.asarray(bp.Ns, dtype=np.int32))
    Ms = pad_b(np.asarray(bp.Ms, dtype=np.int32))
    ones = np.ones((Bp, L), np.int32)
    colinit = np.asarray(bp.ops_s.get("colinit_host", bp.ops_s["colinit"]))
    lw_arr = bp.lw + deltas
    e_const = np.where(
        lw_arr >= -Ms, colinit[np.clip(-lw_arr, 0, len(colinit) - 1)],
        NEV).astype(np.int32)

    dev = jnp.asarray
    # one stacked upload for the four (Bp, L) broadcast planes: the
    # remote tunnel is round-trip-bound, so transfer COUNT dominates
    # per-bucket device time (probe: ~25 transfers = 0.7-0.85 s/bucket
    # vs 0.18 s dispatch+exec)
    dnme_d = dev(np.stack([deltas[:, None] * ones, Ns[:, None] * ones,
                           Ms[:, None] * ones, e_const[:, None] * ones]))
    prep = {
        "key": (Bp, CHUNK, GRP),
        "Bp": Bp, "nclass": nclass, "sop": sop, "nbt": nbt,
        "nbrow": nbrow,
        "PBn": PBn, "PBm": PBm, "TOTn": TOTn, "TOTm": TOTm,
        "dnme": dnme_d,
        "dl": dnme_d[0], "nb": dnme_d[1], "mb": dnme_d[2],
        "ec": dnme_d[3],
        "ns": dev(Ns.astype(np.int32)),
        "stk": stk_d, "rflat": rflat_d, "pade": pade,
        "iph": dev(iph), "ipb": dev(ipb),
        "qp": dev(np.ascontiguousarray(np.transpose(
            pad_b(qprof_cls), (2, 0, 1)))),
        "bnd_h0": dev(pad_b(bp.bnd_h0_host if getattr(bp, "bnd_h0_host", None) is not None else np.asarray(bp.bnd_h0))),
        "bnd_f0": dev(pad_b(bp.bnd_f0_host if getattr(bp, "bnd_f0_host", None) is not None else np.asarray(bp.bnd_f0))),
        "slabs": [],
    }

    ts = np.arange(Tpad)[None, :]
    dlc = deltas[:, None]
    m_arr = Ms[:, None]
    n_arr = Ns[:, None]
    lw0 = bp.lw
    for s in range(bp.n_slabs):
        m0 = s * L + 1
        base0 = bp.pad2 + bp.Nmax - (m0 + lw0 + 1)
        cb0 = m0 + lw0 + 2 - L
        cr0 = m0 + lw0 + 1 - L
        cc0 = 2 * m0 + lw0 + 1 - bp.Nmax
        wstart = int(np.clip(PBn + m0 + lw0, 0, TOTn - (Tpad + 1)))
        sca = np.asarray(
            [m0, lw0, base0, 0, int(bp.flags.a_exgr), 0, 0, 0],
            np.int32)
        cm = np.clip(m0, 0, bp.Mpad)
        cm1 = np.clip(m0 - 1, 0, bp.Mpad)
        colm_h = np.broadcast_to(colinit[cm:cm + L],
                                 (Bp, L)).astype(np.int32).copy()
        colm1_h = np.broadcast_to(colinit[cm1:cm1 + L],
                                  (Bp, L)).astype(np.int32).copy()
        n0_base = (m0 + lw0 + 1 + deltas).astype(np.int32)

        m_last = m0 + L - 1
        nl = cb0 + dlc + ts
        wl = (((ts - 2 * (L - 1) >= 0) & (ts - 2 * (L - 1) < bp.W))
              & (nl >= 1) & (nl <= n_arr)
              & (m_last >= 1) & (m_last <= m_arr))
        lij = np.clip(m_arr - m0, 0, L - 1)
        in_slab = (m_arr - m0 >= 0) & (m_arr - m0 < L)
        nr = cr0 + dlc + (L - lij) + ts
        wr = (in_slab & (ts - 2 * lij >= 0) & (ts - 2 * lij < bp.W)
              & (nr >= 1) & (nr <= n_arr))
        mc = cc0 + dlc + (bp.Nmax - n_arr) + ts
        rcl = m0 + lw0 + 1 + dlc + ts - n_arr
        wc = ((rcl >= 0) & (rcl < L) & (ts - 2 * rcl >= 0)
              & (ts - 2 * rcl < bp.W) & (mc >= 1) & (mc <= m_arr))
        r0s = int(pade + nbt * 128 - base0 - LT)
        assert 0 <= r0s <= nbt * 128 + 2 * pade - Tpad, (r0s, base0)
        prep["slabs"].append(dict(
            sca_h=sca, colm_h=colm_h, colm1_h=colm1_h, n0b_h=n0_base,
            m0=m0, wstart=wstart, cb0=cb0, cr0=cr0, cc0=cc0,
            r0s=r0s, wl_h=wl, wr_h=wr, wc_h=wc))
    sl = prep["slabs"]
    prep["sca_all"] = dev(np.stack([x["sca_h"] for x in sl]))
    prep["colm_all"] = dev(np.stack([x["colm_h"] for x in sl]))
    prep["colm1_all"] = dev(np.stack([x["colm1_h"] for x in sl]))
    prep["n0b_all"] = dev(np.stack([x["n0b_h"] for x in sl]))
    prep["wl_all"] = dev(np.stack([x["wl_h"] for x in sl]))
    prep["wr_all"] = dev(np.stack([x["wr_h"] for x in sl]))
    prep["wc_all"] = dev(np.stack([x["wc_h"] for x in sl]))
    for x in sl:
        for k in ("sca_h", "colm_h", "colm1_h", "n0b_h", "wl_h",
                  "wr_h", "wc_h"):
            del x[k]
    bp._pallas_prep = prep
    return prep


def run_spliced_batch_pallas(bp: BatchProblem, prm: DpParams,
                             score_only: bool = True, block: bool = True,
                             interpret: bool | None = None,
                             emit_links: bool = False):
    """Device stage on the Pallas kernel; contract and storage layout
    identical to run_spliced_batch (single-affine).

    emit_links: the UDH links forward — returns (row_h, rc_h, traces)
    with traces[s] = ((5 link streams), entry-boundary snapshot), the
    exact contract of run_spliced_batch(emit_links=True), so
    dp_spliced_udh's backwalk + retrace consume it unchanged.

    score_only=False: the full-plane trace forward — traces[s] =
    (flags (T, B, L) uint8, spj (T, B, L, 3) int32), the exact layout
    collect_batch_results builds SliceTraces from."""
    emit_trace = not score_only
    assert not (emit_trace and emit_links)
    assert not (emit_links and prm.dagp), \
        "UDH-links + double affine rides the scan engine"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, L = bp.B, bp.L
    Bp = -(-B // GRP) * GRP
    prep = _prepare_device(bp, Bp, bp.ipen_key)
    PBn, PBm = prep["PBn"], prep["PBm"]

    slab_step, Tpad = _slab_call(
        Bp, L, bp.W, bp.T, prm.gop, prm.gep, prm.intron_llmt, bp.ncls,
        prep["nclass"], prep["sop"], prep["nbt"], prep["nbrow"],
        interpret, emit_links=emit_links, emit_trace=emit_trace,
        dagp=prm.dagp, lgop=prm.lgop, lgep=prm.lgep)

    bnd_h = prep["bnd_h0"]
    bnd_f = prep["bnd_f0"]
    if prm.dagp:
        bnd_f2 = jnp.concatenate(
            [bp.bnd_f20, jnp.full((Bp - B, bp.bnd_f20.shape[1]), NEV)]
        ) if Bp != B else bp.bnd_f20
    else:
        bnd_f2 = bp.bnd_f20               # untouched: single-affine
    row_h = jnp.full((Bp, prep["TOTn"]), NEV)
    rc_h = jnp.full((Bp, prep["TOTm"]), NEV)

    from .dp_spliced_scan import snap_pos
    traces = []
    qp_d = prep["qp"]
    for s, sl in enumerate(prep["slabs"]):
        if emit_links:
            p0 = snap_pos(bp, s)
            snap = (bnd_h[:B, p0:p0 + bp.T + 2],
                    bnd_f[:B, p0:p0 + bp.T + 2],
                    bnd_f2[:B, p0:p0 + bp.T + 2])
        qp_slab = jax.lax.dynamic_slice(
            qp_d, (0, 0, sl["m0"] - 1), (prep["nclass"], Bp, L))
        out = slab_step(
            prep["sca_all"][s], prep["dl"], prep["nb"], prep["mb"],
            prep["ec"], prep["colm_all"][s], prep["colm1_all"][s],
            qp_slab, prep["stk"],
            prep["rflat"], prep["iph"], prep["ipb"], sl["r0s"],
            prep["n0b_all"][s], prep["ns"], bnd_h, bnd_f, bnd_f2, row_h,
            rc_h, sl["wstart"], sl["cb0"], sl["cr0"], sl["cc0"],
            prep["wl_all"][s], prep["wr_all"][s], prep["wc_all"][s],
            PBn, PBm)
        bnd_h, bnd_f, bnd_f2, row_h, rc_h = out[:5]
        if emit_links:
            zf2 = jnp.zeros((B, bp.T), jnp.int32)
            streams = tuple(y[:B, :bp.T] for y in out[5:]) + (zf2,)
            traces.append((streams, snap))
        elif emit_trace:
            fl_pl, spj_pl = out[5], out[6]
            fl = fl_pl[:bp.T, :B].astype(jnp.uint8)
            spj = jnp.transpose(spj_pl, (1, 2, 3, 0))[:bp.T, :B]
            traces.append((fl, spj))

    if Bp != B:
        row_h = row_h[:B]
        rc_h = rc_h[:B]
    if block:
        np.asarray(row_h[:1, :1])
    return row_h, rc_h, (traces if (emit_links or emit_trace) else None)


# ---------------------------------------------------------------- fused
@functools.lru_cache(maxsize=64)
def _fused_call(Bp, B, L, W, T, gop, gep, llmt, ncls, nclass, sop, nbt,
                nbrow, interpret, dagp, lgop, lgep, n_slabs, Nmax, Mpad,
                a_exgl, a_exgr, b_exgl, b_exgr, PBn_, PBm_, IT):
    """One jitted program for a whole geometry bucket: all trace-forward
    slabs + lastS end extraction + the device traceback walk.  On a
    remote-tunnel backend every jitted call pays a fixed dispatch/fetch
    floor (PERF_NOTES.md fact 1); the per-slab launch structure made the
    warm gate's device stage launch-bound (~3 MCUPS effective vs 3.3
    GCUPS kernel, VERDICT r4 weak #2).  Fusing the bucket into a single
    dispatch + a single packed fetch removes that floor."""
    from .dp_spliced_scan import _tb_walker
    slab_jit, Tpad = _slab_call(Bp, L, W, T, gop, gep, llmt, ncls,
                                nclass, sop, nbt, nbrow, interpret,
                                emit_links=False, emit_trace=True,
                                dagp=dagp, lgop=lgop, lgep=lgep)
    body = slab_jit.raw
    NSPJ = 5 if dagp else 3
    walk = _tb_walker(n_slabs, T, B, L, NSPJ, IT).raw
    I32 = jnp.int32

    @jax.jit
    def go(sca_all, colm_all, colm1_all, n0b_all, wl_all, wr_all,
           wc_all, slab_scalars, shared, qp, bnd_h, bnd_f, bnd_f2,
           row_h, rc_h, meta):
        ro_v, co_v, Ms_j, Ns_j, lws_j = (meta[0], meta[1], meta[2],
                                         meta[3], meta[4])
        dnme = shared["dnme"]
        FLs, SPJs = [], []
        for s in range(n_slabs):
            a = slab_scalars[s]
            qp_slab = jax.lax.dynamic_slice(
                qp, (0, 0, a["m0i"]), (nclass, Bp, L))
            out = body(sca_all[s], dnme[0], dnme[1],
                       dnme[2], dnme[3], colm_all[s], colm1_all[s],
                       qp_slab, shared["stk"], shared["rflat"],
                       shared["iph"], shared["ipb"], a["r0s"],
                       n0b_all[s], shared["ns"], bnd_h, bnd_f, bnd_f2,
                       row_h, rc_h, a["wstart"], a["cb0"], a["cr0"],
                       a["cc0"], wl_all[s], wr_all[s], wc_all[s],
                       PBn_, PBm_)
            bnd_h, bnd_f, bnd_f2, row_h, rc_h = out[:5]
            fl_pl, spj_pl = out[5], out[6]
            FLs.append(fl_pl[:T, :B].astype(I32))
            # keep state-major (nstate, T, B, L): transposing the
            # size-3 state dim to the minor position tiles it to 128
            # lanes on TPU (42x memory, OOM on merged wide buckets)
            SPJs.append(spj_pl[:, :T, :B].astype(I32))
        # ---- lastS_ng end extraction (collect_batch_results semantics)
        NEVj = jnp.asarray(NEV, I32)
        iota_n = jnp.arange(Nmax + 2, dtype=I32)
        row_g = jnp.take_along_axis(
            row_h[:B], ro_v[:, None] + iota_n[None, :], axis=1)
        bv = jnp.take_along_axis(row_g, Ns_j[:, None],
                                 axis=1)[:, 0].astype(I32)
        bm = Ms_j.astype(I32)
        bn = Ns_j.astype(I32)

        def col_pen(mm):
            if b_exgl:
                return jnp.zeros_like(mm)
            return (gop + gep * mm).astype(I32)

        if a_exgr:
            n_first = jnp.maximum(Ms_j + lws_j, 0).astype(I32)
            c1 = lws_j >= -Ms_j
            v = jnp.where(c1, col_pen(-lws_j),
                          jnp.where(n_first == 0, col_pen(Ms_j), NEVj))
            upd = v > bv
            bv = jnp.where(upd, v, bv)
            bm = jnp.where(upd, Ms_j.astype(I32), bm)
            bn = jnp.where(upd, jnp.where(c1, n_first, 0), bn)
            n_lo = jnp.maximum(n_first, 1)
            mseg = ((iota_n[None, :] >= n_lo[:, None])
                    & (iota_n[None, :] < Ns_j[:, None]))
            segv = jnp.where(mseg, row_g, NEVj)
            smax = jnp.max(segv, axis=1).astype(I32)
            sarg = jnp.argmax(segv, axis=1).astype(I32)
            upd = smax > bv
            bv = jnp.where(upd, smax, bv)
            bm = jnp.where(upd, Ms_j.astype(I32), bm)
            bn = jnp.where(upd, sarg, bn)
        if b_exgr:
            iota_m = jnp.arange(Mpad + 2, dtype=I32)
            rc_g = jnp.take_along_axis(
                rc_h[:B], co_v[:, None] + iota_m[None, :], axis=1)
            up_v = lws_j + (W - 1)
            corner = jnp.maximum(Ns_j - up_v, 0) == 0
            vc = (jnp.zeros_like(Ns_j) if a_exgl
                  else (gop + gep * Ns_j)).astype(I32)
            v = jnp.where(corner, vc, NEVj)
            upd = v > bv
            bv = jnp.where(upd, v, bv)
            bm = jnp.where(upd, 0, bm)
            bn = jnp.where(upd, Ns_j.astype(I32), bn)
            m_lo = jnp.maximum(Ns_j - up_v, 1)
            mseg = ((iota_m[None, :] >= m_lo[:, None])
                    & (iota_m[None, :] < Ms_j[:, None]))
            segv = jnp.where(mseg, rc_g, NEVj)
            smax = jnp.max(segv, axis=1).astype(I32)
            sarg = jnp.argmax(segv, axis=1).astype(I32)
            upd = smax > bv
            bv = jnp.where(upd, smax, bv)
            bm = jnp.where(upd, sarg, bm)
            bn = jnp.where(upd, Ns_j.astype(I32), bn)
        # ---- device traceback walk
        FL = jnp.reshape(jnp.stack(FLs), (-1,))
        SPJ = jnp.reshape(jnp.stack(SPJs), (-1,))
        recs = walk(FL, SPJ, bm, bn, lws_j.astype(I32))
        packed = jnp.concatenate(
            [jnp.stack([r.astype(I32) for r in recs]).reshape(4 * IT, B),
             bv[None], bm[None], bn[None]], axis=0)
        return packed
    return go


def run_bucket_fused(bp: BatchProblem, prm: DpParams):
    """Fused production path for one bucket: returns (scores, ends,
    ops_all) with exactly the collect_batch_results +
    traceback_device_batch contract, in one device dispatch and one
    packed fetch."""
    from .dp_spliced_scan import _pads, _row_pos, _rc_pos
    B, L = bp.B, bp.L
    Bp = -(-B // GRP) * GRP
    interpret = jax.default_backend() == "cpu"
    prep = _prepare_device(bp, Bp, bp.ipen_key)
    flags = bp.flags
    IT = 2 * (bp.Mpad + bp.W) + 64
    go = _fused_call(Bp, B, L, bp.W, bp.T, prm.gop, prm.gep,
                     prm.intron_llmt, bp.ncls, prep["nclass"],
                     prep["sop"], prep["nbt"], prep["nbrow"], interpret,
                     prm.dagp, prm.lgop, prm.lgep, bp.n_slabs, bp.Nmax,
                     bp.Mpad, flags.a_exgl, flags.a_exgr, flags.b_exgl,
                     flags.b_exgr, prep["PBn"], prep["PBm"], IT)
    slab_args = [dict(r0s=sl["r0s"], wstart=sl["wstart"],
                      cb0=sl["cb0"], cr0=sl["cr0"], cc0=sl["cc0"],
                      m0i=sl["m0"] - 1)
                 for sl in prep["slabs"]]
    shared = dict(dnme=prep["dnme"], stk=prep["stk"],
                  rflat=prep["rflat"], iph=prep["iph"],
                  ipb=prep["ipb"], ns=prep["ns"])
    PB, _, PBm2, _ = _pads(bp.L, bp.T, bp.Nmax, bp.Mpad)
    ro_v = np.array([_row_pos(PB, bp.L, 0, bp.deltas[i],
                              (bp.Ms[i] - 1) % bp.L)
                     for i in range(B)], np.int32)
    co_v = np.array([_rc_pos(PBm2, bp.Nmax, 0, bp.deltas[i], bp.Ns[i])
                     for i in range(B)], np.int32)
    TOTn, TOTm = prep["TOTn"], prep["TOTm"]
    bnd_h = prep["bnd_h0"]
    bnd_f = prep["bnd_f0"]
    if prm.dagp:
        bnd_f2 = jnp.concatenate(
            [bp.bnd_f20, jnp.full((Bp - B, bp.bnd_f20.shape[1]), NEV)]
        ) if Bp != B else bp.bnd_f20
    else:
        bnd_f2 = bp.bnd_f20
    row_h = jnp.full((Bp, TOTn), NEV)
    rc_h = jnp.full((Bp, TOTm), NEV)
    meta = jnp.asarray(np.stack([
        ro_v, co_v, np.asarray(bp.Ms, np.int32),
        np.asarray(bp.Ns, np.int32), np.asarray(bp.lws, np.int32)]))
    packed = np.asarray(go(
        prep["sca_all"], prep["colm_all"], prep["colm1_all"],
        prep["n0b_all"], prep["wl_all"], prep["wr_all"],
        prep["wc_all"], slab_args, shared, prep["qp"], bnd_h, bnd_f,
        bnd_f2, row_h, rc_h, meta))
    k_np = packed[0:IT]
    m_np = packed[IT:2 * IT]
    n_np = packed[2 * IT:3 * IT]
    x_np = packed[3 * IT:4 * IT]
    scores = packed[4 * IT].astype(np.int64)
    ends = [(int(packed[4 * IT + 1, b]), int(packed[4 * IT + 2, b]))
            for b in range(B)]
    ops_all = []
    for b in range(B):
        sel = np.flatnonzero(k_np[:, b])
        ops = []
        for j in sel:
            k = k_np[j, b]
            if k == 4:
                ops.append(('I', int(m_np[j, b]), int(x_np[j, b]),
                            int(n_np[j, b])))
            else:
                ops.append((('D', 'E', 'F')[k - 1], int(m_np[j, b]),
                            int(n_np[j, b])))
        ops.reverse()
        ops_all.append(ops)
    return scores, ends, ops_all
