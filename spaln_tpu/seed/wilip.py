"""Wilber-Lipman HSP search and chaining (vectorized host stage).

The role of Wlp/Wilip (wln.cc:253-996): locate high-scoring seed pairs
between a query and a genomic window, merge them into diagonal runs (HSPs),
chain HSPs with intron-aware gap costs, and hand the DP driver per-chain
genomic bounds + band geometry.

The reference's streaming per-diagonal scanner (scan_b/dmsnno) is re-cast
as whole-array numpy: k-mer match pairs via sorted-word join, run merging
via diagonal grouping, chaining via the same O(h^2) DP with LinkHspScr =
min(intron PenaltyPlus, ordinary GapPenalty) and the <=50% overlap rule
(SURVEY.md A.12).  This stage is tiny compared to the DP and stays on host
(it is also jittable later if profiling says otherwise).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import NT_REDUCE4

# per-level seed parameters (wln.cc:100-104 ncprm: tuple len, merge gain,
# score threshold x scale)
NT_LEVELS = ({"k": 8, "thr": 50}, {"k": 6, "thr": 40}, {"k": 4, "thr": 30})

# spaced-seed patterns by weight (WlnDefBitPat, wln.cc:40-42; applied in
# cross-species mode, setwlprm wln.cc:55-62).  '1' = sampled position.
WLN_DEF_BITPAT = ("", "1", "101", "1101", "11011", "1101101", "110011011",
                  "1101101011", "110010110111", "11101100101011",
                  "110110010110111", "1111011001011011")


@dataclass
class Hsp:
    jx: int        # query start (0-based)
    jy: int        # genome start
    jlen: int      # length
    nid: int       # identities
    jscr: int      # matrix score (x10)

    @property
    def rx(self) -> int:
        return self.jx + self.jlen

    @property
    def ry(self) -> int:
        return self.jy + self.jlen

    @property
    def diag(self) -> int:
        return self.jy - self.jx


@dataclass
class Chain:
    hsps: list[Hsp]
    score: int
    llmt: int = 0      # genomic lower search bound
    ulmt: int = 0      # genomic upper bound

    @property
    def q_span(self) -> tuple[int, int]:
        return self.hsps[0].jx, self.hsps[-1].rx

    @property
    def g_span(self) -> tuple[int, int]:
        return self.hsps[0].jy, self.hsps[-1].ry

    def band(self, M: int, N: int, sh: int = 100) -> tuple[int, int]:
        """DP band from chain geometry (stripe-from-jxt semantics,
        aln2.cc:156-199): diagonals covered by the chain widened by sh.
        The band deliberately does NOT reach the matrix corners — with
        free end gaps the path starts/ends on the band's init row/last
        row, and query ends uncovered by the chain get extra widening
        from the caller (the reference runs dedicated end heuristics
        instead of widening, fwd2s1.cc:2274-2404)."""
        diags = [h.diag for h in self.hsps]
        lw = max(min(diags) - sh - 1, -M)
        up = min(max(diags) + sh + 1, N)
        return lw, up


def _kmer_words(red: np.ndarray, k: int,
                pattern: str | None = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """Packed k-mer codes and validity mask (positions with no ambiguity).

    With a spaced-seed pattern (Bitpat, bitpat.h:69-106), only the '1'
    offsets of the width-len(pattern) window are sampled; the word still
    packs `weight` bases, so the lookup tables keep their size while the
    seed tolerates mismatches at the '0' positions."""
    L = len(red)
    offs = (range(k) if pattern is None else
            [i for i, c in enumerate(pattern) if c == '1'])
    width = k if pattern is None else len(pattern)
    if L < width:
        return np.zeros(0, np.int64), np.zeros(0, bool)
    valid = red < 4
    nw = L - width + 1
    w = np.zeros(nw, dtype=np.int64)
    ok = np.ones(nw, dtype=bool)
    for i in offs:
        w = w * 4 + red[i:nw + i]
        ok &= valid[i:nw + i]
    return w, ok


def find_hsps(q: np.ndarray, g: np.ndarray, level: int = 1,
              match: int = 20, mismatch: int = -60,
              max_gap_in_run: int | None = None,
              min_score: int | None = None,
              mtx: np.ndarray | None = None,
              spaced: bool = False) -> list[Hsp]:
    """K-mer seed pairs -> diagonal runs -> scored HSPs.

    mtx: substitution matrix for run evaluation (Wlp::eval, wln.cc:358);
    falls back to flat match/mismatch when absent.  spaced: use the
    level's WlnDefBitPat spaced seed (cross-species sensitivity)."""
    prm = NT_LEVELS[min(level, 2)]
    k = prm["k"]
    pattern = WLN_DEF_BITPAT[k] if spaced and k < len(WLN_DEF_BITPAT) \
        else None
    thr = (min_score if min_score is not None else prm["thr"] * 10)
    merge_gap = max_gap_in_run if max_gap_in_run is not None else 3 * k
    rq = NT_REDUCE4[np.asarray(q, dtype=np.int64)]
    rg = NT_REDUCE4[np.asarray(g, dtype=np.int64)]
    qw, qok = _kmer_words(rq, k, pattern)
    gw, gok = _kmer_words(rg, k, pattern)
    if not len(qw) or not len(gw):
        return []
    qpos = np.nonzero(qok)[0]
    qv = qw[qpos]
    order = np.argsort(qv, kind="stable")
    qv_sorted, qpos_sorted = qv[order], qpos[order]
    gpos = np.nonzero(gok)[0]
    gv = gw[gpos]
    lo = np.searchsorted(qv_sorted, gv, side="left")
    hi = np.searchsorted(qv_sorted, gv, side="right")
    cnt = hi - lo
    has = cnt > 0
    if not has.any():
        return []
    g_rep = np.repeat(gpos[has], cnt[has])
    idx = np.concatenate([np.arange(l, h) for l, h in
                          zip(lo[has], hi[has])])
    q_rep = qpos_sorted[idx]
    diag = g_rep.astype(np.int64) - q_rep
    order = np.lexsort((g_rep, diag))
    dd, gg, qq = diag[order], g_rep[order], q_rep[order]
    # split into runs: same diagonal, genome-gap <= merge_gap
    brk = np.nonzero((np.diff(dd) != 0)
                     | (np.diff(gg) > merge_gap))[0] + 1
    starts = np.concatenate([[0], brk])
    ends = np.concatenate([brk, [len(dd)]])
    hsps: list[Hsp] = []
    q_arr = np.asarray(q, dtype=np.int64)
    g_arr = np.asarray(g, dtype=np.int64)
    span = k if pattern is None else len(pattern)
    for s, e in zip(starts, ends):
        jx, jy = int(qq[s]), int(gg[s])
        jlen = int(gg[e - 1]) + span - jy
        # evaluate with the matrix over the run (Wlp::eval, wln.cc:358)
        qs = rq[jx:jx + jlen]
        gs = rg[jy:jy + jlen]
        L = min(len(qs), len(gs))
        eq = (qs[:L] == gs[:L]) & (qs[:L] < 4)
        nid = int(eq.sum())
        if mtx is not None:
            scr = int(mtx[q_arr[jx:jx + L], g_arr[jy:jy + L]].sum())
        else:
            scr = int(nid * match + (L - nid) * mismatch)
        if scr >= thr:
            hsps.append(Hsp(jx=jx, jy=jy, jlen=L, nid=nid, jscr=scr))
    return hsps


def chain_hsps(hsps: list[Hsp], ipen=None, gop: int = -80, gep: int = -30,
               min_intron: int = 20, vthr: int = 350,
               max_out: int = 4) -> list[Chain]:
    """O(h^2) chain DP (Wlp::jxtcore, wln.cc:777-926).

    Link cost between chained HSPs = min(intron PenaltyPlus(dr), ordinary
    GapPenalty) with overlap correction; <=50% overlap rejection rule."""
    if not hsps:
        return []
    hs = sorted(hsps, key=lambda h: (h.ry, h.rx))
    n = len(hs)
    best = [h.jscr for h in hs]
    prev = [-1] * n
    for i in range(n):
        hi_ = hs[i]
        for j in range(i):
            lo_ = hs[j]
            if lo_.rx >= hi_.rx or lo_.ry >= hi_.ry:
                continue
            ovl_x = lo_.rx - hi_.jx
            if 2 * ovl_x > hi_.rx - lo_.jx:           # >50% overlap
                continue
            dy = hi_.jy - lo_.ry                      # genomic gap
            dx = hi_.jx - lo_.rx
            ovl = max(max(ovl_x, lo_.ry - hi_.jy), 0)
            dr = dy - dx                              # diagonal shift
            if dr >= min_intron and ipen is not None:
                link = int(ipen.penalty_plus(np.asarray([dr]))[0])
                link = max(link, gop + gep * dr)
            elif dr != 0:
                link = gop + gep * abs(dr)
            else:
                link = 0
            cand = best[j] + hi_.jscr + link - ovl * 20
            if cand > best[i]:
                best[i] = cand
                prev[i] = j
    # extract non-overlapping chains best-first
    order = np.argsort(best)[::-1]
    used = [False] * n
    chains: list[Chain] = []
    for i in order:
        if used[i] or best[i] < vthr:
            continue
        members = []
        j = int(i)
        clash = False
        while j >= 0:
            if used[j]:
                clash = True
                break
            members.append(j)
            j = prev[j]
        if clash or not members:
            continue
        for j in members:
            used[j] = True
        members.reverse()
        chains.append(Chain(hsps=[hs[j] for j in members],
                            score=int(best[i])))
        if len(chains) >= max_out:
            break
    # negotiate genomic bounds with neighbors (wln.cc:865-924 simplified:
    # butt at each other's spans)
    chains_sorted = sorted(chains, key=lambda c: c.g_span[0])
    for a, b in zip(chains_sorted, chains_sorted[1:]):
        mid = (a.g_span[1] + b.g_span[0]) // 2
        a.ulmt = max(a.g_span[1], mid)
        b.llmt = min(b.g_span[0], mid)
    if chains_sorted:
        chains_sorted[0].llmt = 0
        chains_sorted[-1].ulmt = 1 << 62
    return chains


def wilip(q: np.ndarray, g: np.ndarray, level: int = 1, ipen=None,
          prm=None, spaced: bool = False, **kw) -> list[Chain]:
    """HSP search + chaining at one level; retries coarser levels if the
    finer one finds nothing (the -Q level recursion entry).

    prm: DpParams — supplies the substitution matrix for HSP evaluation
    and the gap costs for chain links (replacing the flat defaults).
    spaced: spaced seeds at every level, falling back to the contiguous
    seed at the coarsest level (cross-species mode)."""
    if prm is not None:
        kw.setdefault("gop", prm.gop)
        kw.setdefault("gep", prm.gep)
    mtx = prm.qprof_mtx if prm is not None else None
    for lv in range(level, 3):
        hsps = find_hsps(q, g, lv, mtx=mtx, spaced=spaced)
        chains = chain_hsps(hsps, ipen=ipen, **kw)
        if chains:
            return chains
    if spaced:
        hsps = find_hsps(q, g, 2, mtx=mtx, spaced=False)
        chains = chain_hsps(hsps, ipen=ipen, **kw)
        if chains:
            return chains
    return []
