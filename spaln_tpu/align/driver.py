"""Seeded alignment driver: query x genomic window -> gene structures.

The role of Aln2s1's driver hierarchy (globalS_ng/seededS_ng, fwd2s1.cc:
2587-2778) re-shaped for a TPU pipeline: host-side seeding and geometry
(Wilber-Lipman chains -> strand -> window -> band), device wavefront DP,
host traceback and gene-structure extraction.  Control flow stays on host;
only the DP runs on device (SURVEY.md section 7 stance).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import Config, resolve, CvsG
from ..ops.params import DpParams, DpFlags
from ..ops.dp_spliced_scan import forward_spliced_scan, traceback_spliced_scan
from ..score.intron import IntronPenalty
from ..score.simmtx import Simmtx
from ..score.splice import build_splice_signals, SpliceSignals
from ..score.tables import TableDir
from ..seed.wilip import wilip, Chain
from ..seq.codec import comrev
from .gene import GeneStructure, build_gene_structure


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class AlignerContext:
    """Per-run immutable context (tables + resolved params)."""
    cfg: Config
    tables: TableDir
    prm: DpParams
    ipen: IntronPenalty

    @classmethod
    def create(cls, tables: TableDir, cfg: Config | None = None,
               dvsp: int = CvsG) -> "AlignerContext":
        cfg = resolve(cfg or Config(), dvsp)
        ipen = IntronPenalty(cfg, dvsp)
        prm = DpParams.build(cfg, Simmtx.dna(), dvsp, ipen=ipen)
        return cls(cfg=cfg, tables=tables, prm=prm, ipen=ipen)


def align_cdna(query: np.ndarray, genome: np.ndarray, ctx: AlignerContext,
               strand: str = "auto", level: int = 1, sh: int = 100,
               margin: int = 2000, lanes: int = 128, q_name: str = "",
               g_name: str = "", g_off: int = 0) -> list[GeneStructure]:
    """Map and align one cDNA query onto one genomic window.

    Returns gene structures (usually one), genome coordinates relative to
    the given window plus ``g_off``.  ``strand='auto'`` tries both
    orientations and keeps the better chain (geneorient, wln.cc:1024).
    """
    results: list[GeneStructure] = []
    cands: list[tuple[int, str, np.ndarray, Chain | None]] = []
    fwd_chains = wilip(query, genome, level=level, ipen=ctx.ipen)
    if strand in ("auto", "+") and fwd_chains:
        cands.append((fwd_chains[0].score, "+", query, fwd_chains[0]))
    if strand in ("auto", "-"):
        rc = comrev(query)
        rev_chains = wilip(rc, genome, level=level, ipen=ctx.ipen)
        if rev_chains:
            cands.append((rev_chains[0].score, "-", rc, rev_chains[0]))
    if not cands and strand in ("auto", "+"):
        cands.append((0, "+", query, None))
    if not cands:
        return []
    cands.sort(key=lambda c: -c[0])
    score0, st, q_use, chain = cands[0]
    gs = _align_window(q_use, genome, ctx, chain, sh=sh, margin=margin,
                       lanes=lanes, q_name=q_name, g_name=g_name,
                       g_off=g_off, strand=st)
    if gs is not None:
        results.append(gs)
    return results


def _align_window(q: np.ndarray, g: np.ndarray, ctx: AlignerContext,
                  chain: Chain | None, sh: int, margin: int, lanes: int,
                  q_name: str, g_name: str, g_off: int,
                  strand: str) -> GeneStructure | None:
    M = len(q)
    # restrict the genomic window around the chain
    if chain is not None:
        g0, g1 = chain.g_span
        q0, q1 = chain.q_span
        lo = max(0, g0 - q0 - margin)
        hi = min(len(g), g1 + (M - q1) + margin)
    else:
        lo, hi = 0, len(g)
    gw = np.asarray(g[lo:hi])
    N = len(gw)
    if N == 0 or M == 0:
        return None
    sig = build_splice_signals(gw, ctx.cfg, ctx.tables)
    if chain is not None:
        diags = [h.diag - lo for h in chain.hsps]
        lw = max(min(diags) - sh, -M)
        up = min(max(diags) + sh, N)
        # query ends not covered by the chain may sit across an unseen
        # intron (the reference re-searches ends recursively,
        # first_exon/last_exon fwd2s1.cc:2274-2404); widen the band there
        q0, q1 = chain.q_span
        if q0 > 15:
            lw = max(lw - q0 - margin, -M)
        if M - q1 > 15:
            up = min(up + (M - q1) + margin, N)
    else:
        lw, up = -M, N
    # bucket the band width to limit recompilation
    W = up - lw + 1
    Wb = _round_up(W, 256)
    extra = Wb - W
    lw = max(lw - extra // 2, -M)
    up = min(lw + Wb - 1, N)
    lw = max(up - Wb + 1, -M)
    score, em, en, tr = forward_spliced_scan(q, gw, ctx.prm, sig=sig,
                                             lw=lw, up=up, L=lanes)
    ops = traceback_spliced_scan(tr, em, en)
    gs = build_gene_structure(ops, q, gw, score, sig=sig, q_name=q_name,
                              g_name=g_name, strand=strand)
    if gs is None:
        return None
    # shift genome coords back to the full window
    for e in gs.exons:
        e.g_start += lo
        e.g_end += lo
    for i in gs.introns:
        i.g_start += lo
        i.g_end += lo
    return gs
