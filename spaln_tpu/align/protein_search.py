"""Protein vs protein-DB (semi-)global search — the spaln -a mode.

The role of Aln2b1's seeded driver + CalcServer fan-out (fwd2b1.cc:1405,
calcserv.h): score one query against many DB entries and align the best
hits.  TPU-native shape: all DB entries are one batched wavefront launch
(score-only), then the top hits get a traceback pass — no per-entry
threading, just batch axes.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import Config, resolve, PvsP
from ..ops.params import DpParams, DpFlags
from ..ops.dp_spliced_scan import (forward_spliced_batch,
                                   traceback_spliced_scan)
from ..score.simmtx import Simmtx
from .gene import GeneStructure, build_gene_structure


@dataclass
class ProteinHit:
    name: str
    score: int
    q_span: tuple
    s_span: tuple
    identity: float
    structure: GeneStructure | None = None


def search_protein_db(query: np.ndarray, db: list, ctx_tables=None,
                      matrix: str | None = None, table_dir: str = "",
                      max_hits: int = 10, align_top: int = 1,
                      lanes: int = 64, batch: int = 64,
                      cfg: Config | None = None) -> list[ProteinHit]:
    """Rank DB entries by semi-global alignment score; align the best.

    db: list of (name, codes) tuples.
    """
    cfg = resolve(cfg or Config(), PvsP)
    if matrix:
        from ..score.simmtx import text_matrix
        sm = Simmtx(text_matrix(matrix), u=4., v=10.)
    else:
        sm = Simmtx.protein(table_dir, slot=0)
    prm = DpParams.build(cfg, sm, PvsP)
    flags = DpFlags()                      # semi-global
    scores = np.empty(len(db), dtype=np.int64)
    ends = []
    for b0 in range(0, len(db), batch):
        chunk = db[b0:b0 + batch]
        qs = [query] * len(chunk)
        gs = [codes for _, codes in chunk]
        s, e, _ = forward_spliced_batch(qs, gs, prm, sigs=None,
                                        flags=flags, L=lanes,
                                        score_only=True)
        scores[b0:b0 + len(chunk)] = s
        ends.extend(e.tolist())
    order = np.argsort(scores)[::-1][:max_hits]
    hits: list[ProteinHit] = []
    for rank, i in enumerate(order):
        name, codes = db[i]
        hit = ProteinHit(name=name, score=int(scores[i]),
                         q_span=(0, len(query)), s_span=(0, len(codes)),
                         identity=0.0)
        if rank < align_top:
            s, e, tr = forward_spliced_batch(
                [query], [codes], prm, sigs=None, flags=flags, L=lanes,
                score_only=False)
            ops = traceback_spliced_scan(tr[0], int(e[0][0]), int(e[0][1]))
            gsr = build_gene_structure(ops, query, codes, int(s[0]),
                                       q_name="query", g_name=name,
                                       aa_pair=True)
            if gsr is not None:
                hit.structure = gsr
                hit.identity = gsr.identity
                hit.q_span = gsr.q_span
                hit.s_span = gsr.g_span
        hits.append(hit)
    return hits
