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
                      cfg: Config | None = None,
                      prefilter: bool | None = None,
                      db_index=None) -> list[ProteinHit]:
    """Rank DB entries by semi-global alignment score; align the best.

    db: list of (name, codes) tuples.  For large DBs a k-mer prefilter
    (SrchBlk::finds role, blksrc.cc:3271+) selects candidate entries so
    the DP runs on a calibrated subset; pass prefilter=False to force
    full DP on every entry, or a prebuilt ProteinDbIndex via db_index.
    """
    cfg = resolve(cfg or Config(), PvsP)
    if matrix:
        from ..score.simmtx import text_matrix
        sm = Simmtx(text_matrix(matrix), u=4., v=10.)
    else:
        sm = Simmtx.protein(table_dir, slot=0)
    prm = DpParams.build(cfg, sm, PvsP)
    flags = DpFlags()                      # semi-global
    if prefilter is None:
        prefilter = len(db) > 256
    cand_ids = np.arange(len(db))
    if prefilter and len(db):
        from ..seed.dbindex import ProteinDbIndex
        if db_index is None:
            db_index = ProteinDbIndex.build(db)
        cand_ids = db_index.candidates(query,
                                       max_cand=max(4 * max_hits, 64),
                                       min_hits=max_hits)
    scores = np.full(len(db), -(1 << 60), dtype=np.int64)
    for b0 in range(0, len(cand_ids), batch):
        ids = cand_ids[b0:b0 + batch]
        qs = [query] * len(ids)
        gs = [db[i][1] for i in ids]
        s, e, _ = forward_spliced_batch(qs, gs, prm, sigs=None,
                                        flags=flags, L=lanes,
                                        score_only=True)
        scores[ids] = s
    order = np.argsort(scores)[::-1][:max_hits]
    order = order[scores[order] > -(1 << 60)]
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
