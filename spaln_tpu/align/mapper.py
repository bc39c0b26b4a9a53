"""Genome mapper: block-index candidate location + seeded alignment.

The role of the spaln -Q7 pipeline (spaln_job -> quick4 -> blkaln,
spaln.cc:846-1154): locate candidate gene ranges with the block index,
align the query to each with the seeded driver, keep the best loci.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..seed.blockindex import BlockIndex, ProteinBlockIndex
from ..seq.codec import comrev
from ..seq.genome import GenomeStore
from .driver import AlignerContext, align_cdna
from .gene import GeneStructure
from .protein_driver import ProteinAlignerContext, align_protein


@dataclass
class GenomeMapper:
    store: GenomeStore
    index: BlockIndex
    ctx: AlignerContext

    def map_query(self, query: np.ndarray, q_name: str = "",
                  strand: str = "auto", ncand: int = 10,
                  max_out: int = 1, min_coverage: float = 0.3,
                  lanes: int = 128) -> list[GeneStructure]:
        """Map one query onto the whole genome; returns best loci."""
        cands: list[tuple[float, int, int]] = []
        for g0, g1, score in self.index.candidate_ranges(query, ncand):
            cands.append((score, g0, g1))
        rc = comrev(query)
        for g0, g1, score in self.index.candidate_ranges(rc, ncand):
            cands.append((score, g0, g1))
        if not cands:
            return []
        # dedup overlapping ranges
        cands.sort(key=lambda c: -c[0])
        picked: list[tuple[int, int]] = []
        results: list[GeneStructure] = []
        maxgene = self.index.maxgene
        for score, g0, g1 in cands:
            if any(not (g1 <= p0 or g0 >= p1) for p0, p1 in picked):
                continue
            picked.append((g0, g1))
            for _retry in range(3):   # ExtBlock widening, blksrc.cc:2409
                window = self.store.window(g0, g1)
                ci, cpos0 = self.store.locate(g0)
                gs_list = align_cdna(query, window, self.ctx,
                                     strand=strand, q_name=q_name,
                                     g_name=self.store.names[ci],
                                     lanes=lanes)
                grow_l = grow_r = 0
                edge = max(len(query), 64)
                for gs in gs_list:
                    qlo = min(e.q_start for e in gs.exons)
                    qhi = max(e.q_end for e in gs.exons)
                    glo = min(e.g_start for e in gs.exons)
                    ghi = max(e.g_end for e in gs.exons)
                    if qlo > 8 and glo < edge and g0 > 0:
                        grow_l = maxgene // 2
                    if (len(query) - qhi > 8
                            and len(window) - ghi < edge
                            and g1 < self.store.total_len):
                        grow_r = maxgene // 2
                if not (grow_l or grow_r):
                    break
                g0 = max(g0 - grow_l, 0)
                g1 = min(g1 + grow_r, self.store.total_len)
            for gs in gs_list:
                if gs.coverage(len(query)) < min_coverage:
                    continue
                off = g0 - int(self.store.offsets[ci])
                for e in gs.exons:
                    e.g_start += off
                    e.g_end += off
                for i in gs.introns:
                    i.g_start += off
                    i.g_end += off
                results.append(gs)
            if len(results) >= max_out * 3:
                break
        results.sort(key=lambda g: -g.score)
        return results[:max_out]


@dataclass
class ProteinGenomeMapper:
    """Protein-query whole-genome mapper (-KP path: spaln_job with an aa
    query over the .bkp index, spaln.cc:846-1154).  The 6-frame index is
    strand-agnostic, so one vote covers both orientations; strand choice
    happens in the seeded tron driver."""
    store: GenomeStore
    index: ProteinBlockIndex
    ctx: ProteinAlignerContext

    def map_query(self, query: np.ndarray, q_name: str = "",
                  ncand: int = 10, max_out: int = 1,
                  min_coverage: float = 0.3,
                  lanes: int = 64) -> list[GeneStructure]:
        cands = [(score, g0, g1) for g0, g1, score
                 in self.index.candidate_ranges(query, ncand)]
        if not cands:
            return []
        cands.sort(key=lambda c: -c[0])
        picked: list[tuple[int, int]] = []
        results: list[GeneStructure] = []
        maxgene = self.index.maxgene
        for score, g0, g1 in cands:
            if any(not (g1 <= p0 or g0 >= p1) for p0, p1 in picked):
                continue
            picked.append((g0, g1))
            for _retry in range(3):
                window = self.store.window(g0, g1)
                ci, _ = self.store.locate(g0)
                gs_list = align_protein(query, window, self.ctx,
                                        q_name=q_name,
                                        g_name=self.store.names[ci],
                                        lanes=lanes)
                grow_l = grow_r = 0
                edge = max(3 * len(query), 64)
                for gs in gs_list:
                    qlo = min(e.q_start for e in gs.exons)
                    qhi = max(e.q_end for e in gs.exons)
                    glo = min(e.g_start for e in gs.exons)
                    ghi = max(e.g_end for e in gs.exons)
                    if qlo > 3 and glo < edge and g0 > 0:
                        grow_l = maxgene // 2
                    if (len(query) - qhi > 3
                            and len(window) - ghi < edge
                            and g1 < self.store.total_len):
                        grow_r = maxgene // 2
                if not (grow_l or grow_r):
                    break
                g0 = max(g0 - grow_l, 0)
                g1 = min(g1 + grow_r, self.store.total_len)
            for gs in gs_list:
                if gs.coverage(len(query)) < min_coverage:
                    continue
                off = g0 - int(self.store.offsets[ci])
                for e in gs.exons:
                    e.g_start += off
                    e.g_end += off
                for i in gs.introns:
                    i.g_start += off
                    i.g_end += off
                results.append(gs)
            if len(results) >= max_out * 3:
                break
        results.sort(key=lambda g: -g.score)
        return results[:max_out]
