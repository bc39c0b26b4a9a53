"""Locus merge / sort / filter — the sortgrcd equivalent.

The reference's accessory program (sortgrcd.cc, SURVEY.md A.8) merges the
binary outputs of many independent spaln runs, clusters transcripts into
gene loci (maximal same-chromosome same-strand overlap chains), filters by
quality, and re-sorts.  Here the unit is GeneStructure records — the merge
of many shards (multi-host runs) is list concatenation, so cluster/filter/
sort run identically on one shard or a pod's gathered results.

Sort key: (chromosome, strand, g_start, g_end, n_exons) = the reference's
(Csense, Gstart, Gend, nexn) compf.  A locus = maximal run of records whose
g_start <= running max g_end (findGeneEnd).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from ..align.gene import GeneStructure


@dataclass
class FilterParams:
    """Quality filter presets (sortgrcd.cc:56-64 Filters[4])."""
    min_coverage: float = 0.0      # -C
    min_identity: float = 0.0      # -I (Pmatch)
    min_score: float = 0.0         # -H (Gscore, unscaled)
    max_bad_junctions: int = 1 << 30   # -n (non-canonical count)

    @classmethod
    def preset(cls, level: int) -> "FilterParams":
        if level <= 0:
            return cls()
        if level == 1:
            return cls(min_coverage=0.5, min_identity=0.75)
        if level == 2:
            return cls(min_coverage=0.75, min_identity=0.85,
                       max_bad_junctions=2)
        return cls(min_coverage=0.9, min_identity=0.9, max_bad_junctions=0)


@dataclass
class Locus:
    chrom: str
    strand: str
    g_start: int
    g_end: int
    members: list[GeneStructure] = field(default_factory=list)


def passes(gs: GeneStructure, q_len: int, fp: FilterParams) -> bool:
    if gs.identity < fp.min_identity:
        return False
    if q_len and gs.coverage(q_len) < fp.min_coverage:
        return False
    if gs.score / gs.scale < fp.min_score:
        return False
    bad = sum(1 for i in gs.introns if not i.canonical)
    return bad <= fp.max_bad_junctions


def sort_records(records: list[GeneStructure]) -> list[GeneStructure]:
    """(chrom, strand, g_start, g_end, n_exons) ordering (compf)."""
    return sorted(records, key=lambda g: (
        g.g_name, g.strand, g.g_span[0], g.g_span[1], len(g.exons)))


def cluster_loci(records: list[GeneStructure],
                 q_lens: dict | None = None,
                 filt: FilterParams | None = None) -> list[Locus]:
    """Merge (possibly multi-shard) records into gene loci."""
    filt = filt or FilterParams()
    kept = [g for g in records
            if passes(g, (q_lens or {}).get(g.q_name, 0), filt)]
    out: list[Locus] = []
    cur: Locus | None = None
    for g in sort_records(kept):
        g0, g1 = g.g_span
        if (cur is not None and g.g_name == cur.chrom
                and g.strand == cur.strand and g0 <= cur.g_end):
            cur.members.append(g)
            cur.g_end = max(cur.g_end, g1)
        else:
            cur = Locus(chrom=g.g_name, strand=g.strand, g_start=g0,
                        g_end=g1, members=[g])
            out.append(cur)
    return out


def unique_introns(records: list[GeneStructure]) -> list[tuple]:
    """Distinct introns across all records (-O15 role): keyed by
    (chrom, strand, start, end) with support counts."""
    seen: dict[tuple, int] = {}
    for g in records:
        for i in g.introns:
            key = (g.g_name, g.strand, i.g_start, i.g_end)
            seen[key] = seen.get(key, 0) + 1
    return sorted((k + (v,)) for k, v in seen.items())


def locus_report(loci: list[Locus]) -> list[str]:
    """Text report: '!' locus header + '@' member transcripts
    (README.md:455-459 delimiters)."""
    lines = []
    for lo in loci:
        lines.append(f"!\t{lo.chrom}\t{lo.strand}\t{lo.g_start + 1}\t"
                     f"{lo.g_end}\t{len(lo.members)}")
        for g in lo.members:
            lines.append(f"@\t{g.q_name}\t{g.g_span[0] + 1}\t{g.g_span[1]}"
                         f"\t{g.score / g.scale:.1f}\t{len(g.exons)}"
                         f"\t{g.identity * 100:.1f}")
    return lines
