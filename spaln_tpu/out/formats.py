"""Alignment output writers.

The role of sqpr.cc:130-1331: render GeneStructure records as GFF3 gene
models, exon/intron tables, SAM, CIGAR — the spaln -O output family.
Genome coordinates are converted to 1-based contig space by the caller
supplying ``g_off`` (window offset) and contig name.
"""
from __future__ import annotations

from ..align.gene import GeneStructure

_GFF_SRC = "spaln_tpu"


def gff3_lines(gs: GeneStructure, g_off: int = 0, q_len: int = 0,
               gene_id: int = 1) -> list[str]:
    """GFF3 gene/mRNA/exon records (Gff3Form semantics)."""
    g0, g1 = gs.g_span
    gid = f"gene{gene_id:05d}"
    mid = f"mRNA{gene_id:05d}"
    sc = gs.score / gs.scale
    lines = [
        "\t".join([gs.g_name, _GFF_SRC, "gene", str(g_off + g0 + 1),
                   str(g_off + g1), f"{sc:.1f}", gs.strand, ".",
                   f"ID={gid};Name={gs.q_name}"]),
        "\t".join([gs.g_name, _GFF_SRC, "mRNA", str(g_off + g0 + 1),
                   str(g_off + g1), f"{sc:.1f}", gs.strand, ".",
                   f"ID={mid};Parent={gid};Name={gs.q_name}"]),
    ]
    for i, e in enumerate(gs.exons, 1):
        attrs = (f"ID={mid}.e{i};Parent={mid};Target={gs.q_name} "
                 f"{e.q_start + 1} {e.q_end}")
        lines.append("\t".join(
            [gs.g_name, _GFF_SRC, "exon", str(g_off + e.g_start + 1),
             str(g_off + e.g_end), f"{e.identity * 100:.1f}", gs.strand,
             ".", attrs]))
    return lines


def exon_table_lines(gs: GeneStructure, g_off: int = 0,
                     q_len: int = 0) -> list[str]:
    """Per-exon stats table (ExonForm, -O4 style)."""
    lines = []
    for e in gs.exons:
        lines.append("\t".join(map(str, [
            gs.q_name, gs.g_name, gs.strand,
            e.q_start + 1, e.q_end,
            g_off + e.g_start + 1, g_off + e.g_end,
            f"{e.identity * 100:.2f}",
            e.mch, e.mmc, e.gap, e.unp,
            e.sig3 / gs.scale, e.sig5 / gs.scale,
        ])))
    return lines


def intron_lines(gs: GeneStructure, g_off: int = 0) -> list[str]:
    """Intron records (IntronForm, -O6 style)."""
    lines = []
    for i in gs.introns:
        lines.append("\t".join(map(str, [
            gs.q_name, gs.g_name, gs.strand,
            g_off + i.g_start + 1, g_off + i.g_end, i.length,
            i.q_pos, f"{i.sig5 / gs.scale:.1f}", f"{i.sig3 / gs.scale:.1f}",
            "canonical" if i.canonical else "noncanonical",
        ])))
    return lines


def sam_line(gs: GeneStructure, g_off: int = 0, q_len: int = 0,
             seq: str = "*") -> str:
    """Minimal SAM alignment line (SamForm, -O15/-O3 style)."""
    flag = 0 if gs.strand == "+" else 16
    g0, _ = gs.g_span
    mapq = min(60, max(1, int(gs.score / gs.scale / 10)))
    return "\t".join(map(str, [
        gs.q_name, flag, gs.g_name, g_off + g0 + 1, mapq,
        gs.cigar(), "*", 0, 0, seq, "*",
        f"AS:i:{int(gs.score / gs.scale)}",
        f"NM:i:{sum(e.mmc + e.unp for e in gs.exons)}",
    ]))
