"""Command-line interface.

The spaln-equivalent entry points (spaln.cc:152-516 option surface,
re-organized as subcommands):

  spaln_tpu align  <genomic.fa> <queries.fa>   no-index alignment (-Q0..3)
  spaln_tpu index  <genome.fa> -K D|P          build block index (-W)
  spaln_tpu map    <queries.fa> -d <genome>    indexed genome mapping (-Q7)

Output formats via -O: 3 = GFF3 gene (default), 4 = exon table,
6 = intron table, 15 = SAM.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

from .align.driver import AlignerContext, align_cdna
from .config import Config
from .out.formats import (exon_table_lines, gff3_lines, intron_lines,
                          sam_line)
from .score.tables import TableDir, find_table_dir
from .seq.fasta import iter_fasta, read_fasta
from .seq.genome import GenomeStore
from .constants import DNA


def _emit(gs_list, fmt: int, out, q_len: int, gene_id: int) -> int:
    for gs in gs_list:
        if fmt == 3:
            out.write("\n".join(gff3_lines(gs, q_len=q_len,
                                           gene_id=gene_id)) + "\n")
        elif fmt == 4:
            out.write("\n".join(exon_table_lines(gs, q_len=q_len)) + "\n")
        elif fmt == 6:
            lines = intron_lines(gs)
            if lines:
                out.write("\n".join(lines) + "\n")
        elif fmt == 15:
            out.write(sam_line(gs, q_len=q_len) + "\n")
        else:
            raise SystemExit(f"unsupported output format -O{fmt}")
        gene_id += 1
    return gene_id


def cmd_align(args) -> int:
    tables = TableDir(find_table_dir(args.table_dir), species=args.species)
    ctx = AlignerContext.create(tables)
    genome_recs = read_fasta(args.genomic, molc=DNA)
    out = open(args.output, "w") if args.output else sys.stdout
    gene_id = 1
    if args.fmt == 3:
        out.write("##gff-version 3\n")
    for rec in iter_fasta(args.queries, molc=DNA):
        for grec in genome_recs:
            gs_list = align_cdna(rec.codes, grec.codes, ctx,
                                 strand=args.strand, q_name=rec.name,
                                 g_name=grec.name, lanes=args.lanes)
            gene_id = _emit(gs_list, args.fmt, out, len(rec.codes),
                            gene_id)
    if args.output:
        out.close()
    return 0


def cmd_index(args) -> int:
    from .seed.blockindex import BlockIndex
    store = GenomeStore.from_fasta(args.genome, molc=DNA)
    prefix = args.prefix or args.genome.rsplit(".", 1)[0]
    store.save(prefix)
    idx = BlockIndex.build(store)
    idx.save(prefix)
    print(f"indexed {store.n_contigs} contigs, {store.total_len} bases "
          f"-> {prefix}.bkn.npz", file=sys.stderr)
    return 0


def cmd_map(args) -> int:
    from .seed.blockindex import BlockIndex
    from .align.mapper import GenomeMapper
    store = GenomeStore.load(args.genome_db)
    idx = BlockIndex.load(args.genome_db)
    tables = TableDir(find_table_dir(args.table_dir), species=args.species)
    ctx = AlignerContext.create(tables)
    mapper = GenomeMapper(store, idx, ctx)
    out = open(args.output, "w") if args.output else sys.stdout
    gene_id = 1
    if args.fmt == 3:
        out.write("##gff-version 3\n")
    for rec in iter_fasta(args.queries, molc=DNA):
        gs_list = mapper.map_query(rec.codes, q_name=rec.name,
                                   strand=args.strand, lanes=args.lanes)
        gene_id = _emit(gs_list, args.fmt, out, len(rec.codes), gene_id)
    if args.output:
        out.close()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="spaln_tpu",
                                description="TPU-native spliced aligner")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("-O", dest="fmt", type=int, default=3,
                        help="output format (3 gff3, 4 exon, 6 intron, "
                             "15 sam)")
        sp.add_argument("-T", dest="species", default=None,
                        help="species/clade parameter set")
        sp.add_argument("-S", dest="strand", default="auto",
                        choices=["auto", "+", "-"])
        sp.add_argument("-t", dest="table_dir", default=None)
        sp.add_argument("-o", dest="output", default=None)
        sp.add_argument("--lanes", type=int, default=128)

    sp = sub.add_parser("align", help="align queries to genomic segments")
    sp.add_argument("genomic")
    sp.add_argument("queries")
    common(sp)
    sp.set_defaults(func=cmd_align)

    sp = sub.add_parser("index", help="format genome + build block index")
    sp.add_argument("genome")
    sp.add_argument("-p", dest="prefix", default=None)
    sp.set_defaults(func=cmd_index)

    sp = sub.add_parser("map", help="map queries onto an indexed genome")
    sp.add_argument("queries")
    sp.add_argument("-d", dest="genome_db", required=True)
    common(sp)
    sp.set_defaults(func=cmd_map)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
