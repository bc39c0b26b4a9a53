"""End-to-end pipeline tests: seeding, block index, mapper, outputs."""
import numpy as np
import pytest

from spaln_tpu.align.driver import AlignerContext, align_cdna
from spaln_tpu.align.mapper import GenomeMapper
from spaln_tpu.out.formats import gff3_lines, exon_table_lines, sam_line
from spaln_tpu.seed.blockindex import BlockIndex
from spaln_tpu.seed.wilip import find_hsps, chain_hsps, wilip
from spaln_tpu.seq.codec import encode_dna, comrev, decode_dna
from spaln_tpu.seq.fasta import SeqRecord
from spaln_tpu.seq.genome import GenomeStore
from spaln_tpu.constants import DNA


@pytest.fixture(scope="module")
def ctx(table_dir):
    return AlignerContext.create(table_dir)


def _mk(rng, n):
    return "".join(rng.choice(np.array(list("ACGT")), n))


def _gene(rng, n_exons=3):
    exons = [_mk(rng, int(rng.integers(80, 180))) for _ in range(n_exons)]
    parts = []
    bounds = []
    pos = 0
    for i, e in enumerate(exons):
        parts.append(e)
        pos += len(e)
        if i < n_exons - 1:
            ilen = int(rng.integers(80, 500))
            parts.append("GTAAGT" + _mk(rng, ilen - 13) + "TTTCTAG")
            bounds.append((pos, pos + ilen))
            pos += ilen
    return "".join(exons), "".join(parts), bounds


def test_find_hsps_exact(rng):
    g = _mk(rng, 2000)
    q = g[500:700]
    hsps = find_hsps(encode_dna(q), encode_dna(g))
    assert hsps
    best = max(hsps, key=lambda h: h.jscr)
    assert best.jy - best.jx == 500
    assert best.jlen >= 150


def test_chain_spans_intron(ctx, rng):
    q, g, bounds = _gene(rng, 2)
    chains = wilip(encode_dna(q), encode_dna(g), ipen=ctx.ipen)
    assert chains
    c = chains[0]
    assert len(c.hsps) >= 2
    q0, q1 = c.q_span
    assert q0 < 50 and q1 > len(q) - 50


def test_align_cdna_exact_boundaries(ctx, rng):
    q, g, bounds = _gene(rng, 3)
    flank = _mk(rng, 300)
    genome = flank + g + _mk(rng, 200)
    res = align_cdna(encode_dna(q), encode_dna(genome), ctx,
                     q_name="q", g_name="g", lanes=32)
    assert len(res) == 1
    gs = res[0]
    assert len(gs.introns) == 2
    for intr, (b0, b1) in zip(gs.introns, bounds):
        assert intr.g_start == 300 + b0
        assert intr.g_end == 300 + b1
        assert intr.canonical
    assert gs.identity == 1.0
    assert gs.coverage(len(q)) == 1.0


def test_align_reverse_strand(ctx, rng):
    """A true minus-strand gene: the gene (GT..AG introns in transcript
    orientation) is planted reverse-complemented, the sense cDNA maps to
    the '-' strand and the engine must evaluate splice signals in
    transcript orientation (the reference aligns reversed genes against
    the complemented segment; forward-strand dinucleotides read CT..AC
    and would force non-canonical junctions)."""
    q, g, bounds = _gene(rng, 2)
    rc_gene = decode_dna(comrev(encode_dna(g)))
    genome = _mk(rng, 150) + rc_gene + _mk(rng, 150)
    res = align_cdna(encode_dna(q), encode_dna(genome), ctx,
                     q_name="q", g_name="g", lanes=32)
    assert len(res) == 1
    gs = res[0]
    assert gs.strand == "-"
    assert len(gs.introns) == 1
    assert gs.introns[0].canonical
    assert gs.identity == 1.0
    # intron bounds in forward coords: gene occupies
    # [150, 150 + len(g)); transcript intron (b0, b1) maps to
    # (150 + len(g) - b1, 150 + len(g) - b0)
    b0, b1 = bounds[0]
    assert gs.introns[0].g_start == 150 + len(g) - b1
    assert gs.introns[0].g_end == 150 + len(g) - b0


def test_output_formats(ctx, rng):
    q, g, bounds = _gene(rng, 2)
    res = align_cdna(encode_dna(q), encode_dna(g), ctx, q_name="q1",
                     g_name="chr1", lanes=32)
    gs = res[0]
    gff = gff3_lines(gs)
    assert gff[0].split("\t")[2] == "gene"
    assert sum(1 for l in gff if "\texon\t" in l) == 2
    cig = gs.cigar()
    assert "N" in cig and "M" in cig
    sam = sam_line(gs)
    assert sam.split("\t")[5] == cig


def test_block_index_and_mapper(ctx, rng):
    contig = _mk(rng, 40000)
    q, g, bounds = _gene(rng, 3)
    pos = 15000
    contig = contig[:pos] + g + contig[pos + len(g):]
    store = GenomeStore.from_records(
        [SeqRecord("c1", encode_dna(contig), DNA)])
    idx = BlockIndex.build(store)
    mapper = GenomeMapper(store, idx, ctx)
    res = mapper.map_query(encode_dna(q), q_name="q", lanes=32)
    assert len(res) == 1
    gs = res[0]
    assert gs.g_name == "c1"
    assert gs.exons[0].g_start == pos
    assert len(gs.introns) == 2
    assert gs.identity == 1.0


def test_block_index_roundtrip(tmp_path, rng):
    contig = _mk(rng, 5000)
    store = GenomeStore.from_records(
        [SeqRecord("c1", encode_dna(contig), DNA)])
    idx = BlockIndex.build(store)
    idx.save(str(tmp_path / "db"))
    idx2 = BlockIndex.load(str(tmp_path / "db"))
    assert idx2.k == idx.k and idx2.blklen == idx.blklen
    assert (idx2.offsets == idx.offsets).all()
    assert (idx2.blocks == idx.blocks).all()


def test_mapper_no_hit(ctx, rng):
    contig = _mk(rng, 20000)
    store = GenomeStore.from_records(
        [SeqRecord("c1", encode_dna(contig), DNA)])
    idx = BlockIndex.build(store)
    mapper = GenomeMapper(store, idx, ctx)
    # a query with a different random seed: may vote weakly but must not
    # produce a high-coverage gene
    rng2 = np.random.default_rng(12345)
    q = _mk(rng2, 400)
    res = mapper.map_query(encode_dna(q), q_name="q", lanes=32,
                           min_coverage=0.5)
    assert res == [] or all(g.identity < 0.9 for g in res)
