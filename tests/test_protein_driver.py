"""End-to-end protein -> genome spliced alignment (Aln2h1 driver role)."""
import numpy as np
import pytest

from spaln_tpu import constants as K
from spaln_tpu.align.protein_driver import (ProteinAlignerContext,
                                            align_protein,
                                            find_hsps_protein,
                                            wilip_protein)
from spaln_tpu.seq.codec import encode_dna, comrev

_CODON = {}
for _i in range(64):
    _aa = int(K.GENCODE[_i])
    _CODON.setdefault(_aa, "ACGT"[(_i >> 4) & 3] + "ACGT"[(_i >> 2) & 3]
                      + "ACGT"[_i & 3])
AA_CODES = list(range(3, 23))


@pytest.fixture(scope="module")
def pctx(table_dir):
    return ProteinAlignerContext.create(table_dir)


def _bt(aa):
    return "".join(_CODON[int(x)] for x in aa)


def _mk(rng, n):
    return "".join(rng.choice(np.array(list("ACGT")), n))


def _gene(rng, n_aa=(40, 35, 30), phases=(0, 0)):
    """Protein + genomic sequence with introns at given codon phases."""
    aas = [rng.choice(AA_CODES, n).astype(np.int8) for n in n_aa]
    prot = np.concatenate(aas)
    nt = _bt(prot)
    cuts = []
    p = 0
    for n, phs in zip(n_aa[:-1], phases):
        p += 3 * n
        cuts.append(p + (phs if phs >= 0 else phs))
    parts = []
    bounds = []
    prev = 0
    gpos = 0
    for c in cuts:
        parts.append(nt[prev:c])
        gpos += c - prev
        ilen = int(rng.integers(90, 300))
        parts.append("GTAAGT" + _mk(rng, ilen - 13) + "TTTCTAG")
        bounds.append((gpos, gpos + ilen))
        gpos += ilen
        prev = c
    parts.append(nt[prev:])
    return prot, "".join(parts), bounds


def test_find_hsps_protein_frames(pctx, rng):
    aa = rng.choice(AA_CODES, 60).astype(np.int8)
    for frame in range(3):
        g = encode_dna(_mk(rng, 200 + frame) + _bt(aa) + _mk(rng, 150))
        hsps = find_hsps_protein(aa, g, pctx.pmtx)
        assert hsps, f"frame {frame}"
        best = max(hsps, key=lambda h: h.jscr)
        assert best.jy - best.jx == 200 + frame
        assert best.jlen >= 150


def test_wilip_protein_chains_introns(pctx, rng):
    prot, g, bounds = _gene(rng, (50, 45), (0,))
    chains = wilip_protein(prot, encode_dna(g), pctx.pmtx, ipen=pctx.ipen)
    assert chains
    assert len(chains[0].hsps) >= 2


@pytest.mark.parametrize("phases", [(0, 0), (1, 0), (0, 2), (2, 1)])
def test_align_protein_exact(pctx, rng, phases):
    prot, g, bounds = _gene(rng, (40, 35, 30), phases)
    flank = _mk(rng, 150)
    genome = encode_dna(flank + g + _mk(rng, 120))
    res = align_protein(prot, genome, pctx, q_name="p", g_name="g",
                        lanes=32)
    assert len(res) == 1
    gs = res[0]
    assert gs.strand == "+"
    assert len(gs.introns) == 2
    for intr, (b0, b1) in zip(gs.introns, bounds):
        assert intr.g_start == 150 + b0
        assert intr.g_end == 150 + b1
        assert intr.canonical
    # free-end + translation-signal reseeding may shave or frameshift a
    # residue or two at the termini (initH_ng sigS reseeds,
    # fwd2h1.cc:153-183); introns above stay exact
    # 0.97: the first/last-exon terminal machinery may pull 1-2
    # residues into a signal-anchored terminal exon (mismatch-
    # bearing, reference semantics) on synthetic windows
    assert gs.identity > 0.97
    assert gs.coverage(len(prot)) > 0.95


def test_align_protein_reverse_strand(pctx, rng):
    prot, g, bounds = _gene(rng, (45, 40), (0,))
    genome = encode_dna(_mk(rng, 100) + g + _mk(rng, 100))
    rc = comrev(genome)
    res = align_protein(prot, rc, pctx, q_name="p", g_name="g", lanes=32)
    assert len(res) == 1
    gs = res[0]
    assert gs.strand == "-"
    assert len(gs.introns) == 1
    # forward-strand coords of the (reverse-complemented) gene
    N = len(genome)
    b0, b1 = bounds[0]
    assert gs.introns[0].g_start == N - (100 + b1)
    assert gs.introns[0].g_end == N - (100 + b0)
    assert gs.identity == 1.0


def test_protein_block_index_and_mapper(pctx, rng):
    from spaln_tpu.align.mapper import ProteinGenomeMapper
    from spaln_tpu.seed.blockindex import ProteinBlockIndex
    from spaln_tpu.seq.fasta import SeqRecord
    from spaln_tpu.seq.genome import GenomeStore
    from spaln_tpu.constants import DNA
    contig = _mk(rng, 30000)
    prot, g, bounds = _gene(rng, (45, 40), (0,))
    pos = 12000
    contig = contig[:pos] + g + contig[pos + len(g):]
    store = GenomeStore.from_records(
        [SeqRecord("c1", encode_dna(contig), DNA)])
    idx = ProteinBlockIndex.build(store)
    mapper = ProteinGenomeMapper(store, idx, pctx)
    res = mapper.map_query(prot, q_name="p", lanes=32)
    assert len(res) == 1
    gs = res[0]
    assert gs.strand == "+"
    assert len(gs.introns) == 1
    assert gs.introns[0].g_start == pos + bounds[0][0]
    assert gs.introns[0].g_end == pos + bounds[0][1]
    # 0.97: the first/last-exon terminal machinery may pull 1-2
    # residues into a signal-anchored terminal exon (mismatch-
    # bearing, reference semantics) on synthetic windows
    assert gs.identity > 0.97


def test_protein_index_reverse_strand(pctx, rng):
    from spaln_tpu.align.mapper import ProteinGenomeMapper
    from spaln_tpu.seed.blockindex import ProteinBlockIndex
    from spaln_tpu.seq.fasta import SeqRecord
    from spaln_tpu.seq.genome import GenomeStore
    from spaln_tpu.seq.codec import decode_dna
    from spaln_tpu.constants import DNA
    contig = _mk(rng, 20000)
    prot, g, bounds = _gene(rng, (45, 40), (0,))
    rc_gene = decode_dna(comrev(encode_dna(g)))
    pos = 8000
    contig = contig[:pos] + rc_gene + contig[pos + len(rc_gene):]
    store = GenomeStore.from_records(
        [SeqRecord("c1", encode_dna(contig), DNA)])
    idx = ProteinBlockIndex.build(store)
    mapper = ProteinGenomeMapper(store, idx, pctx)
    res = mapper.map_query(prot, q_name="p", lanes=32)
    assert len(res) == 1
    gs = res[0]
    assert gs.strand == "-"
    assert len(gs.introns) == 1
    # 0.97: the first/last-exon terminal machinery may pull 1-2
    # residues into a signal-anchored terminal exon (mismatch-
    # bearing, reference semantics) on synthetic windows
    assert gs.identity > 0.97


def test_protein_index_roundtrip(tmp_path, rng):
    from spaln_tpu.seed.blockindex import ProteinBlockIndex
    from spaln_tpu.seq.fasta import SeqRecord
    from spaln_tpu.seq.genome import GenomeStore
    from spaln_tpu.constants import DNA
    contig = _mk(rng, 6000)
    store = GenomeStore.from_records(
        [SeqRecord("c1", encode_dna(contig), DNA)])
    idx = ProteinBlockIndex.build(store)
    idx.save(str(tmp_path / "db"))
    idx2 = ProteinBlockIndex.load(str(tmp_path / "db"))
    assert idx2.k == idx.k
    assert (idx2.offsets == idx.offsets).all()
    assert (idx2.blocks == idx.blocks).all()


def test_protein_map_queries_batched(pctx):
    """Batched aa mapping == singles (the bucketed execute_tron_jobs
    path vs one-at-a-time), mixed strands and gene sizes."""
    from spaln_tpu.align.mapper import ProteinGenomeMapper
    from spaln_tpu.seed.blockindex import ProteinBlockIndex
    from spaln_tpu.seq.fasta import SeqRecord
    from spaln_tpu.seq.genome import GenomeStore
    from spaln_tpu.seq.codec import decode_dna
    from spaln_tpu.constants import DNA
    rng = np.random.default_rng(777)
    contig = _mk(rng, 60000)
    prots = []
    pos = 5000
    for gi in range(4):
        prot, g, bounds = _gene(rng, (40 + 3 * gi, 35), (0,))
        if gi % 2:
            g = decode_dna(comrev(encode_dna(g)))
        contig = contig[:pos] + g + contig[pos + len(g):]
        prots.append(prot)
        pos += len(g) + 8000
    store = GenomeStore.from_records(
        [SeqRecord("c1", encode_dna(contig), DNA)])
    idx = ProteinBlockIndex.build(store)
    mapper = ProteinGenomeMapper(store, idx, pctx)
    batched = mapper.map_queries(prots, q_names=[f"p{i}" for i in
                                                 range(len(prots))],
                                 lanes=32, max_batch=4)
    for gi, (prot, gs_list) in enumerate(zip(prots, batched)):
        single = mapper.map_query(prot, q_name=f"p{gi}", lanes=32)
        assert len(gs_list) == len(single) == 1
        b, s = gs_list[0], single[0]
        assert b.strand == s.strand == ("-" if gi % 2 else "+")
        assert [(e.g_start, e.g_end) for e in b.exons] == \
            [(e.g_start, e.g_end) for e in s.exons]
        assert b.score == s.score
        assert b.identity > 0.97
