"""Spaced seeds (Bitpat / WlnDefBitPat) and matrix HSP evaluation."""
import numpy as np

from spaln_tpu.seed.wilip import find_hsps, wilip, WLN_DEF_BITPAT
from spaln_tpu.seq.codec import encode_dna

BASES = "ACGT"


def _mutate_every(s, stride, phase):
    out = list(s)
    for i in range(phase, len(s), stride):
        out[i] = BASES[(BASES.index(out[i]) + 1) % 4]
    return "".join(out)


def test_spaced_seed_survives_periodic_divergence(rng):
    """Every-5th-base divergence kills all contiguous 8-mers (runs of 4)
    but the weight-8/width-12 spaced seed (zeros at offsets 2,3,5,8)
    still fires — the sensitivity win spaced seeds exist for."""
    q = "".join(rng.choice(list(BASES), 400))
    g = _mutate_every(q, 5, 4)
    qc, gc = encode_dna(q), encode_dna(g)
    assert WLN_DEF_BITPAT[8] == "110010110111"
    assert not find_hsps(qc, gc, level=0, spaced=False)
    sp = find_hsps(qc, gc, level=0, spaced=True)
    assert sp
    h = max(sp, key=lambda h: h.jscr)
    assert h.diag == 0 and h.jlen > 50


def test_hsp_matrix_eval(rng):
    """HSP scores use the substitution matrix when given (Wlp::eval)."""
    from spaln_tpu.score.simmtx import Simmtx
    sm = Simmtx.dna()
    q = "".join(rng.choice(list(BASES), 100))
    qc = encode_dna(q)
    hs = find_hsps(qc, qc, level=0, mtx=sm.mtx)
    assert hs
    h = max(hs, key=lambda h: h.jscr)
    expect = int(sm.mtx[qc[h.jx:h.jx + h.jlen],
                        qc[h.jy:h.jy + h.jlen]].sum())
    assert h.jscr == expect


def test_wilip_spaced_fallback(rng):
    """wilip(spaced=True) falls back to the contiguous coarse level so
    spaced mode never loses chains the plain mode would find."""
    q = "".join(rng.choice(list(BASES), 200))
    qc = encode_dna(q)
    plain = wilip(qc, qc, level=0, spaced=False)
    sp = wilip(qc, qc, level=0, spaced=True)
    assert plain and sp
    assert sp[0].g_span == plain[0].g_span


def test_reduced_alphabet_tables():
    """SEB6/Dayh6 reduced alphabets + g2r codon tables (ReducWord,
    bitpat.cc:25-90)."""
    from spaln_tpu.seed.reduc import reduc_table, g2r_tables, DAYH6
    from spaln_tpu.seq.codec import encode_protein
    t6, n6 = reduc_table(6)
    assert n6 == 6
    grp = lambda ch: int(t6[int(encode_protein(ch)[0])])
    # SEB6 groups: ASJT | CP | DEHKNQR | FWY | G | ILMV
    assert grp("A") == grp("S") == grp("T")
    assert grp("C") == grp("P") != grp("A")
    assert grp("I") == grp("L") == grp("M") == grp("V")
    assert grp("G") not in (grp("A"), grp("C"), grp("I"))
    td, nd = reduc_table(6, DAYH6)
    assert nd == 5 or nd == 6          # Dayh6: 5 real + ambiguity
    g2r, g2rc = g2r_tables(6)
    # codon GGG (2,2,2) -> Gly group; stops -> -1
    ggg = (2 << 4) | (2 << 2) | 2
    assert g2r[ggg] == grp("G")
    taa = (3 << 4) | (0 << 2) | 0
    assert g2r[taa] == -1
    # reverse-complement consistency: g2rc[codon] == g2r[revcomp codon]
    for g in (0, 17, 33, 63):
        f, s, t = (g >> 4) & 3, (g >> 2) & 3, g & 3
        rc = ((3 - t) << 4) | ((3 - s) << 2) | (3 - f)
        assert g2rc[g] == g2r[rc]


def test_protein_index_seb6(rng):
    """A 6-letter index finds a diverged protein's locus where wobble
    divergence is invisible to the reduced classes."""
    from spaln_tpu.seed.blockindex import ProteinBlockIndex
    from spaln_tpu.seq.genome import GenomeStore
    from spaln_tpu.seq.fasta import SeqRecord
    from spaln_tpu.seq.codec import encode_protein
    from spaln_tpu.constants import DNA
    # genome: a coding region back-translated from a random protein
    AAS = list("ARNDCQEGHILKMFPSTWYV")
    CODON = {"A": "GCT", "R": "CGT", "N": "AAT", "D": "GAT", "C": "TGT",
             "Q": "CAA", "E": "GAA", "G": "GGT", "H": "CAT", "I": "ATT",
             "L": "CTT", "K": "AAA", "M": "ATG", "F": "TTT", "P": "CCT",
             "S": "TCT", "T": "ACT", "W": "TGG", "Y": "TAT", "V": "GTT"}
    prot = "".join(rng.choice(AAS, 80))
    cds = "".join(CODON[c] for c in prot)
    g = ("".join(rng.choice(list("ACGT"), 3000)) + cds
         + "".join(rng.choice(list("ACGT"), 3000)))
    from spaln_tpu.seq.codec import encode_dna
    store = GenomeStore.from_records(
        [SeqRecord(name="c", codes=encode_dna(g), molc=DNA)])
    idx = ProteinBlockIndex.build(store, nalpha=6, blklen=512)
    assert idx.nalpha == 6
    # conservative substitutions within SEB6 groups (I<->V, D<->E, S<->T)
    sub = {"I": "V", "V": "I", "D": "E", "E": "D", "S": "T", "T": "S"}
    q = "".join(sub.get(c, c) for c in prot)
    cands = idx.candidate_ranges(encode_protein(q))
    assert cands
    g0, g1, _ = cands[0]
    assert g0 <= 3000 and g1 >= 3000 + len(cds)
    # round-trip persistence keeps the alphabet
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        idx.save(os.path.join(td, "x"))
        idx2 = ProteinBlockIndex.load(os.path.join(td, "x"))
        assert idx2.nalpha == 6 and idx2.k == idx.k


def test_protein_index_orf_filter():
    rng = np.random.default_rng(31)
    """-KP ORF filter (MinOrf, blksrc.cc:70): words in stop-riddled
    frames never enter the index, shrinking it without losing a real
    coding region."""
    from spaln_tpu.seed.blockindex import ProteinBlockIndex
    from spaln_tpu.seq.genome import GenomeStore
    from spaln_tpu.seq.fasta import SeqRecord
    from spaln_tpu.seq.codec import encode_dna, encode_protein
    from spaln_tpu.constants import DNA
    AAS = list("ARNDCQEGHILKMFPSTWYV")
    CODON = {"A": "GCT", "R": "CGT", "N": "AAT", "D": "GAT", "C": "TGT",
             "Q": "CAA", "E": "GAA", "G": "GGT", "H": "CAT", "I": "ATT",
             "L": "CTT", "K": "AAA", "M": "ATG", "F": "TTT", "P": "CCT",
             "S": "TCT", "T": "ACT", "W": "TGG", "Y": "TAT", "V": "GTT"}
    prot = "".join(rng.choice(AAS, 60))
    cds = "".join(CODON[c] for c in prot)
    # A/T-only junk: 1/8 of codons are TAA stops in every frame and
    # strand, so mean junk ORF length is ~8 codons < MinOrf/3
    junk = "".join(rng.choice(list("AT"), 3000))
    g = junk + cds + junk
    store = GenomeStore.from_records(
        [SeqRecord(name="c", codes=encode_dna(g), molc=DNA)])
    filt = ProteinBlockIndex.build(store, blklen=256, min_orf=60)
    nofilt = ProteinBlockIndex.build(store, blklen=256, min_orf=0)
    assert len(filt.blocks) < 0.7 * len(nofilt.blocks)
    cands = filt.candidate_ranges(encode_protein(prot))
    assert cands
    g0, g1, _ = cands[0]
    assert g0 <= len(junk) and g1 >= len(junk) + len(cds)
