"""Tests of the scalar spliced-DP oracle (the spec engine)."""
import numpy as np
import pytest

from spaln_tpu.config import Config, resolve, CvsG
from spaln_tpu.ops.params import DpParams, DpFlags
from spaln_tpu.ops.dp_spliced_ref import (forward_spliced_ref,
                                          traceback_spliced_ref, Window)
from spaln_tpu.score.intron import IntronPenalty
from spaln_tpu.score.simmtx import Simmtx
from spaln_tpu.score.splice import build_splice_signals
from spaln_tpu.seq.codec import encode_dna


@pytest.fixture(scope="module")
def cfg():
    return resolve(Config(), CvsG)


@pytest.fixture(scope="module")
def prm(cfg):
    return DpParams.build(cfg, Simmtx.dna(), CvsG,
                          ipen=IntronPenalty(cfg, CvsG))


def test_exact_match_ungapped(cfg, prm):
    q = encode_dna("ACGTACGTACGTACGTACGT")
    score, em, en, tb = forward_spliced_ref(q, q, prm)
    assert score == 20 * 20              # 20 matches x (+2 x10)
    assert (em, en) == (20, 20)
    ops = traceback_spliced_ref(tb, em, en)
    assert all(o[0] == 'D' for o in ops) and len(ops) == 20


def test_substitution(cfg, prm):
    q = encode_dna("ACGTACGTACGTACGTACGT")
    g = encode_dna("ACGTACGTATGTACGTACGT")   # one C->T mismatch
    score, em, en, tb = forward_spliced_ref(q, g, prm)
    assert score == 19 * 20 - 60


def test_simple_deletion_gap(cfg, prm):
    # genome has 3 extra bases -> E-gap of 3 (below intron llmt)
    q = encode_dna("ACGTACGTACGTACGTACGT")
    g = encode_dna("ACGTACGTAC" + "TTT" + "GTACGTACGT")
    score, em, en, tb = forward_spliced_ref(q, g, prm)
    assert score == 20 * 20 + prm.gop + 3 * prm.gep
    ops = traceback_spliced_ref(tb, em, en)
    kinds = [o[0] for o in ops]
    assert kinds.count('E') == 3
    assert kinds.count('D') == 20


def test_insertion_gap(cfg, prm):
    # query has 2 extra bases -> F-gap
    q = encode_dna("ACGTACGTAC" + "AA" + "GTACGTACGT")
    g = encode_dna("ACGTACGTACGTACGTACGT")
    score, em, en, tb = forward_spliced_ref(q, g, prm)
    assert score == 20 * 20 + prm.gop + 2 * prm.gep
    ops = traceback_spliced_ref(tb, em, en)
    assert [o[0] for o in ops].count('F') == 2


def _planted_gene(rng, exon_lens=(60, 80), intron_len=200):
    """Build (query, genome, intron_bounds): exons concatenated = query;
    genome = exon1 + GT..intron..AG + exon2."""
    bases = np.array(list("ACGT"))
    exons = ["".join(rng.choice(bases, L)) for L in exon_lens]
    mid = "".join(rng.choice(bases, intron_len - 13))
    intron = "GTAAGT" + mid + "TTTTTAG"
    assert len(intron) == intron_len
    q = "".join(exons)
    g = exons[0] + intron + exons[1]
    n5 = len(exons[0])
    n3 = n5 + intron_len
    return q, g, (n5, n3)


def test_planted_intron_found(cfg, prm, table_dir, rng):
    q, g, (n5, n3) = _planted_gene(rng)
    qc, gc = encode_dna(q), encode_dna(g)
    sig = build_splice_signals(gc, cfg, table_dir)
    assert sig.is_donor[n5] and sig.is_accpt[n3]
    score, em, en, tb = forward_spliced_ref(qc, gc, prm, sig=sig)
    ops = traceback_spliced_ref(tb, em, en)
    introns = [o for o in ops if o[0] == 'I']
    assert len(introns) == 1
    assert introns[0][2] == n5 and introns[0][3] == n3
    # the spliced score must beat treating the intron as a plain gap
    plain = 140 * 20 + prm.gop + 200 * prm.gep
    assert score > plain


def test_planted_two_introns(cfg, prm, table_dir, rng):
    bases = np.array(list("ACGT"))
    e1 = "".join(rng.choice(bases, 50))
    e2 = "".join(rng.choice(bases, 70))
    e3 = "".join(rng.choice(bases, 40))
    i1 = "GTAAGT" + "".join(rng.choice(bases, 100)) + "TTTCTAG"
    i2 = "GTGAGT" + "".join(rng.choice(bases, 150)) + "TTTTCAG"
    q = e1 + e2 + e3
    g = e1 + i1 + e2 + i2 + e3
    qc, gc = encode_dna(q), encode_dna(g)
    sig = build_splice_signals(gc, cfg, table_dir)
    score, em, en, tb = forward_spliced_ref(qc, gc, prm, sig=sig)
    ops = traceback_spliced_ref(tb, em, en)
    introns = [(o[2], o[3]) for o in ops if o[0] == 'I']
    assert introns == [(50, 50 + 113), (163 + 70, 163 + 70 + 163)]


def test_band_restricts_but_same_result(cfg, prm, table_dir, rng):
    q, g, (n5, n3) = _planted_gene(rng, exon_lens=(40, 50), intron_len=120)
    qc, gc = encode_dna(q), encode_dna(g)
    sig = build_splice_signals(gc, cfg, table_dir)
    s_full, em, en, tb = forward_spliced_ref(qc, gc, prm, sig=sig)
    wdw = Window.stripe(len(qc), len(gc), sh=100)
    s_band, em2, en2, tb2 = forward_spliced_ref(qc, gc, prm, sig=sig,
                                                wdw=wdw)
    assert s_full == s_band and (em, en) == (em2, en2)


def test_semi_global_flanks(cfg, prm, table_dir, rng):
    """Query maps inside a larger genomic window; flanks are free."""
    bases = np.array(list("ACGT"))
    flank5 = "".join(rng.choice(bases, 30))
    flank3 = "".join(rng.choice(bases, 25))
    q, g0, (n5, n3) = _planted_gene(rng, exon_lens=(50, 50), intron_len=100)
    g = flank5 + g0 + flank3
    qc, gc = encode_dna(q), encode_dna(g)
    sig = build_splice_signals(gc, cfg, table_dir)
    score, em, en, tb = forward_spliced_ref(qc, gc, prm, sig=sig)
    ops = traceback_spliced_ref(tb, em, en)
    introns = [o for o in ops if o[0] == 'I']
    assert len(introns) == 1
    assert introns[0][2] == 30 + n5 and introns[0][3] == 30 + n3
    d_ops = [o for o in ops if o[0] == 'D']
    assert d_ops[0][2] == 31                 # first match at genome pos 31
    assert en == len(g) - 25
