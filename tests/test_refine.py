"""Boundary-refinement heuristics (fwd2s1.cc:2163-2404 equivalents)."""
import numpy as np
import pytest

from spaln_tpu.align.gene import Exon, GeneStructure, Intron
from spaln_tpu.align.refine import (micro_exon_scan, refine_first_exon,
                                    refine_last_exon)
from spaln_tpu.config import Config, resolve, CvsG
from spaln_tpu.ops.params import DpParams
from spaln_tpu.score.intron import IntronPenalty
from spaln_tpu.score.simmtx import Simmtx
from spaln_tpu.score.splice import build_splice_signals
from spaln_tpu.seq.codec import encode_dna

BASES = np.array(list("ACGT"))


@pytest.fixture(scope="module")
def cfg():
    return resolve(Config(), CvsG)


@pytest.fixture(scope="module")
def prm(cfg):
    return DpParams.build(cfg, Simmtx.dna(), CvsG,
                          ipen=IntronPenalty(cfg, CvsG))


def _mk(rng, n):
    return "".join(rng.choice(BASES, n))


def test_micro_exon_scan(cfg, prm, table_dir):
    rng = np.random.default_rng(21)
    """A 12-nt query piece planted mid-intron with AG..piece..GT context
    is found at the exact position; the skip option loses."""
    piece = _mk(rng, 12)
    left = _mk(rng, 60)
    right = _mk(rng, 60)
    g = (left + "GTAAGT" + _mk(rng, 120) + "TTACAG"
         + piece + "GTGAGT" + _mk(rng, 150) + "TTGCAG" + right)
    gc = encode_dna(g)
    sig = build_splice_signals(gc, cfg, table_dir)
    l = 60                      # donor right after the left exon
    r = len(left) + 6 + 120 + 6 + 12 + 6 + 150 + 6  # acceptor at right
    q = encode_dna(left + piece + right)
    res = micro_exon_scan(q, gc, sig, prm, 60, 72, l, r)
    assert res is not None
    score, p = res
    assert p == len(left) + 6 + 120 + 6    # exact planted position
    assert score > 0


def test_refine_first_exon(cfg, prm, table_dir):
    rng = np.random.default_rng(22)
    """An uncovered 15-nt query head becomes a planted first exon at the
    upstream donor-consistent position."""
    head = _mk(rng, 15)
    body = _mk(rng, 150)
    gap = 400
    g = (_mk(rng, 50) + head + "GTAAGT" + _mk(rng, gap) + "TTACAG"
         + body + _mk(rng, 40))
    gc = encode_dna(g)
    sig = build_splice_signals(gc, cfg, table_dir)
    q = encode_dna(head + body)
    b0 = 50 + 15 + 6 + gap + 6            # body genomic start
    gs = GeneStructure(
        score=10000,
        exons=[Exon(q_start=15, q_end=165, g_start=b0, g_end=b0 + 150,
                    mch=150)],
        introns=[], q_name="q", g_name="g")
    assert refine_first_exon(gs, q, gc, sig, prm)
    assert gs.exons[0].q_start == 0
    assert gs.exons[0].g_start == 50
    assert gs.introns[0].g_start == 65
    assert gs.introns[0].g_end == b0
    assert gs.introns[0].canonical


def test_refine_last_exon(cfg, prm, table_dir):
    rng = np.random.default_rng(23)
    """An uncovered 14-nt query tail becomes a planted last exon."""
    tail = _mk(rng, 14)
    body = _mk(rng, 150)
    gap = 350
    g = (_mk(rng, 40) + body + "GTAAGT" + _mk(rng, gap) + "TTACAG"
         + tail + _mk(rng, 60))
    gc = encode_dna(g)
    sig = build_splice_signals(gc, cfg, table_dir)
    q = encode_dna(body + tail)
    gs = GeneStructure(
        score=10000,
        exons=[Exon(q_start=0, q_end=150, g_start=40, g_end=190,
                    mch=150)],
        introns=[], q_name="q", g_name="g")
    assert refine_last_exon(gs, q, gc, sig, prm)
    assert gs.exons[-1].q_end == 164
    assert gs.exons[-1].g_start == 40 + 150 + 6 + gap + 6
    assert gs.introns[-1].canonical


def test_refine_noop_when_covered(cfg, prm, table_dir):
    rng = np.random.default_rng(24)
    """Fully covered queries are untouched."""
    body = _mk(rng, 120)
    gc = encode_dna(_mk(rng, 30) + body + _mk(rng, 30))
    sig = build_splice_signals(gc, cfg, table_dir)
    q = encode_dna(body)
    gs = GeneStructure(score=5000,
                       exons=[Exon(q_start=0, q_end=120, g_start=30,
                                   g_end=150, mch=120)],
                       introns=[], q_name="q", g_name="g")
    assert not refine_first_exon(gs, q, gc, sig, prm)
    assert not refine_last_exon(gs, q, gc, sig, prm)
    assert len(gs.exons) == 1


def test_refine_end_to_end(cfg, prm, table_dir):
    rng = np.random.default_rng(25)
    """align_cdna recovers a 15-nt first exon 2 kb upstream through the
    end-refinement post-pass (the banded DP alone cannot reach it)."""
    from spaln_tpu.align.driver import AlignerContext, align_cdna
    ctx = AlignerContext.create(table_dir)
    head = _mk(rng, 15)
    e2 = _mk(rng, 140)
    e3 = _mk(rng, 120)
    g = (_mk(rng, 80) + head + "GTAAGT" + _mk(rng, 2000) + "TTACAG"
         + e2 + "GTGAGT" + _mk(rng, 200) + "TTTCAG" + e3 + _mk(rng, 60))
    q = encode_dna(head + e2 + e3)
    res = align_cdna(q, encode_dna(g), ctx, q_name="q", g_name="g",
                     lanes=32)
    assert res
    gs = res[0]
    assert gs.exons[0].q_start == 0
    assert gs.exons[0].g_start == 80
    assert gs.exons[0].g_end == 95
    assert len(gs.introns) == 2
    assert gs.introns[0].canonical


def test_micro_exon_through_align_long(cfg, prm, table_dir):
    rng = np.random.default_rng(26)
    """A 15-nt micro exon inside a >BIG_GAP intron pair is recovered by
    the long-gap join (micro_exon fallback in _align_long)."""
    from spaln_tpu.align.driver import AlignerContext, align_cdna
    ctx = AlignerContext.create(table_dir)
    e1 = _mk(rng, 160)
    piece = _mk(rng, 15)
    e3 = _mk(rng, 170)
    i1 = "GTAAGT" + _mk(rng, 9000) + "TTACAG"
    i2 = "GTGAGT" + _mk(rng, 9500) + "TTTCAG"
    g = _mk(rng, 60) + e1 + i1 + piece + i2 + e3 + _mk(rng, 60)
    q = encode_dna(e1 + piece + e3)
    res = align_cdna(q, encode_dna(g), ctx, q_name="q", g_name="g",
                     lanes=32)
    assert res
    gs = res[0]
    mid = [e for e in gs.exons if 10 <= e.g_len <= 20]
    assert mid, [(e.g_start, e.g_end) for e in gs.exons]
    p0 = 60 + 160 + len(i1)
    assert mid[0].g_start == p0 and mid[0].g_end == p0 + 15
    assert len(gs.introns) == 2
    assert all(i.canonical for i in gs.introns)


def test_reclassify_intron_demoted_to_gap():
    """A DP-spliced horizontal run whose junction scores worse than an
    ordinary gap is reported as a genome insertion (skl_rngS_ng role)."""
    import numpy as np
    from spaln_tpu.align.gene import reclassify_introns

    class _Sig:
        sig5 = np.full(1000, -500, np.int32)

        @staticmethod
        def sig53_ie53(n5, n3):
            return -500

    class _Prm:
        @staticmethod
        def intron_table(n):
            return np.full(n, -400, np.int32)

        @staticmethod
        def gap_penalty(k):
            return 0 if k <= 0 else -80 - 30 * k

    ops = ([('D', m, m + 10) for m in range(1, 11)]
           + [('I', 10, 110, 140)]
           + [('D', m, m + 40) for m in range(11, 21)])
    out = reclassify_introns(ops, _Sig, _Prm)
    assert not any(o[0] == 'I' for o in out)
    assert len([o for o in out if o[0] == 'E']) == 30


def test_reclassify_strong_intron_kept():
    import numpy as np
    from spaln_tpu.align.gene import reclassify_introns

    class _Sig:
        sig5 = np.full(2000, 300, np.int32)

        @staticmethod
        def sig53_ie53(n5, n3):
            return 300

    class _Prm:
        @staticmethod
        def intron_table(n):
            return np.full(n, -200, np.int32)

        @staticmethod
        def gap_penalty(k):
            return 0 if k <= 0 else -80 - 30 * k

    ops = ([('D', m, m + 10) for m in range(1, 11)]
           + [('I', 10, 110, 1100)]
           + [('D', m, m + 1000) for m in range(11, 21)])
    out = reclassify_introns(ops, _Sig, _Prm)
    assert any(o[0] == 'I' for o in out)
