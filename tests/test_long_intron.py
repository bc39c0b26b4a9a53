"""Long-intron path: segment split + closed-form splice join keeps the
band bounded by exon geometry, not intron length (interpolateS /
indelfreespjS role, fwd2s1.cc:2003-2162)."""
import numpy as np
import pytest

from spaln_tpu.align.driver import (AlignerContext, align_cdna, BIG_GAP,
                                    _splice_join)
from spaln_tpu.score.splice import build_splice_signals
from spaln_tpu.seq.codec import encode_dna


@pytest.fixture(scope="module")
def ctx(table_dir):
    return AlignerContext.create(table_dir)


def _mk(rng, n):
    return "".join(rng.choice(np.array(list("ACGT")), n))


def test_splice_join_picks_planted_site(ctx, rng):
    e1, e2 = _mk(rng, 120), _mk(rng, 130)
    ilen = 5000
    g = e1 + "GTAAGT" + _mk(rng, ilen - 13) + "TTTCTAG" + e2
    q = encode_dna(e1 + e2)
    gc = encode_dna(g)
    sig = build_splice_signals(gc, ctx.cfg, ctx.tables)
    jn = _splice_join(q, gc, sig, ctx.prm, d1=0, d2=ilen,
                      m_lo=100, m_hi=140)
    assert jn is not None
    m, gain, n5, n3 = jn
    assert (m, n5, n3) == (120, 120, 120 + ilen)


def test_align_cdna_long_intron(ctx, rng):
    """A gene with one intron far above BIG_GAP aligns exactly without a
    giant band."""
    e1, e2, e3 = _mk(rng, 150), _mk(rng, 140), _mk(rng, 160)
    i1 = BIG_GAP + 4000
    i2 = 300
    g = (e1 + "GTAAGT" + _mk(rng, i1 - 13) + "TTTCTAG"
         + e2 + "GTGAGT" + _mk(rng, i2 - 13) + "TTTACAG" + e3)
    flank = _mk(rng, 200)
    genome = encode_dna(flank + g + _mk(rng, 200))
    q = encode_dna(e1 + e2 + e3)
    res = align_cdna(q, genome, ctx, q_name="q", g_name="g", lanes=32)
    assert len(res) == 1
    gs = res[0]
    assert len(gs.introns) == 2
    assert gs.introns[0].g_start == 200 + 150
    assert gs.introns[0].g_end == 200 + 150 + i1
    assert gs.introns[0].canonical
    assert gs.introns[1].g_start == 200 + 150 + i1 + 140
    assert gs.introns[1].g_end == 200 + 150 + i1 + 140 + i2
    assert gs.identity == 1.0
    assert gs.coverage(len(q)) == 1.0
    assert gs.score > 0
