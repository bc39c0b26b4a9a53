"""Long genomic-segment annotation: chunk + overlap + seam dedup
(g_segment/HalfGene mechanism, spaln.cc:1276-1361)."""
import numpy as np
import pytest

from spaln_tpu.align.driver import AlignerContext
from spaln_tpu.align.segment import annotate_segment, _chunks
from spaln_tpu.seq.codec import encode_dna


@pytest.fixture(scope="module")
def ctx(table_dir):
    return AlignerContext.create(table_dir)


def _mk(rng, n):
    return "".join(rng.choice(np.array(list("ACGT")), n))


def test_chunk_spans():
    spans = _chunks(100, 40, 10)
    assert spans[0] == (0, 40)
    assert spans[-1][1] == 100
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert b0 == a1 - 10


def test_annotate_segment_with_seam(ctx, rng):
    """Genes on both sides of (and straddling) a chunk seam are each
    reported exactly once with full structure."""
    chunk, ov = 30000, 6000
    genes, qs, positions = [], [], []
    segs = []
    pos = 0
    for gpos in (5000, 27500, 52000):   # middle one straddles the seam
        segs.append(_mk(rng, gpos - pos))
        e1, e2 = _mk(rng, 150), _mk(rng, 140)
        ilen = 220
        g = e1 + "GTAAGT" + _mk(rng, ilen - 13) + "TTTCTAG" + e2
        segs.append(g)
        qs.append(encode_dna(e1 + e2))
        positions.append(gpos)
        pos = gpos + len(g)
    segs.append(_mk(rng, 60000 - pos))
    genome = encode_dna("".join(segs))
    res = annotate_segment(genome, qs, ctx=ctx,
                           q_names=[f"q{i}" for i in range(3)],
                           g_name="seg", lanes=32, chunk=chunk,
                           overlap=ov)
    assert len(res) == 3
    for gs, pos, q in zip(res, positions, qs):
        assert gs.g_span[0] == pos
        assert len(gs.introns) == 1
        assert gs.identity == 1.0
        assert gs.coverage(len(q)) == 1.0
