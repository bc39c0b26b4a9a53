import numpy as np

from spaln_tpu.align.gene import Exon, GeneStructure, Intron
from spaln_tpu.out.sortgrcd import (FilterParams, cluster_loci,
                                    locus_report, sort_records,
                                    unique_introns)


def _gs(q, chrom, strand, g0, g1, score=1000, mch=100, mmc=0, nexn=2,
        introns=()):
    ex = [Exon(q_start=0, q_end=50, g_start=g0, g_end=g0 + 50,
               mch=mch, mmc=mmc),
          Exon(q_start=50, q_end=100, g_start=g1 - 50, g_end=g1)]
    ints = [Intron(g_start=a, g_end=b, q_pos=50, canonical=c)
            for a, b, c in introns] or [
        Intron(g_start=g0 + 50, g_end=g1 - 50, q_pos=50)]
    return GeneStructure(score=score, exons=ex[:nexn], introns=ints,
                         q_name=q, g_name=chrom, strand=strand)


def test_cluster_overlap_chains():
    rs = [_gs("a", "c1", "+", 100, 500),
          _gs("b", "c1", "+", 450, 900),       # overlaps a -> same locus
          _gs("c", "c1", "+", 2000, 2400),     # separate
          _gs("d", "c1", "-", 120, 520),       # other strand -> separate
          _gs("e", "c2", "+", 100, 500)]       # other chrom
    loci = cluster_loci(rs)
    assert len(loci) == 4
    first = [l for l in loci if l.chrom == "c1" and l.strand == "+"
             and l.g_start == 100][0]
    assert len(first.members) == 2
    assert first.g_end == 900


def test_filters():
    good = _gs("a", "c1", "+", 100, 500, mch=100, mmc=0)
    bad = _gs("b", "c1", "+", 600, 900, mch=50, mmc=50)
    loci = cluster_loci([good, bad], filt=FilterParams(min_identity=0.9))
    names = [m.q_name for l in loci for m in l.members]
    assert names == ["a"]


def test_unique_introns_merge_shards():
    shard1 = [_gs("a", "c1", "+", 100, 500)]
    shard2 = [_gs("b", "c1", "+", 100, 500)]   # same intron coordinates
    ui = unique_introns(shard1 + shard2)
    assert len(ui) == 1
    assert ui[0][-1] == 2                      # support count 2


def test_report_markers():
    loci = cluster_loci([_gs("a", "c1", "+", 100, 500)])
    rep = locus_report(loci)
    assert rep[0].startswith("!")
    assert rep[1].startswith("@")


def test_sort_order():
    rs = [_gs("x", "c2", "+", 10, 60),
          _gs("y", "c1", "+", 50, 100),
          _gs("z", "c1", "+", 10, 60)]
    srt = sort_records(rs)
    assert [g.q_name for g in srt] == ["z", "y", "x"]


def _mk_gs(chrom, strand, g0, g1, nexn=2, score=1000, bmmc=0, bunp=0,
           canonical=True, q="q"):
    from spaln_tpu.align.gene import Exon, Intron, GeneStructure
    w = (g1 - g0) // nexn
    exons = [Exon(q_start=i * 10, q_end=(i + 1) * 10,
                  g_start=g0 + i * w, g_end=g0 + i * w + 10,
                  mch=10, bmmc=bmmc, bunp=bunp) for i in range(nexn)]
    intr = [Intron(g_start=exons[i].g_end, g_end=exons[i + 1].g_start,
                   q_pos=exons[i].q_end, canonical=canonical)
            for i in range(nexn - 1)]
    return GeneStructure(score=score, exons=exons, introns=intr,
                         q_name=q, g_name=chrom, strand=strand)


def test_sort_orders():
    """-S a|b|c|r chromosome orders (sortgrcd.cc:42, 66-67)."""
    from spaln_tpu.out.sortgrcd import sort_records
    recs = [_mk_gs("chr2", "+", 0, 100, q="a"),
            _mk_gs("chr1", "+", 0, 100, q="b"),
            _mk_gs("chr2", "+", 200, 300, q="c"),
            _mk_gs("chr1", "-", 400, 500, q="d"),
            _mk_gs("chr1", "-", 100, 200, q="e")]
    alpha = sort_records(recs, "a")
    assert [g.g_name for g in alpha] == ["chr1"] * 3 + ["chr2"] * 2
    byab = sort_records(recs, "b")
    assert byab[0].g_name == "chr1"          # 3 records > 2
    byapp = sort_records(recs, "c", appearance=["chr2", "chr1"])
    assert byapp[0].g_name == "chr2"
    rev = sort_records(recs, "r")
    minus = [g for g in rev if g.strand == "-"]
    assert minus[0].g_span[0] == 400         # reverse-minus: descending


def test_boundary_quality_filters():
    """-m/-u terminal-exon trimming + per-gene Bmmc/Bunp and -F presets
    (sortgrcd.cc:56-64, 233-268)."""
    from spaln_tpu.out.sortgrcd import (FilterParams, passes,
                                        trim_terminal_exons)
    good = _mk_gs("c", "+", 0, 300, nexn=3)
    good.exons[0].bmmc = 9                    # sloppy first exon
    fp = FilterParams.preset(2)               # bmmc limit 3
    trim_terminal_exons(good, fp)
    assert len(good.exons) == 2               # first exon dropped
    assert len(good.introns) == 1
    # per-gene totals: Bmmc preset-2 limit is 6
    bad = _mk_gs("c", "+", 0, 300, nexn=3, bmmc=4)   # total 12 > 6
    assert not passes(bad, 0, fp)
    ok = _mk_gs("c", "+", 0, 300, nexn=3)
    assert passes(ok, 0, fp)
    # non-canonical terminal junction trimmed under ncan<3
    nc = _mk_gs("c", "+", 0, 300, nexn=3, canonical=False)
    trim_terminal_exons(nc, fp)
    assert len(nc.exons) == 1
