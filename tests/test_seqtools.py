"""Sequence toolbox + divergence estimators (utn/dvn/divseq/montseq
roles)."""
import math

import numpy as np
import pytest

from spaln_tpu.seq.codec import encode_dna, encode_protein, comrev
from spaln_tpu.seq.utilseq import rm_polya, find_orfs, composition
from spaln_tpu.tools.divergence import (jukes_cantor, kimura_2p,
                                        p_distance, poisson_aa,
                                        kimura_aa, random_seq)


def _mk(rng, n):
    return "".join(rng.choice(np.array(list("ACGT")), n))


def test_rm_polya_tail(rng):
    body = _mk(rng, 200)
    q = encode_dna(body + "A" * 30)
    lo, hi, hint = rm_polya(q)
    assert hint == 1
    assert abs(hi - 200) <= 3
    assert lo == 0


def test_rm_polyt_head(rng):
    body = _mk(rng, 200)
    q = encode_dna("T" * 25 + body)
    lo, hi, hint = rm_polya(q)
    assert hint == 2
    assert abs(lo - 25) <= 3
    assert hi == len(q)


def test_rm_polya_none(rng):
    q = encode_dna(_mk(rng, 300))
    lo, hi, hint = rm_polya(q)
    assert (lo, hi, hint) == (0, len(q), 3)


def test_find_orfs(rng):
    # ATG + 60 stop-free codons + TAA
    inner = "GCT" * 60
    g = encode_dna(_mk(rng, 7) + "ATG" + inner + "TAA" + _mk(rng, 11))
    orfs = find_orfs(g, min_len=150)
    assert orfs
    b0, b1, frame, strand = orfs[0]
    assert b1 - b0 >= 180


def test_composition():
    c = composition(encode_dna("AACCGGTT"))
    assert c == {"A": 2, "C": 2, "G": 2, "T": 2}


def test_divergence_known_rates(rng):
    n = 30000
    a = random_seq(rng, n)
    b = a.copy()
    # 10% random substitutions
    k = n // 10
    pos = rng.choice(n, k, replace=False)
    b[pos] = random_seq(rng, k)
    p = p_distance(a, b)
    assert 0.05 < p < 0.11
    jc = jukes_cantor(a, b)
    assert jc > p                       # correction increases distance
    k2 = kimura_2p(a, b)
    assert abs(k2 - jc) < 0.05
    assert jukes_cantor(a, a) == 0.0


def test_protein_distances(rng):
    a = random_seq(rng, 5000, is_aa=True)
    b = a.copy()
    pos = rng.choice(5000, 500, replace=False)
    b[pos] = random_seq(rng, 500, is_aa=True)
    p = p_distance(a, b, is_aa=True)
    assert 0.05 < p < 0.12
    assert poisson_aa(a, b) > p
    assert kimura_aa(a, b) >= poisson_aa(a, b) * 0.9


def test_mapper_trims_polya(rng, table_dir):
    """Poly-A tails do not drag alignments (rmpolyA before mapping,
    spaln.cc:1154)."""
    from spaln_tpu.align.driver import AlignerContext
    from spaln_tpu.align.mapper import GenomeMapper
    from spaln_tpu.seed.blockindex import BlockIndex
    from spaln_tpu.seq.fasta import SeqRecord
    from spaln_tpu.seq.genome import GenomeStore
    from spaln_tpu.constants import DNA
    ctx = AlignerContext.create(table_dir)
    contig = _mk(rng, 25000)
    e1, e2 = _mk(rng, 140), _mk(rng, 130)
    ilen = 250
    gene = e1 + "GTAAGT" + _mk(rng, ilen - 13) + "TTTCTAG" + e2
    pos = 9000
    contig = contig[:pos] + gene + contig[pos + len(gene):]
    store = GenomeStore.from_records(
        [SeqRecord("c1", encode_dna(contig), DNA)])
    idx = BlockIndex.build(store)
    mapper = GenomeMapper(store, idx, ctx)
    q = encode_dna(e1 + e2 + "A" * 40)        # transcript + poly-A tail
    for res in (mapper.map_query(q, lanes=32),
                mapper.map_queries([q], lanes=32)[0]):
        assert len(res) == 1
        gs = res[0]
        assert len(gs.introns) == 1
        assert gs.introns[0].g_start == pos + 140
        assert gs.identity == 1.0
        # q coords refer to the original (untrimmed) query
        assert gs.q_span[1] <= 270


def test_repalninf_forms(rng):
    """repalninf output family (sqpr.cc:130-330): XYL segments, SKL
    vertices, boundary list from the op stream."""
    import numpy as np
    from spaln_tpu.align.gene import build_gene_structure
    from spaln_tpu.out.formats import (skl_lines, xyl_line, xyl2_lines,
                                       boundary_line, _xyl_segments)
    q = np.arange(1, 9, dtype=np.int8)
    g = np.arange(1, 9, dtype=np.int8)
    ops = [('D', 1, 1), ('D', 2, 2), ('E', 2, 3), ('D', 3, 4),
           ('D', 4, 5)]
    gs = build_gene_structure(ops, q, g, 420, q_name="q", g_name="s",
                              aa_pair=True)
    assert _xyl_segments(gs) == [(1, 1, 2), (3, 4, 2)]
    x = xyl_line(gs)
    assert x.startswith("XYL: q 1 4 + s 1 5 +") and "1 1 2" in x
    x2 = xyl2_lines(gs)
    assert len(x2) == 2 and "XYL2:" in x2[0]
    sk = skl_lines(gs)
    assert sk[1] == "1 1 2 2 3 4 4 5"
    assert boundary_line(gs).startswith("s ")


def test_pair_mode(tmp_path, capsys):
    """Paired-input alignment (IM_PARA two files / IM_ALTR alternating,
    seq.h:1158-1197)."""
    import numpy as np
    from spaln_tpu.cli import main as cli_main
    rng = np.random.default_rng(5)
    AAS = list("ARNDCQEGHILKMFPSTWYV")
    s1 = "".join(rng.choice(AAS, 60))
    s2 = "".join(rng.choice(AAS, 50))
    a = tmp_path / "a.faa"
    b = tmp_path / "b.faa"
    a.write_text(f">p1\n{s1}\n>p2\n{s2}\n")
    b.write_text(f">q1\n{s1}\n>q2\n{s2}\n")
    outp = tmp_path / "out.txt"
    cli_main(["pair", str(a), str(b), "-O", "0", "-o", str(outp)])
    lines = [l for l in outp.read_text().splitlines() if l.strip()]
    assert len(lines) == 2
    assert lines[0].split("\t")[0] == "p1"
    # alternating single-file mode
    c = tmp_path / "c.faa"
    c.write_text(f">p1\n{s1}\n>q1\n{s1}\n>p2\n{s2}\n>q2\n{s2}\n")
    outp2 = tmp_path / "out2.txt"
    cli_main(["pair", str(c), "-O", "0", "-o", str(outp2)])
    lines2 = [l for l in outp2.read_text().splitlines() if l.strip()]
    assert len(lines2) == 2


def test_make_pairs_input_modes():
    """SeqServer pairing modes (cmn.h:104-105, calcserv.h:309-355)."""
    from spaln_tpu.cli import make_pairs
    a = ["r0", "r1", "r2", "r3"]
    assert make_pairs(a, ["s0", "s1", "s2", "s3"], "para") == [
        ("r0", "s0"), ("r1", "s1"), ("r2", "s2"), ("r3", "s3")]
    assert make_pairs(a, None, "altr") == [("r0", "r1"), ("r2", "r3")]
    # IM_GRUP: idx_g * (n - idx_g) cross pairs (calcserv.h:318)
    assert make_pairs(a, None, "grup", split=2) == [
        ("r0", "r2"), ("r0", "r3"), ("r1", "r2"), ("r1", "r3")]
    assert make_pairs(a, None, "grup", split=0) is None
    # IM_EVRY: n*(n-1)/2
    assert len(make_pairs(a, None, "every")) == 6
    assert make_pairs(a, None, "fvso") == [
        ("r0", "r1"), ("r0", "r2"), ("r0", "r3")]
    assert make_pairs(a, None, "self") == [(x, x) for x in a]
