"""Tests for the aux-tool equivalents (montseq/resite/extcds/rdn)."""
import numpy as np
import pytest

from spaln_tpu.tools.seqextras import (montseq, mutate_seq, read_renzyme,
                                       resite, Enzyme, extcds,
                                       pick_members, revcomp)


def test_montseq_composition():
    seqs = montseq(5, 2000, composition=[0.7, 0.1, 0.1, 0.1], seed=1)
    assert len(seqs) == 5 and all(len(s) == 2000 for s in seqs)
    a_frac = seqs[0].count("A") / 2000
    assert 0.62 < a_frac < 0.78


def test_montseq_protein():
    (s,) = montseq(1, 500, protein=True, seed=2)
    assert set(s) <= set("ARNDCQEGHILKMFPSTWYV")


def test_mutate_rates():
    s = montseq(1, 5000, seed=3)[0]
    m = mutate_seq(s, sub=0.1, seed=4)
    assert len(m) == len(s)
    diff = sum(a != b for a, b in zip(s, m)) / len(s)
    assert 0.06 < diff < 0.14
    d = mutate_seq(s, del_=0.2, seed=5)
    assert 0.75 < len(d) / len(s) < 0.85


def test_resite_basic_and_unique():
    enz = [Enzyme("EcoRI", "GAATTC", 1), Enzyme("XX", "GGGG", 2)]
    seq = "TTGAATTCAAGGGGTTGGGGA"
    sites = resite(seq, enz)
    eco = [s for s in sites if s.enzyme == "EcoRI"]
    assert [s.pos for s in eco] == [3]           # site at 2, cut offset 1
    xx = [s for s in sites if s.enzyme == "XX"]
    assert len(xx) == 2
    uniq = resite(seq, enz, unique_only=True)
    assert {s.enzyme for s in uniq} == {"EcoRI"}


def test_resite_degenerate_and_reverse():
    # GTMKAC (AccI-like, cut 3): present only on the minus strand here
    enz = [Enzyme("AccI", "GTMKAC", 3)]
    fwd = "GTATAC"                                # matches GTMKAC? M=A/C
    assert resite("CC" + fwd + "CC", enz)
    # a non-palindromic degenerate pattern found via revcomp
    enz2 = [Enzyme("Z", "GGTCTC", 1)]
    seq = "AA" + revcomp("GGTCTC") + "AA"
    sites = resite(seq, enz2)
    assert sites and sites[0].strand == "-"


def test_renzyme_table(tmp_path):
    p = tmp_path / "renzyme"
    p.write_text("Aat1      AGGCCT         4\nAcc1      GTMKAC         3\n")
    enz = read_renzyme(str(p))
    assert [e.name for e in enz] == ["Aat1", "Acc1"]
    assert enz[0].cut == 4


GBK = """LOCUS       TESTA       60 bp    DNA   linear   UNA 01-JAN-2000
DEFINITION  test entry.
FEATURES             Location/Qualifiers
     source          1..60
     CDS             join(4..9,16..21)
                     /product="demo protein"
     CDS             complement(25..33)
                     /product="minus one"
ORIGIN
        1 atgAAATTTc cccccGGGCC Ctttatgcat gcatgcatcc ccccccccgg ggggggtttt
//
"""


def test_extcds_join_and_complement(tmp_path):
    p = tmp_path / "t.gbk"
    p.write_text(GBK)
    recs = extcds(str(p))
    assert len(recs) == 2
    assert recs[0].entry == "TESTA"
    assert recs[0].product == "demo protein"
    assert recs[0].seq == "AAATTT" + "GGGCCC"
    assert recs[1].minus
    assert recs[1].seq == revcomp("ATGCATGCA".upper())


def test_pick_members():
    names = [f"s{i}" for i in range(10)]
    assert pick_members(names, every=3) == [0, 3, 6, 9]
    got = pick_members(names, count=4, seed=7)
    assert len(got) == 4 and got == sorted(set(got))
    assert pick_members(names, indices=[2, 99, 5]) == [2, 5]


def test_msf_reader(tmp_path):
    p = tmp_path / "aln.msf"
    p.write_text(
        " PileUp\n\n   MSF: 20  Type: N  Check: 1234 ..\n\n"
        " Name: s1 Len: 20\n Name: s2 Len: 20\n\n//\n\n"
        "s1  ACGTAC GTACGT\ns2  ACGT.C GT-CGT\n")
    from spaln_tpu.seq.fasta import iter_seqfile
    from spaln_tpu.seq.codec import decode_dna
    recs = list(iter_seqfile(str(p)))
    assert [r.name for r in recs] == ["s1", "s2"]
    assert decode_dna(recs[0].codes) == "ACGTACGTACGT"
    assert decode_dna(recs[1].codes) == "ACGTCGTCGT"


def test_cli_seq_ops(tmp_path, capsys):
    from spaln_tpu.cli import main
    fa = tmp_path / "q.fa"
    fa.write_text(">q1\nATGAAACCCGGGTTTTAAACGT\n")
    assert main(["seq", "comp", str(fa)]) == 0
    out = capsys.readouterr().out
    assert out.startswith("q1\t22\t") and "A:7" in out
    assert main(["seq", "orf", str(fa), "--min-orf", "9"]) == 0
    out = capsys.readouterr().out
    assert "_orf" in out and "frame" in out
    assert main(["seq", "forge", "--count", "2", "--length", "30",
                 "--seed", "1"]) == 0
    out = capsys.readouterr().out
    assert out.count(">rand") == 2
    enz = tmp_path / "renz"
    enz.write_text("Test CCCGGG 3\n")
    assert main(["seq", "resite", str(fa), "--enzymes", str(enz)]) == 0
    out = capsys.readouterr().out
    assert "Test\t10\t+" in out
