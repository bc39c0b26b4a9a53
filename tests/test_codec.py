import numpy as np

from spaln_tpu import constants as K
from spaln_tpu.seq.codec import (comrev, complement, decode_dna,
                                 decode_protein, decode_tron, encode_dna,
                                 encode_protein, nuc2tron, translate)


def test_dna_roundtrip():
    s = "ACGTACGTNRYKMSWBDHV"
    codes = encode_dna(s)
    assert decode_dna(codes) == s


def test_dna_codes_are_iupac_bitmasks():
    # code-1 is a 4-bit mask over A=1,C=2,G=4,T=8
    assert K.A - 1 == 1 and K.C - 1 == 2 and K.G - 1 == 4 and K.T - 1 == 8
    assert K.M - 1 == 3            # A|C
    assert K.N - 1 == 15           # any


def test_complement():
    s = encode_dna("ACGT")
    assert decode_dna(complement(s)) == "TGCA"
    assert decode_dna(comrev(s)) == "ACGT"[::-1].translate(
        str.maketrans("ACGT", "TGCA"))


def test_comrev_ambiguity():
    assert decode_dna(comrev(encode_dna("RYSWKM"))) == "KMWSRY"


def test_protein_roundtrip():
    s = "ARNDCQEGHILKMFPSTWYV"
    assert decode_protein(encode_protein(s)) == s


def test_translate_standard_code():
    # ATG GCT TAA -> M A *
    aa = translate(encode_dna("ATGGCTTAA"))
    assert decode_protein(aa[:2]) == "MA"
    assert aa[2] == K.TRM


def test_translate_tga_is_trm2():
    aa = nuc2tron(encode_dna("ATGAC"))
    # centered codons: pos1 = ATG -> MET, pos2 = TGA -> TRM2
    assert aa[1] == K.MET
    assert aa[2] == K.TRM2


def test_nuc2tron_centered_and_ser2():
    # AGC = Ser (AGY class -> SER2); codon centered at position 1
    t = nuc2tron(encode_dna("AGCAA"))
    assert t[1] == K.SER2
    # TCA = Ser (TCN class -> SER)
    t2 = nuc2tron(encode_dna("TCAAA"))
    assert t2[1] == K.SER
    # boundaries are ambiguous
    assert t[0] == K.AMB and t[-1] == K.AMB


def test_translate_frames():
    codes = encode_dna("AATGGCT")
    aa1 = translate(codes, frame=1)      # ATG GCT
    assert decode_protein(aa1) == "MA"


def test_genbank_embl_readers(tmp_path):
    from spaln_tpu.seq.fasta import iter_seqfile, parse_seq_arg
    gb = ("LOCUS       REC1       24 bp    DNA\n"
          "DEFINITION  a genbank record.\nORIGIN\n"
          "        1 acgtacgtac gtacgtacgt acgt\n//\n")
    p = tmp_path / "x.gb"
    p.write_text(gb)
    recs = list(iter_seqfile(str(p)))
    assert recs[0].name == "REC1" and len(recs[0].codes) == 24
    em = ("ID   REC2; SV 1; linear; DNA\nDE   an embl record\n"
          "SQ   Sequence 12 BP;\n     acgtacgtacgt        12\n//\n")
    p2 = tmp_path / "x.em"
    p2.write_text(em)
    recs = list(iter_seqfile(str(p2)))
    assert recs[0].name == "REC2" and len(recs[0].codes) == 12
    assert parse_seq_arg("chr.fa 101 200") == ("chr.fa", 100, 200)
    assert parse_seq_arg("chr.fa") == ("chr.fa", None, None)


def test_fasta_sigii_records(tmp_path):
    """Extended-fasta SigII records (;B/;b, gsinfo.h:77-103) land in
    record.meta['sig_pos'] for the -yJ bonus."""
    from spaln_tpu.seq.fasta import read_fasta
    p = tmp_path / "q.fa"
    p.write_text(">q1 test\n;B 3 0\n;b 120 2 340 1\n;b 500 4\n"
                 "ACGTACGTACGT\n>q2\nACGTACGT\n")
    recs = read_fasta(str(p))
    assert recs[0].meta["sig_pos"] == [(120, 2), (340, 1), (500, 4)]
    assert "sig_pos" not in recs[1].meta
    assert len(recs[0].codes) == 12
