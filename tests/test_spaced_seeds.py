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
