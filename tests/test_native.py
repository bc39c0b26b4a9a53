"""Native C++ runtime (spaln_native.cpp): parallel k-mer CSR builder and
FASTA encoder vs the numpy reference paths."""
import numpy as np
import pytest

from spaln_tpu.constants import NT_ENCODE, NT_REDUCE4
from spaln_tpu.native import fasta_encode_native, get_lib, kmer_csr_native
from spaln_tpu.seed.wilip import _kmer_words
from spaln_tpu.seq.codec import encode_dna

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def _numpy_csr(red, k, blklen):
    words, ok = _kmer_words(red.astype(np.int64), k)
    pos = np.nonzero(ok)[0]
    w = words[pos]
    blk = (pos // blklen).astype(np.int64)
    n_blocks = len(red) // blklen + 1
    key = np.unique(w * n_blocks + blk)
    uw, ub = key // n_blocks, (key % n_blocks).astype(np.int32)
    offsets = np.zeros(4 ** k + 1, dtype=np.int64)
    np.cumsum(np.bincount(uw, minlength=4 ** k), out=offsets[1:])
    return offsets, ub


@pytest.mark.parametrize("n,k,blklen", [(5000, 6, 256), (50000, 8, 512)])
def test_kmer_csr_matches_numpy(rng, n, k, blklen):
    g = rng.choice(np.array(list("ACGTN"), dtype="U1"), n,
                   p=[.24, .24, .24, .24, .04])
    red = NT_REDUCE4[encode_dna("".join(g)).astype(np.int64)].astype(np.int8)
    nat = kmer_csr_native(red, k, blklen)
    assert nat is not None
    off_n, blk_n = nat
    off_p, blk_p = _numpy_csr(red, k, blklen)
    assert (off_n == off_p).all()
    assert (blk_n == blk_p).all()


def test_fasta_encode_native(rng):
    txt = b">s1 first\nACGTACGT\nGGGG\n>s2\nTTTTNNNACGT\n"
    res = fasta_encode_native(txt, NT_ENCODE)
    assert res is not None
    codes, offs, names = res
    assert names == ["s1", "s2"]
    assert offs.tolist() == [0, 12]
    from spaln_tpu.seq.codec import decode_dna
    assert decode_dna(codes[:12]) == "ACGTACGTGGGG"
    assert decode_dna(codes[12:]) == "TTTTNNNACGT"
