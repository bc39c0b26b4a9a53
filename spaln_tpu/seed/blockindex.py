"""Genome block index: build + query (MakeBlk / SrchBlk re-design).

The reference's phase-A mapper (blksrc.cc) cuts the genome into blocks of
``blklen`` and stores, per k-mer, the sorted list of blocks containing it
(CSR).  Queries vote for blocks with per-word information scores; paired
left/right votes become candidate gene ranges.

TPU-first re-design: the index is two flat int arrays (CSR offsets +
block ids) plus an int16 word-score table — mmap-able, shardable by k-mer
range across hosts, and gatherable on device.  Auto-sizing follows the
reference's formulas (blksrc.cc:678-737): blklen ~ sqrt(genome), capped
64k; k = 0.59 ln(genome), capped 16 (practical cap 13 here so the LUT
stays  < 1GB); MaxGene = 38 sqrt(genome), min 16k.
"""
from __future__ import annotations

import json
import math
from dataclasses import dataclass

import numpy as np

from ..constants import AA_REDUCE20, NT_REDUCE4
from ..seq.codec import comrev, translate
from ..seq.genome import GenomeStore
from .wilip import _kmer_words


def auto_params(glen: int) -> dict:
    blklen = min(int(math.sqrt(glen)) + 1, 65536)
    blklen = max(blklen, 256)
    k = min(int(0.59 * math.log(max(glen, 100))), 13)
    k = max(k, 4)
    maxgene = max(int(38 * math.sqrt(glen)), 16384)
    # protein index k-mer (aa words): 0.36 ln(gnmsz) capped 6
    # (blksrc.cc:678-737)
    kp = max(min(int(0.36 * math.log(max(glen, 100))), 6), 3)
    return {"blklen": blklen, "k": k, "kp": kp, "maxgene": maxgene}


@dataclass
class BlockIndex:
    k: int
    blklen: int
    maxgene: int
    offsets: np.ndarray      # (4^k + 1,) int64 CSR offsets
    blocks: np.ndarray       # (nnz,) int32 block ids per word
    wscr: np.ndarray         # (4^k,) int16 word scores
    n_blocks: int
    glen: int

    # ---------------------------------------------------------------- build
    @classmethod
    def build(cls, store: GenomeStore, k: int | None = None,
              blklen: int | None = None,
              max_word_freq: float = 1e-3) -> "BlockIndex":
        glen = len(store.codes)
        p = auto_params(store.total_len or glen)
        k = k or p["k"]
        blklen = blklen or p["blklen"]
        red = NT_REDUCE4[np.asarray(store.codes, dtype=np.int64)]
        nwords = 4 ** k
        n_blocks = glen // blklen + 1
        native = None
        try:                        # parallel C++ two-pass CSR builder
            from ..native import kmer_csr_native
            native = kmer_csr_native(red, k, blklen)
        except Exception:
            native = None
        words, ok = _kmer_words(red, k)
        pos = np.nonzero(ok)[0]
        w = words[pos]
        if native is not None:
            offsets, ub = native
        else:
            blk = (pos // blklen).astype(np.int32)
            # unique (word, block) pairs -> CSR by word
            key = w * np.int64(n_blocks) + blk
            key = np.unique(key)
            uw = (key // n_blocks).astype(np.int64)
            ub = (key % n_blocks).astype(np.int32)
            counts = np.bincount(uw, minlength=nwords)
            offsets = np.zeros(nwords + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
        # word scores: information content from genome composition
        # (blkscrtab role, blksrc.cc:879-998): -log2 of expected frequency,
        # zeroed for words present in too many blocks (toomany cap)
        total_hits = np.bincount(w % nwords, minlength=nwords)
        gsize = max(len(pos), 1)
        pw = np.maximum(total_hits / gsize, 1e-12)
        wscr = np.minimum(-np.log2(pw) * 4, 120).astype(np.int16)
        wscr[total_hits > max_word_freq * gsize] = 0     # repetitive words
        return cls(k=k, blklen=blklen, maxgene=p["maxgene"],
                   offsets=offsets, blocks=ub, wscr=wscr,
                   n_blocks=n_blocks, glen=glen)

    # ----------------------------------------------------------- persistence
    def save(self, prefix: str) -> None:
        np.savez(prefix + ".bkn.npz", offsets=self.offsets,
                 blocks=self.blocks, wscr=self.wscr,
                 meta=np.array([self.k, self.blklen, self.maxgene,
                                self.n_blocks, self.glen], dtype=np.int64))

    @classmethod
    def load(cls, prefix: str) -> "BlockIndex":
        z = np.load(prefix + ".bkn.npz")
        k, blklen, maxgene, n_blocks, glen = z["meta"].tolist()
        return cls(k=int(k), blklen=int(blklen), maxgene=int(maxgene),
                   offsets=z["offsets"], blocks=z["blocks"],
                   wscr=z["wscr"], n_blocks=int(n_blocks), glen=int(glen))

    # --------------------------------------------------------------- search
    def _query_words(self, query: np.ndarray) -> np.ndarray:
        red = NT_REDUCE4[np.asarray(query, dtype=np.int64)]
        words, ok = _kmer_words(red, self.k)
        return words[ok]

    def _qspan_blocks(self, query: np.ndarray) -> int:
        return max(self._q_nt_len(query) // self.blklen, 1)

    def _q_nt_len(self, query: np.ndarray) -> int:
        return len(query)

    def vote(self, query: np.ndarray) -> np.ndarray:
        """Per-block vote score for one query (findblock's bscr tallies,
        blksrc.cc:2971-3087, collapsed to a single whole-query tally —
        the left/right pairing is handled by candidate_ranges)."""
        w = self._query_words(query)
        if not len(w):
            return np.zeros(self.n_blocks, dtype=np.int64)
        lo = self.offsets[w]
        hi = self.offsets[w + 1]
        cnt = (hi - lo).astype(np.int64)
        has = cnt > 0
        if not has.any():
            return np.zeros(self.n_blocks, dtype=np.int64)
        scores = self.wscr[w[has]].astype(np.int64)
        idx = np.concatenate([np.arange(l, h)
                              for l, h in zip(lo[has], hi[has])])
        rep_score = np.repeat(scores, cnt[has])
        return np.bincount(self.blocks[idx], weights=rep_score,
                           minlength=self.n_blocks).astype(np.int64)

    def candidate_ranges(self, query: np.ndarray, ncand: int = 10,
                         min_score_frac: float = 0.25
                         ) -> list[tuple[int, int, float]]:
        """Top candidate genomic ranges [(start, end, score)], each a
        window of blocks whose summed votes pass threshold, widened to
        MaxGene (TestOutput/BPAIR semantics collapsed to a windowed-sum
        scan over block votes)."""
        votes = self.vote(query)
        if votes.max() == 0:
            return []
        span_blocks = max(self.maxgene // self.blklen, 1)
        qspan = self._qspan_blocks(query)
        win = min(span_blocks, max(2 * qspan, 2))
        kern = np.ones(win)
        smooth = np.convolve(votes, kern, mode="same")
        thr = smooth.max() * min_score_frac
        out = []
        used = np.zeros(len(smooth), dtype=bool)
        order = np.argsort(smooth)[::-1]
        # candidate extent: a gene may span MaxGene around the vote peak
        # and must include the whole query even when only part of it voted
        # (TestOutput/ExtBlock widening, blksrc.cc:2409-2461) — the vote
        # peak marks *some* exon, not necessarily the gene start.
        ext = min(span_blocks,
                  max(2 * win, 2 * qspan + 2,
                      2 * self._q_nt_len(query) // self.blklen + 2))
        for b in order:
            if len(out) >= ncand or smooth[b] < thr:
                break
            if used[b]:
                continue
            used[max(int(b) - win, 0):min(int(b) + win + 1,
                                          self.n_blocks)] = True
            b0 = max(int(b) - ext, 0)
            b1 = min(int(b) + ext + 1, self.n_blocks)
            g0 = max(b0 * self.blklen - self.blklen, 0)
            g1 = min(b1 * self.blklen + self.blklen, self.glen)
            out.append((g0, g1, float(smooth[b])))
        return out


class ProteinBlockIndex(BlockIndex):
    """Protein-query genome index (-KP): 6-frame translated reduced-aa
    k-mers -> genomic block lists (MakeBlk aa/tron path, blksrc.cc:
    466-531 c2w6 over 6 frames; ORF filter omitted — repetitive-word
    capping plays its role here).

    Blocks are nt-coordinate blocks of the forward strand, so candidate
    ranges work for genes on either strand (reverse-frame k-mer positions
    map back to forward coordinates before block assignment).
    """
    NALPHA = 20

    @classmethod
    def build(cls, store: GenomeStore, k: int | None = None,
              blklen: int | None = None,
              max_word_freq: float = 2e-3) -> "ProteinBlockIndex":
        glen = len(store.codes)
        p = auto_params(store.total_len or glen)
        k = k or p["kp"]
        blklen = blklen or p["blklen"]
        na = cls.NALPHA
        codes = np.asarray(store.codes)
        pairs = []
        for strand in range(2):
            seq = codes if strand == 0 else comrev(codes)
            for frame in range(3):
                aa = translate(seq, frame)
                red = AA_REDUCE20[aa.astype(np.int64)]
                valid = (red >= 0) & (red < na)
                L = len(red)
                if L < k:
                    continue
                w = np.zeros(L - k + 1, dtype=np.int64)
                ok = np.ones(L - k + 1, dtype=bool)
                for i in range(k):
                    w = w * na + np.clip(red[i:L - k + 1 + i], 0, na - 1)
                    ok &= valid[i:L - k + 1 + i]
                pos_aa = np.nonzero(ok)[0]
                nt = 3 * pos_aa + frame               # frame-local nt pos
                if strand == 1:
                    nt = glen - nt - 3 * k            # map to fwd coords
                blk = np.clip(nt // blklen, 0, glen // blklen)
                pairs.append((w[pos_aa], blk.astype(np.int32)))
        n_blocks = glen // blklen + 1
        if pairs:
            w_all = np.concatenate([p_[0] for p_ in pairs])
            b_all = np.concatenate([p_[1] for p_ in pairs])
        else:
            w_all = np.zeros(0, np.int64)
            b_all = np.zeros(0, np.int32)
        key = np.unique(w_all * np.int64(n_blocks) + b_all)
        uw = (key // n_blocks).astype(np.int64)
        ub = (key % n_blocks).astype(np.int32)
        nwords = na ** k
        counts = np.bincount(uw, minlength=nwords)
        offsets = np.zeros(nwords + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        total_hits = np.bincount(w_all, minlength=nwords)
        gsize = max(len(w_all), 1)
        pw = np.maximum(total_hits / gsize, 1e-12)
        wscr = np.minimum(-np.log2(pw) * 4, 120).astype(np.int16)
        wscr[total_hits > max_word_freq * gsize] = 0
        return cls(k=k, blklen=blklen, maxgene=p["maxgene"],
                   offsets=offsets, blocks=ub, wscr=wscr,
                   n_blocks=n_blocks, glen=glen)

    def save(self, prefix: str) -> None:
        np.savez(prefix + ".bkp.npz", offsets=self.offsets,
                 blocks=self.blocks, wscr=self.wscr,
                 meta=np.array([self.k, self.blklen, self.maxgene,
                                self.n_blocks, self.glen], dtype=np.int64))

    @classmethod
    def load(cls, prefix: str) -> "ProteinBlockIndex":
        z = np.load(prefix + ".bkp.npz")
        k, blklen, maxgene, n_blocks, glen = z["meta"].tolist()
        return cls(k=int(k), blklen=int(blklen), maxgene=int(maxgene),
                   offsets=z["offsets"], blocks=z["blocks"],
                   wscr=z["wscr"], n_blocks=int(n_blocks), glen=int(glen))

    def _query_words(self, query: np.ndarray) -> np.ndarray:
        red = AA_REDUCE20[np.asarray(query, dtype=np.int64)]
        na, k = self.NALPHA, self.k
        valid = (red >= 0) & (red < na)
        L = len(red)
        if L < k:
            return np.zeros(0, np.int64)
        w = np.zeros(L - k + 1, dtype=np.int64)
        ok = np.ones(L - k + 1, dtype=bool)
        for i in range(k):
            w = w * na + np.clip(red[i:L - k + 1 + i], 0, na - 1)
            ok &= valid[i:L - k + 1 + i]
        return w[ok]

    def _q_nt_len(self, query: np.ndarray) -> int:
        return 3 * len(query)
