"""Build a realistic mapping corpus from the reference's REAL cDNA set.

The reference's regression recipe (seqdb/Makefile:69-75) maps the
dictdisc cDNAs/proteins onto the dictdisc genome — but the genome blob
(dictdisc_g.gf.gz) is LFS-missing from the snapshot.  This script
reconstructs an equivalent corpus: the REAL 5,999 dictdisc cDNAs
(seqdb/dictdisc.cf.gz) are planted as multi-exon genes on a synthetic
Dictyostelium-like genome (AT-rich intergenic/intron composition,
canonical GT..AG introns, lognormal intron lengths matching Dicty's
short-ILD regime), on both strands across several contigs, with a truth
table of every planted exon.  Both the reference binary and spaln_tpu
then map the same real queries against the same genome; the gate
(corpus_gate.py) diffs the gene structures.

Usage:
    python scripts/make_corpus.py OUTDIR [--n-genes N] [--seed S]
writes OUTDIR/corpus_g.gf, OUTDIR/corpus.cf, OUTDIR/truth.jsonl
"""
from __future__ import annotations

import argparse
import gzip
import json
import os
import sys

import numpy as np

CF_GZ = "/root/reference/seqdb/dictdisc.cf.gz"
COMP = str.maketrans("ACGTRYMKWSBDHVN", "TGCAYRKMWSVHDBN")


def read_cf(path: str) -> list[tuple[str, str]]:
    recs, name, buf = [], None, []
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        for line in f:
            if line.startswith(">"):
                if name:
                    recs.append((name, "".join(buf).upper()))
                name = line[1:].split()[0]
                buf = []
            else:
                buf.append(line.strip())
    if name:
        recs.append((name, "".join(buf).upper()))
    return recs


def revcomp(s: str) -> str:
    return s.translate(COMP)[::-1]


def at_rich(rng, n: int) -> str:
    return "".join(np.array(list("AATTGC"))[
        rng.integers(0, 6, size=n)])  # ~2/3 AT, Dicty-like


def intron_seq(rng, ilen: int) -> str:
    """Canonical GT..AG intron, AT-rich interior (Dicty introns are
    ~85% AT; donor/acceptor context consensus-ish)."""
    mid = at_rich(rng, max(ilen - 13, 0))
    return ("GTAAGT" + mid + "TTTTAAG")[:max(ilen - 2, 4)] + "AG"


def sample_intron_len(rng) -> int:
    # Dicty ILD regime: short mode ~100-200 nt, heavy-ish tail
    return int(np.clip(np.exp(rng.normal(np.log(140.0), 0.55)), 40, 4000))


def split_exons(rng, L: int) -> list[int]:
    """Exon lengths summing to L, each >= 60 (>=1 exon)."""
    k = int(np.clip(rng.poisson(2.2), 0, 7))          # introns
    if L < (k + 1) * 60:
        k = max(L // 60 - 1, 0)
    if k == 0:
        return [L]
    cuts = np.sort(rng.choice(np.arange(60, L - 59), size=k,
                              replace=False))
    lens = np.diff(np.concatenate([[0], cuts, [L]]))
    if (lens < 60).any():                              # rare collisions
        return split_exons(rng, L)
    return [int(x) for x in lens]


def build(outdir: str, n_genes: int, seed: int,
          n_contigs: int = 8) -> dict:
    rng = np.random.default_rng(seed)
    recs = [(n, s) for n, s in read_cf(CF_GZ)
            if 300 <= len(s) <= 4000 and set(s) <= set("ACGT")]
    order = rng.permutation(len(recs))
    recs = [recs[i] for i in order[:n_genes]]
    contigs = [[] for _ in range(n_contigs)]          # sequence chunks
    clens = [0] * n_contigs
    truth = []
    queries = []
    for gi, (name, cdna) in enumerate(recs):
        ci = gi % n_contigs
        parts = []
        exon_b = []                                    # gene-local bounds
        off = 0
        lens = split_exons(rng, len(cdna))
        cpos = 0
        for j, el in enumerate(lens):
            exon_b.append((off, off + el))
            parts.append(cdna[cpos:cpos + el])
            cpos += el
            off += el
            if j < len(lens) - 1:
                ilen = sample_intron_len(rng)
                parts.append(intron_seq(rng, ilen))
                off += ilen
        gene = "".join(parts)
        strand = "+" if rng.random() < 0.5 else "-"
        if strand == "-":
            gene = revcomp(gene)
            glen = len(gene)
            exon_b = [(glen - e, glen - b) for b, e in exon_b][::-1]
        spacer = at_rich(rng, int(rng.integers(800, 4000)))
        contigs[ci].append(spacer)
        clens[ci] += len(spacer)
        base = clens[ci]
        contigs[ci].append(gene)
        clens[ci] += len(gene)
        truth.append(dict(q=name, chr=f"chr{ci + 1}", strand=strand,
                          exons=[[base + b + 1, base + e]
                                 for b, e in exon_b]))
        queries.append((name, cdna))
    for ci in range(n_contigs):
        tail = at_rich(rng, int(rng.integers(800, 4000)))
        contigs[ci].append(tail)
        clens[ci] += len(tail)
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "corpus_g.gf"), "w") as f:
        for ci in range(n_contigs):
            f.write(f">chr{ci + 1}\n")
            seq = "".join(contigs[ci])
            for i in range(0, len(seq), 60):
                f.write(seq[i:i + 60] + "\n")
    with open(os.path.join(outdir, "corpus.cf"), "w") as f:
        for name, s in queries:
            f.write(f">{name}\n")
            for i in range(0, len(s), 60):
                f.write(s[i:i + 60] + "\n")
    with open(os.path.join(outdir, "truth.jsonl"), "w") as f:
        for t in truth:
            f.write(json.dumps(t) + "\n")
    info = dict(n_genes=len(truth), glen=int(sum(clens)), seed=seed,
                n_contigs=n_contigs)
    with open(os.path.join(outdir, "corpus.json"), "w") as f:
        json.dump(info, f)
    return info


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--n-genes", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--n-contigs", type=int, default=8)
    a = ap.parse_args(argv)
    info = build(a.outdir, a.n_genes, a.seed, a.n_contigs)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
