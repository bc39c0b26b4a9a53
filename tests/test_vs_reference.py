"""Differential tests against the compiled reference spaln binary.

Builds the reference (read-only source copied to /tmp) once per session
and compares gene structures on synthetic genes.  Skips cleanly when the
toolchain or source is unavailable.
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

from spaln_tpu.align.driver import AlignerContext, align_cdna
from spaln_tpu.seq.codec import encode_dna

REF_SRC = "/root/reference/src"
BUILD_DIR = "/tmp/refsrc"
SPALN = os.path.join(BUILD_DIR, "spaln")


@pytest.fixture(scope="session")
def spaln_bin():
    if not os.path.isfile(SPALN):
        if not os.path.isdir(REF_SRC):
            pytest.skip("reference source unavailable")
        if not os.path.isdir(BUILD_DIR):
            shutil.copytree(REF_SRC, BUILD_DIR)
        try:
            subprocess.run(["./configure", "--exec_prefix=/tmp/refbin",
                            "--table_dir=/root/reference/table",
                            "--alndbs_dir=/tmp/refdbs"],
                           cwd=BUILD_DIR, check=True, capture_output=True,
                           timeout=120)
            subprocess.run(["make", "-j8", "spaln"], cwd=BUILD_DIR,
                           check=True, capture_output=True, timeout=600)
        except Exception as e:
            pytest.skip(f"cannot build reference spaln: {e}")
    return SPALN


def _write_fasta(path, name, seq):
    with open(path, "w") as f:
        f.write(f">{name}\n")
        for i in range(0, len(seq), 60):
            f.write(seq[i:i + 60] + "\n")


def _ref_exons(spaln_bin, genome, query, tmpdir):
    gfa = os.path.join(tmpdir, "g.fa")
    qfa = os.path.join(tmpdir, "q.fa")
    _write_fasta(gfa, "gref", genome)
    _write_fasta(qfa, "qref", query)
    # without ALN_TAB the binary can spin retrying table-file opens
    # (see scripts/corpus_gate.py run_reference)
    env = dict(os.environ, ALN_TAB="/root/reference/table")
    out = subprocess.run([spaln_bin, "-Q3", "-O4", "-LS", "-pq", gfa, qfa],
                         capture_output=True, text=True, timeout=300,
                         env=env)
    exons = []
    for line in out.stdout.splitlines():
        if line.startswith(("#", "@")) or not line.strip():
            continue
        toks = line.split("\t")
        if len(toks) < 10:
            continue
        exons.append((int(toks[8]), int(toks[9])))     # tgt_l, tgt_r
    return exons


def _gene(rng, n_exons, mut=0.0):
    bases = np.array(list("ACGT"))

    def mk(n):
        return "".join(rng.choice(bases, n))
    exons = [mk(int(rng.integers(90, 200))) for _ in range(n_exons)]
    g = mk(300)
    for i, e in enumerate(exons):
        g += e
        if i < n_exons - 1:
            g += "GTAAGT" + mk(int(rng.integers(100, 700))) + "TTTCTAG"
    g += mk(250)
    q = "".join(exons)
    if mut:
        q = "".join(rng.choice(bases) if rng.random() < mut else c
                    for c in q)
    return q, g


@pytest.mark.parametrize("n_exons,mut", [(2, 0.0), (3, 0.0), (4, 0.02),
                                         (2, 0.05)])
def test_exon_boundaries_match_reference(spaln_bin, table_dir, tmp_path,
                                         n_exons, mut):
    rng = np.random.default_rng(1000 + n_exons * 10 + int(mut * 100))
    q, g = _gene(rng, n_exons, mut)
    ref = _ref_exons(spaln_bin, g, q, str(tmp_path))
    assert len(ref) == n_exons, "reference itself should find the gene"
    ctx = AlignerContext.create(table_dir)
    res = align_cdna(encode_dna(q), encode_dna(g), ctx, q_name="q",
                     g_name="g", lanes=32)
    assert len(res) == 1
    ours = [(e.g_start + 1, e.g_end) for e in res[0].exons]
    assert ours == ref
