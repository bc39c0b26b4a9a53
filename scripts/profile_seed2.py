"""Profile the seed phase (vote + chain) on corpus data.

Approximates what _map_queries_batched's phases A+B pay per query
(no ExtBlock widen rounds; stops at the first strand that chains),
with cProfile attribution, so seed-stage optimizations target realistic
geometry (real maxgene windows) instead of synthetic guesses.
"""
from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from spaln_tpu.seq.genome import GenomeStore                 # noqa: E402
from spaln_tpu.seed.blockindex import BlockIndex             # noqa: E402
from spaln_tpu.seq.codec import comrev           # noqa: E402
from spaln_tpu.seq.fasta import read_fasta                   # noqa: E402
from spaln_tpu.seed.wilip import wilip                       # noqa: E402
from spaln_tpu.align.driver import AlignerContext            # noqa: E402
from spaln_tpu.score.tables import TableDir, find_table_dir  # noqa: E402


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    store = GenomeStore.load(os.path.join(corpus, "tpu_g"))
    index = BlockIndex.load(os.path.join(corpus, "tpu_g"))
    ctx = AlignerContext.create(TableDir(find_table_dir()))
    print("maxgene:", index.maxgene)
    queries = []
    for rec in read_fasta(os.path.join(corpus, "corpus.cf")):
        queries.append((rec.name, rec.codes))
        if len(queries) >= nq:
            break

    def seed_phase():
        nwin = 0
        wtot = 0
        for name, q in queries:
            cands = list(index.candidate_ranges(q, 10))
            cands += list(index.candidate_ranges(comrev(q), 10))
            cands.sort(key=lambda c: -c[2])
            picked = []
            for g0, g1, score in cands:
                if any(not (g1 <= p0 or g0 >= p1) for p0, p1 in picked):
                    continue
                picked.append((g0, g1))
                if len(picked) >= 3:
                    break
            for g0, g1 in picked:
                window = store.window(g0, g1)
                nwin += 1
                wtot += len(window)
                for st in ("+", "-"):
                    g_use = comrev(window) if st == "-" else window
                    ch = wilip(q, g_use, ipen=ctx.ipen, prm=ctx.prm,
                               spaced=ctx.cfg.alg.crs > 0)
                    if ch:
                        break
        return nwin, wtot

    nwin, wtot = seed_phase()    # warm
    t0 = time.perf_counter()
    nwin, wtot = seed_phase()
    dt = time.perf_counter() - t0
    print(f"seed phase: {dt / nq * 1e3:.1f} ms/query  "
          f"({nwin} windows, avg {wtot // max(nwin, 1)} bp)")
    pr = cProfile.Profile()
    pr.enable()
    seed_phase()
    pr.disable()
    pstats.Stats(pr).sort_stats("tottime").print_stats(16)


if __name__ == "__main__":
    main()
