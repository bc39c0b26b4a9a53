#!/usr/bin/env python3
"""Time the Pallas kernel with pieces knocked out (SPALN_PALLAS_ABLATE).

Timing probe only — ablated kernels compute wrong scores.  Run one
variant per process:  SPALN_PALLAS_ABLATE=ipen4 python scripts/ablate_pallas.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from spaln_tpu.config import Config, resolve, CvsG
    from spaln_tpu.ops.params import DpParams
    from spaln_tpu.ops.dp_spliced_scan import prepare_spliced_batch
    from spaln_tpu.ops.dp_spliced_pallas import run_spliced_batch_pallas
    from spaln_tpu.score.intron import IntronPenalty
    from spaln_tpu.score.simmtx import Simmtx
    from spaln_tpu.score.splice import build_splice_signals
    from spaln_tpu.score.tables import TableDir, find_table_dir
    from spaln_tpu.seq.codec import encode_dna

    cfg = resolve(Config(), CvsG)
    prm = DpParams.build(cfg, Simmtx.dna(), CvsG,
                         ipen=IntronPenalty(cfg, CvsG))
    tables = TableDir(find_table_dir())
    B = int(os.environ.get("BENCH_B", 256))
    M = int(os.environ.get("BENCH_M", 512))
    W = int(os.environ.get("BENCH_W", 4096))
    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))
    queries, genomes, sigs = [], [], []
    for _ in range(B):
        e = ["".join(rng.choice(bases, M // 3)) for _ in range(3)]
        i1 = "GTAAGT" + "".join(rng.choice(bases, 300)) + "TTTTTAG"
        i2 = "GTGAGT" + "".join(rng.choice(bases, 500)) + "TTTCTAG"
        g = e[0] + i1 + e[1] + i2 + e[2]
        q = "".join(e)
        queries.append(encode_dna(q))
        genomes.append(encode_dna(g))
        sigs.append(build_splice_signals(genomes[-1], cfg, tables))
    lw = -(W // 2)
    bp = prepare_spliced_batch(queries, genomes, prm, sigs=sigs,
                               lw=lw, up=lw + W - 1, L=128)
    t0 = time.perf_counter()
    run_spliced_batch_pallas(bp, prm, score_only=True)
    print(f"compile+run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_spliced_batch_pallas(bp, prm, score_only=True)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[1]
    cells = B * bp.n_slabs * bp.L * bp.W
    steps = (B // 16) * bp.n_slabs * (-(-bp.T // 256) * 256)
    print(f"ablate={os.environ.get('SPALN_PALLAS_ABLATE','(none)')} "
          f"dt={dt:.3f}s gcups={cells / dt / 1e9:.3f} "
          f"us_per_prog_step={dt / steps * 1e6 * 16:.3f}")


if __name__ == "__main__":
    main()
