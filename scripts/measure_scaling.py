"""Multi-device scaling measurement on the virtual CPU mesh.

Runs the real corpus through map_queries twice — single device and an
8-device data-parallel mesh — and reports (PARALLEL.md):
  * result identity (the sharded run must produce the same structures),
  * sharded-launch counts (every batch must divide over the mesh),
  * batch padding overhead (padded vs real DP cells — the only cost the
    virtual mesh can measure; BASELINE's >=80% 1->2-host efficiency
    needs work division with <=20% overhead, which this bounds),
  * process-warm queries/s for both configs (informational on CPU).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/measure_scaling.py /tmp/corpus --n-queries 200
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus")
    ap.add_argument("--n-queries", type=int, default=200)
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default=None)
    a = ap.parse_args(argv)

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count="
                          f"{a.ndev}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    from jax.sharding import Mesh
    import numpy as np

    from spaln_tpu.seq.genome import GenomeStore
    from spaln_tpu.seed.blockindex import BlockIndex
    from spaln_tpu.align.mapper import GenomeMapper
    from spaln_tpu.align.driver import AlignerContext
    from spaln_tpu.score.tables import TableDir, find_table_dir
    from spaln_tpu.seq.fasta import iter_seqfile
    from spaln_tpu.utils.metrics import metrics

    store = GenomeStore.load(os.path.join(a.corpus, "tpu_g"))
    index = BlockIndex.load(os.path.join(a.corpus, "tpu_g"))
    tables = TableDir(find_table_dir())
    mapper = GenomeMapper(store, index, AlignerContext.create(tables))
    recs = []
    for rec in iter_seqfile(os.path.join(a.corpus, "corpus.cf")):
        recs.append(rec)
        if len(recs) >= a.n_queries:
            break
    queries = [r.codes for r in recs]
    names = [r.name.split("|")[-1] for r in recs]

    def run(mesh, warm=False):
        metrics.timings.clear()
        metrics.counters.clear()
        t0 = time.time()
        res = mapper.map_queries(queries, q_names=names, mesh=mesh,
                                 max_batch=a.batch)
        dt = time.time() - t0
        key = [[(g.g_name, g.strand,
                 tuple((e.g_start, e.g_end) for e in g.exons))
                for g in r] for r in res]
        return key, dt, dict(metrics.counters)

    devs = np.array(jax.devices()[:a.ndev])
    mesh = Mesh(devs, ("b",))
    # pass 1 = compile warmup for both paths, pass 2 = warm numbers
    k1, t1c, _ = run(None)
    k8, t8c, _ = run(mesh)
    k1, t1, c1 = run(None)
    k8, t8, c8 = run(mesh)

    ident = sum(x == y for x, y in zip(k1, k8))
    pad_over = 1.0 - (c8.get("dp_cells_real", 0)
                      / max(c8.get("dp_cells", 1), 1))
    rep = {
        "n_queries": len(queries),
        "ndev": a.ndev,
        "identical_results": ident,
        "sharded_batches": c8.get("sharded_batches", 0),
        "unsharded_batches": c8.get("unsharded_batches", 0),
        "padding_overhead": round(pad_over, 4),
        "qps_1dev_warm": round(len(queries) / t1, 3),
        "qps_mesh_warm": round(len(queries) / t8, 3),
        "seconds": {"1dev_cold": round(t1c, 1), "mesh_cold": round(t8c, 1),
                    "1dev_warm": round(t1, 1), "mesh_warm": round(t8, 1)},
    }
    out = a.out or "MULTICHIP_SCALING.json"
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
