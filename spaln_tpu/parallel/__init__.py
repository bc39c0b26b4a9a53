"""Multi-chip / multi-host execution (the reference's only parallelism is
single-node pthreads + external sharding via sortgrcd merge,
SURVEY.md 2.7; here: query batches data-parallel over a jax device mesh,
genome/index replicated per host, locus merge as the collective).

Usage:
    mesh = make_mesh()                       # all local devices
    res = map_queries_sharded(mapper, queries, mesh=mesh)
    loci = merge_shards([res, other_host_res, ...])
"""
from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int | None = None, axis: str = "dp"):
    """1-D device mesh over local devices (data-parallel axis)."""
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def map_queries_sharded(mapper, queries: list, q_names=None, mesh=None,
                        **kw):
    """Run GenomeMapper.map_queries with batches sharded over the mesh.

    Each geometry bucket's batch is placed with a data-parallel sharding;
    XLA partitions the vmapped wavefront over chips (no cross-chip
    communication inside the DP — queries are independent, matching the
    reference's lock-free worker design, SURVEY.md A.13)."""
    if mesh is None:
        mesh = make_mesh()
    return mapper.map_queries(queries, q_names=q_names, mesh=mesh, **kw)


def merge_shards(shard_results: list, q_lens: dict | None = None,
                 filt=None):
    """Merge per-shard mapping results into gene loci (the sortgrcd
    collective: concatenate shards, cluster, filter — works identically
    for one shard or a pod's gathered outputs)."""
    from ..out.sortgrcd import cluster_loci
    records = []
    for res in shard_results:
        for per_query in res:
            records.extend(per_query)
    return cluster_loci(records, q_lens=q_lens, filt=filt)
