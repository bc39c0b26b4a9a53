"""Genome-sharded multi-host equivalence: per-host contig-slice indexes
+ cross-host merge must reproduce the single-index mapping exactly
(parallel/sharding.py; the reference's external-sharding idiom,
README.md:441-452)."""
import numpy as np
import pytest

from spaln_tpu.align.driver import AlignerContext
from spaln_tpu.align.mapper import GenomeMapper
from spaln_tpu.seed.blockindex import BlockIndex
from spaln_tpu.seq.codec import encode_dna
from spaln_tpu.seq.fasta import SeqRecord
from spaln_tpu.seq.genome import GenomeStore
from spaln_tpu.constants import DNA
from spaln_tpu.parallel.sharding import (contig_shard, build_shard,
                                         split_queries,
                                         merge_query_results)


def _mk(rng, n):
    return "".join(rng.choice(np.array(list("ACGT")), n))


def _gene(rng):
    e1, e2 = _mk(rng, 120), _mk(rng, 130)
    ilen = int(rng.integers(100, 300))
    intron = "GTAAGT" + _mk(rng, ilen - 13) + "TTTCTAG"
    return e1 + e2, e1 + intron + e2


def test_genome_sharded_equivalence(table_dir, rng):
    ctx = AlignerContext.create(table_dir)
    contigs, queries = [], []
    for ci in range(4):
        parts = [_mk(rng, 2000)]
        for _ in range(2):
            q, g = _gene(rng)
            queries.append(encode_dna(q))
            parts.append(g)
            parts.append(_mk(rng, 1500))
        contigs.append(SeqRecord(name=f"c{ci}", molc=DNA,
                                 codes=encode_dna("".join(parts))))
    store = GenomeStore.from_records(contigs)
    idx = BlockIndex.build(store)
    full = GenomeMapper(store, idx, ctx).map_queries(
        queries, lanes=32, max_batch=8)

    n_hosts = 2
    shard_ids = [contig_shard(store, n_hosts, h) for h in range(n_hosts)]
    assert sorted(sum(shard_ids, [])) == [0, 1, 2, 3]
    per_host = []
    for ids in shard_ids:
        st = build_shard(store, ids)
        ix = BlockIndex.build(st)
        per_host.append(GenomeMapper(st, ix, ctx).map_queries(
            queries, lanes=32, max_batch=8))
    merged = merge_query_results(per_host, max_out=1)
    assert len(merged) == len(full)
    for qi, (m, f) in enumerate(zip(merged, full)):
        assert bool(m) == bool(f), f"query {qi}"
        if not m:
            continue
        assert m[0].g_name == f[0].g_name
        assert m[0].score == f[0].score
        assert ([(e.g_start, e.g_end) for e in m[0].exons]
                == [(e.g_start, e.g_end) for e in f[0].exons])


def test_query_split_covers_all():
    got = []
    for h in range(3):
        s = split_queries(10, 3, h)
        got.extend(range(*s.indices(10)))
    assert got == list(range(10))
