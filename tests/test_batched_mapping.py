"""Batched multi-query mapping: bucketed device launches + mesh sharding
(the ThQueue master-worker replacement, spaln.cc:1220-1468)."""
import jax
import numpy as np
import pytest

from spaln_tpu.align.driver import AlignerContext
from spaln_tpu.align.mapper import GenomeMapper
from spaln_tpu.seed.blockindex import BlockIndex
from spaln_tpu.seq.codec import encode_dna, comrev, decode_dna
from spaln_tpu.seq.fasta import SeqRecord
from spaln_tpu.seq.genome import GenomeStore
from spaln_tpu.constants import DNA


@pytest.fixture(scope="module")
def ctx(table_dir):
    return AlignerContext.create(table_dir)


def _mk(rng, n):
    return "".join(rng.choice(np.array(list("ACGT")), n))


def _gene(rng, n_exons=2):
    exons = [_mk(rng, int(rng.integers(90, 160))) for _ in range(n_exons)]
    parts, bounds, pos = [], [], 0
    for i, e in enumerate(exons):
        parts.append(e)
        pos += len(e)
        if i < n_exons - 1:
            ilen = int(rng.integers(80, 400))
            parts.append("GTAAGT" + _mk(rng, ilen - 13) + "TTTCTAG")
            bounds.append((pos, pos + ilen))
            pos += ilen
    return "".join(exons), "".join(parts), bounds


@pytest.fixture(scope="module")
def genome_and_queries(rng):
    contig = _mk(rng, 36000)
    queries, positions = [], []
    pos = 3000
    for i in range(4):
        q, g, bounds = _gene(rng, 2 + (i % 2))
        if i % 3 == 2:
            # true minus-strand gene: plant the reverse complement,
            # keep the sense cDNA as the query
            g = decode_dna(comrev(encode_dna(g)))
        contig = contig[:pos] + g + contig[pos + len(g):]
        queries.append(encode_dna(q))
        positions.append(pos)
        pos += len(g) + 2500
    store = GenomeStore.from_records(
        [SeqRecord("c1", encode_dna(contig), DNA)])
    return store, queries, positions


def test_map_queries_matches_singles(ctx, genome_and_queries):
    store, queries, positions = genome_and_queries
    idx = BlockIndex.build(store)
    mapper = GenomeMapper(store, idx, ctx)
    batched = mapper.map_queries(queries, lanes=32, max_batch=8)
    for qi, (q, pos) in enumerate(zip(queries, positions)):
        singles = mapper.map_query(q, lanes=32)
        assert len(batched[qi]) == len(singles) == 1
        b, s = batched[qi][0], singles[0]
        assert b.g_span == s.g_span
        assert b.score == s.score
        assert b.g_span[0] == pos
        assert b.identity == 1.0


def test_map_queries_sharded_mesh(ctx, genome_and_queries):
    from jax.sharding import Mesh
    from spaln_tpu.utils.metrics import metrics
    store, queries, positions = genome_and_queries
    idx = BlockIndex.build(store)
    mapper = GenomeMapper(store, idx, ctx)
    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("dp",))
    metrics.counters.pop("sharded_batches", None)
    metrics.counters.pop("unsharded_batches", None)
    out = mapper.map_queries(queries, lanes=32, max_batch=8, mesh=mesh)
    # every launch must actually have sharded over the mesh (batches
    # are padded to a device multiple, so the single-device degrade
    # path must never trigger)
    assert metrics.counters.get("sharded_batches", 0) > 0
    assert metrics.counters.get("unsharded_batches", 0) == 0
    ref = mapper.map_queries(queries, lanes=32, max_batch=8)
    for a, b in zip(out, ref):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert x.score == y.score and x.g_span == y.g_span
