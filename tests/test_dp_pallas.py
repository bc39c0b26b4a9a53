"""Pallas wavefront kernel vs the lax.scan engine: bit-identical scores.

Runs in interpret mode on the CPU test mesh (compiled Mosaic on chip is
exercised by bench.py / the driver).  Geometry kept tiny: interpret mode
executes the step python-level per scan iteration.
"""
import numpy as np
import pytest

from spaln_tpu.config import Config, resolve, CvsG
from spaln_tpu.ops.params import DpParams, DpFlags
from spaln_tpu.ops.dp_spliced_scan import (prepare_spliced_batch,
                                           run_spliced_batch,
                                           collect_batch_results)
from spaln_tpu.ops.dp_spliced_pallas import run_spliced_batch_pallas
from spaln_tpu.score.intron import IntronPenalty
from spaln_tpu.score.simmtx import Simmtx
from spaln_tpu.score.splice import build_splice_signals
from spaln_tpu.score.tables import TableDir, find_table_dir
from spaln_tpu.seq.codec import encode_dna


@pytest.fixture(scope="module")
def ctx():
    cfg = resolve(Config(), CvsG)
    prm = DpParams.build(cfg, Simmtx.dna(), CvsG,
                         ipen=IntronPenalty(cfg, CvsG))
    tables = TableDir(find_table_dir())
    return cfg, prm, tables


def _spliced_problems(cfg, tables, B, M, ilen, seed=0):
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    queries, genomes, sigs = [], [], []
    for i in range(B):
        e1 = "".join(rng.choice(bases, M // 2))
        e2 = "".join(rng.choice(bases, M - M // 2))
        gi = "GTAAGT" + "".join(rng.choice(bases, ilen - 13)) + "TTTCTAG"
        g = e1 + gi + e2 + "".join(rng.choice(bases, 7 + (i % 5)))
        queries.append(encode_dna(e1 + e2))
        gc = encode_dna(g)
        genomes.append(gc)
        sigs.append(build_splice_signals(gc, cfg, tables))
    return queries, genomes, sigs


@pytest.mark.parametrize("B,M,ilen,W", [(8, 40, 60, 192),
                                        (3, 40, 60, 192)])
def test_pallas_matches_scan_spliced(ctx, B, M, ilen, W):
    cfg, prm, tables = ctx
    queries, genomes, sigs = _spliced_problems(cfg, tables, B, M, ilen)
    lw = -(W // 2)
    bp = prepare_spliced_batch(queries, genomes, prm, sigs=sigs,
                               lw=lw, up=lw + W - 1, L=16)
    row_s, rc_s, _ = run_spliced_batch(bp, prm, score_only=True)
    s_scan, e_scan, _ = collect_batch_results(bp, row_s, rc_s, None,
                                              True, prm=prm)
    row_p, rc_p, _ = run_spliced_batch_pallas(bp, prm, score_only=True,
                                              interpret=True)
    s_pal, e_pal, _ = collect_batch_results(bp, row_p, rc_p, None,
                                            True, prm=prm)
    np.testing.assert_array_equal(s_pal, s_scan)
    np.testing.assert_array_equal(e_pal, e_scan)
    assert (s_scan > 0).all()


def test_pallas_matches_scan_per_problem_bands(ctx):
    """Per-problem band placements (deltas) through the pallas path."""
    cfg, prm, tables = ctx
    queries, genomes, sigs = _spliced_problems(cfg, tables, 4, 32, 48,
                                               seed=3)
    W = 128
    lws = [-20, -36, -28, -44]
    bp = prepare_spliced_batch(queries, genomes, prm, sigs=sigs,
                               lws=lws, W=W, L=16)
    row_s, rc_s, _ = run_spliced_batch(bp, prm, score_only=True)
    s_scan, _, _ = collect_batch_results(bp, row_s, rc_s, None, True,
                                         prm=prm)
    row_p, rc_p, _ = run_spliced_batch_pallas(bp, prm, score_only=True,
                                              interpret=True)
    s_pal, _, _ = collect_batch_results(bp, row_p, rc_p, None, True,
                                        prm=prm)
    np.testing.assert_array_equal(s_pal, s_scan)


def test_ipen_tiles_reconstruct_dense_table(ctx):
    """The carried-penalty scheme's head row + boundary bitmask must
    reproduce the dense table exactly: pen(n) for n >= PHEAD equals
    pen(PHEAD-1) minus the count of set boundary bits in (PHEAD-1, n]."""
    from spaln_tpu.ops.dp_spliced_pallas import (GRP, PHEAD, dense_ipen,
                                                 ipen_tiles)
    from spaln_tpu.ops.dp_spliced_scan import _pack_ipen
    cfg, prm, tables = ctx
    nmax = 5000
    tab_true = np.asarray(prm.intron_table(nmax + 1), np.int64)
    key = _pack_ipen(tab_true.astype(np.int32))
    dense = dense_ipen(key, nmax).astype(np.int64)
    np.testing.assert_array_equal(dense, tab_true[:len(dense)])
    head, bits, nbrow = ipen_tiles(key, nmax)
    words = np.concatenate([bits[r * GRP] for r in range(nbrow)])
    isb = (words[np.arange(nbrow * 4096) >> 5].astype(np.int64)
           >> (np.arange(nbrow * 4096) & 31)) & 1
    rec = np.zeros(nmax + 1, np.int64)
    rec[:PHEAD] = head[0][:PHEAD]
    run = int(head[0][PHEAD - 1])
    for n in range(PHEAD, nmax + 1):
        run -= int(isb[n])
        rec[n] = run
    np.testing.assert_array_equal(rec, dense)


def test_pallas_dagp_matches_scan(ctx):
    """Double affine (-yl3, Noll=3): Pallas == scan, score-only AND
    full-plane trace mode (fwd2s1_simd.h:65-349 supports Noll=3
    throughout; so must the kernel)."""
    import dataclasses
    from spaln_tpu.ops.dp_spliced_scan import (traceback_spliced_scan,
                                               traceback_device_batch)
    cfg, prm, tables = ctx
    prm = dataclasses.replace(prm, dagp=True, lgop=prm.gop // 2,
                              lgep=prm.gep // 3)
    queries, genomes, sigs = _spliced_problems(cfg, tables, 4, 40, 60,
                                               seed=3)
    W = 192
    lw = -(W // 2)
    bp = prepare_spliced_batch(queries, genomes, prm, sigs=sigs,
                               lw=lw, up=lw + W - 1, L=16)
    row_s, rc_s, tr_s = run_spliced_batch(bp, prm, score_only=False)
    s_scan, e_scan, btr = collect_batch_results(bp, row_s, rc_s, tr_s,
                                                False, prm=prm)
    row_p, rc_p, tr_p = run_spliced_batch_pallas(bp, prm,
                                                 score_only=False,
                                                 interpret=True)
    s_pal, e_pal, _ = collect_batch_results(bp, row_p, rc_p, None,
                                            True, prm=prm)
    np.testing.assert_array_equal(s_pal, s_scan)
    np.testing.assert_array_equal(e_pal, e_scan)
    assert (s_scan > 0).all()
    # trace planes -> identical op streams (5-state walk)
    ops_p = traceback_device_batch(bp, tr_p, e_scan)
    for b in range(bp.B):
        host_ops = traceback_spliced_scan(btr[b], int(e_scan[b][0]),
                                          int(e_scan[b][1]))
        assert host_ops == ops_p[b]


def test_fused_bucket_matches_unfused(ctx):
    """run_bucket_fused (one-dispatch slabs+ends+walk) == the per-slab
    trace path + host end extraction + device traceback, bit-exact."""
    from spaln_tpu.ops.dp_spliced_pallas import run_bucket_fused
    from spaln_tpu.ops.dp_spliced_scan import traceback_spliced_scan
    cfg, prm, tables = ctx
    queries, genomes, sigs = _spliced_problems(cfg, tables, 3, 40, 60,
                                               seed=5)
    lw = -96
    bp = prepare_spliced_batch(queries, genomes, prm, sigs=sigs,
                               lw=lw, up=lw + 192 - 1, L=16)
    row_s, rc_s, traces = run_spliced_batch(bp, prm, score_only=False)
    s_ref, e_ref, btr = collect_batch_results(bp, row_s, rc_s, traces,
                                              False, prm=prm)
    scores, ends, ops_all = run_bucket_fused(bp, prm)
    assert list(scores) == list(s_ref)
    for b in range(3):
        assert ends[b] == (int(e_ref[b][0]), int(e_ref[b][1]))
        ops_ref = traceback_spliced_scan(btr[b], int(e_ref[b][0]),
                                         int(e_ref[b][1]))
        assert ops_all[b] == ops_ref
