"""Block-dense (MXU) aggregation tier: correctness vs the hybrid path and
cost-model gating (ops/block.py).  Runs the Pallas kernel in interpret mode
on the CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from incagg_gnn_tpu.graph.csr import CSRGraph
from incagg_gnn_tpu.ops.block import (
    LANES,
    build_block_hybrid,
    plan_block_tier,
    spmm_block,
    spmm_block_mean,
)
from incagg_gnn_tpu.ops.ell import build_hybrid_adj, spmm_hybrid, spmm_hybrid_mean


def clustered_graph(rng, n=600, clusters=6, intra=4000, inter=1500):
    """Block-structured graph: dense intra-cluster + sparse inter edges."""
    size = n // clusters
    rows, cols = [], []
    for c in range(clusters):
        e = rng.integers(0, size, (intra, 2)) + c * size
        rows.append(e[:, 0])
        cols.append(e[:, 1])
    e = rng.integers(0, n, (inter, 2))
    rows.append(e[:, 0])
    cols.append(e[:, 1])
    row, col = np.concatenate(rows), np.concatenate(cols)
    val = rng.random(row.size).astype(np.float32)
    return CSRGraph.from_coo(row, col, n, val, coalesce=True)


class TestBlockTier:
    def test_sum_mean_binarized_match_hybrid(self, rng):
        g = clustered_graph(rng)
        n_pad = 640
        th = plan_block_tier(g.rowptr, g.col, n_pad, n_pad, x_itemsize=4)
        assert th is not None  # dense clusters -> tier pays
        adj = build_block_hybrid(g.rowptr, g.col, g.value, n_pad, n_pad,
                                 thresh=th)
        assert adj.dense.a.shape[0] % LANES == 0
        hyb = build_hybrid_adj(g.rowptr, g.col, g.value, n_pad, n_pad)
        x = jnp.asarray(rng.standard_normal((n_pad, 64)), jnp.float32)
        assert np.allclose(spmm_block(adj, x), spmm_hybrid(hyb, x), atol=1e-4)
        assert np.allclose(spmm_block_mean(adj, x), spmm_hybrid_mean(hyb, x),
                           atol=1e-4)
        assert np.allclose(
            spmm_block(adj.binarized(), x),
            spmm_hybrid(hyb.binarized(), x), atol=1e-4)

    def test_static_nb_pad_bucket(self, rng):
        g = clustered_graph(rng, n=400, clusters=4)
        n_pad = 512
        adj0 = build_block_hybrid(g.rowptr, g.col, g.value, n_pad, n_pad,
                                  thresh=32)
        need = int(adj0.dense.a.shape[0])
        adj = build_block_hybrid(g.rowptr, g.col, g.value, n_pad, n_pad,
                                 thresh=32, nb_pad=need + 3 * LANES)
        assert adj.dense.a.shape[0] == need + 3 * LANES
        hyb = build_hybrid_adj(g.rowptr, g.col, g.value, n_pad, n_pad)
        x = jnp.asarray(rng.standard_normal((n_pad, 32)), jnp.float32)
        assert np.allclose(spmm_block(adj, x), spmm_hybrid(hyb, x), atol=1e-4)

    def test_all_filler_when_no_dense_blocks(self, rng):
        # uniform sparse graph, huge threshold -> every tile is filler
        row = rng.integers(0, 500, 2000)
        col = rng.integers(0, 500, 2000)
        g = CSRGraph.from_coo(row, col, 500,
                              rng.random(2000).astype(np.float32),
                              coalesce=True)
        adj = build_block_hybrid(g.rowptr, g.col, g.value, 512, 512,
                                 thresh=10_000)
        hyb = build_hybrid_adj(g.rowptr, g.col, g.value, 512, 512)
        x = jnp.asarray(rng.standard_normal((512, 16)), jnp.float32)
        assert np.allclose(spmm_block(adj, x), spmm_hybrid(hyb, x), atol=1e-4)

    def test_plan_rejects_sparse_graph(self, rng):
        # low-degree uniform graph: dense tier must be rejected
        row = rng.integers(0, 2000, 15_000)
        col = rng.integers(0, 2000, 15_000)
        g = CSRGraph.from_coo(row, col, 2000, None, coalesce=True)
        assert plan_block_tier(g.rowptr, g.col, 2048, 2048) is None

    def test_plan_empty(self):
        rowptr = np.zeros(129, dtype=np.int64)
        assert plan_block_tier(rowptr, np.empty(0, np.int32), 128, 128) is None

    def test_bf16_tiles(self, rng):
        import ml_dtypes

        g = clustered_graph(rng, n=300, clusters=3)
        n_pad = 384
        adj = build_block_hybrid(g.rowptr, g.col, g.value, n_pad, n_pad,
                                 thresh=24, a_dtype=ml_dtypes.bfloat16)
        hyb = build_hybrid_adj(g.rowptr, g.col, g.value, n_pad, n_pad)
        x = jnp.asarray(rng.standard_normal((n_pad, 32)), jnp.bfloat16)
        want = np.asarray(spmm_hybrid(hyb, x.astype(jnp.float32)))
        got = np.asarray(spmm_block(adj, x), np.float32)
        assert np.abs(want - got).max() / np.abs(want).max() < 2e-2
