"""Correctness tests for the hybrid ELL/COO aggregation path vs the COO
segment-sum path and dense oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incagg_gnn_tpu.graph.csr import CSRGraph
from incagg_gnn_tpu.ops.ell import (
    HybridAdj,
    build_hybrid_adj,
    choose_k,
    spmm_hybrid,
    spmm_hybrid_max,
    spmm_hybrid_mean,
)
from incagg_gnn_tpu.ops.spmm import build_padded_adj, spmm, spmm_max, spmm_mean


def random_csr(rng, r=50, c=70, nnz=400, weighted=True, hub=True):
    row = rng.integers(0, r, nnz)
    if hub:  # force a heavy-tail row to exercise the overflow path
        row[: nnz // 4] = 3
    col = rng.integers(0, c, nnz)
    val = rng.random(nnz).astype(np.float32) if weighted else None
    g = CSRGraph.from_coo(row, col, r, val, coalesce=True)
    return g.rowptr, g.col, g.value, r, c


class TestHybrid:
    @pytest.mark.parametrize("weighted", [True, False])
    @pytest.mark.parametrize("k", [4, 8, 64])
    def test_sum_matches_coo(self, rng, weighted, k):
        rowptr, col, val, r, c = random_csr(rng, weighted=weighted)
        coo = build_padded_adj(rowptr, col, val, 64, 128, 1024)
        hyb = build_hybrid_adj(rowptr, col, val, 64, 128, k=k)
        x = jnp.asarray(rng.random((128, 16)).astype(np.float32))
        assert np.allclose(spmm_hybrid(hyb, x), spmm(coo, x), atol=1e-4)

    def test_mean_and_max_match(self, rng):
        rowptr, col, val, r, c = random_csr(rng, weighted=False)
        coo = build_padded_adj(rowptr, col, val, 64, 128, 1024)
        hyb = build_hybrid_adj(rowptr, col, val, 64, 128, k=8)
        x = jnp.asarray(rng.standard_normal((128, 8)).astype(np.float32))
        assert np.allclose(spmm_hybrid_mean(hyb, x), spmm_mean(coo, x), atol=1e-4)
        assert np.allclose(spmm_hybrid_max(hyb, x), spmm_max(coo, x), atol=1e-5)

    def test_deg_matches(self, rng):
        rowptr, col, val, r, c = random_csr(rng)
        coo = build_padded_adj(rowptr, col, val, 64, 128, 1024)
        hyb = build_hybrid_adj(rowptr, col, val, 64, 128, k=4)
        assert np.allclose(hyb.deg, coo.deg)

    def test_choose_k(self):
        deg = np.array([1, 2, 3, 4, 100])
        k = choose_k(deg, quantile=0.9)
        assert k >= 4 and k < 100
        assert k % 8 == 0

    def test_grad_matches_coo(self, rng):
        rowptr, col, val, r, c = random_csr(rng)
        coo = build_padded_adj(rowptr, col, val, 64, 128, 1024)
        hyb = build_hybrid_adj(rowptr, col, val, 64, 128, k=8)
        x = jnp.asarray(rng.random((128, 8)).astype(np.float32))
        g1 = jax.grad(lambda x: (spmm_hybrid(hyb, x) ** 2).sum())(x)
        g2 = jax.grad(lambda x: (spmm(coo, x) ** 2).sum())(x)
        assert np.allclose(g1, g2, atol=1e-3)

    def test_empty_overflow(self, rng):
        # K >= max degree -> overflow entirely padding
        rowptr, col, val, r, c = random_csr(rng, hub=False)
        kmax = int(np.diff(rowptr).max())
        hyb = build_hybrid_adj(rowptr, col, val, 64, 128, k=((kmax + 7) // 8) * 8)
        assert float(jnp.abs(hyb.ovf_vals).sum()) == 0.0
        coo = build_padded_adj(rowptr, col, val, 64, 128, 1024)
        x = jnp.asarray(rng.random((128, 4)).astype(np.float32))
        assert np.allclose(spmm_hybrid(hyb, x), spmm(coo, x), atol=1e-4)
