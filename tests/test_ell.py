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


class TestParallelTransposeELL:
    """The C++ transpose-ELL build switches to a chunked parallel counting
    sort at >=2^17 edges; its placement (including t2f) must be bit-identical
    to the numpy oracle path."""

    def test_large_graph_native_vs_oracle(self, monkeypatch):
        from incagg_gnn_tpu.ops import ell as ell_mod
        from incagg_gnn_tpu.utils import native as native_mod

        rng = np.random.default_rng(7)
        r = c = 20_000
        nnz = 400_000  # well past the 131072 parallel threshold
        row = rng.integers(0, r, nnz)
        row[: nnz // 10] = 13  # heavy-tail row -> forward+transpose overflow
        col = rng.integers(0, c, nnz)
        col[: nnz // 12] = 4_242  # heavy-tail column -> transpose overflow
        val = rng.random(nnz).astype(np.float32)
        g = CSRGraph.from_coo(row, col, r, val, coalesce=True)
        r_pad = c_pad = 20_096
        kwargs = dict(k=16, k_t=16, ovf_pad=65_536, ovf_pad_t=65_536,
                      with_perm=True)

        got = ell_mod.build_bi_hybrid_adj(
            g.rowptr, g.col, g.value, r_pad, c_pad, **kwargs)

        monkeypatch.setattr(native_mod, "get_native_lib", lambda: None)
        want = ell_mod.build_bi_hybrid_adj(
            g.rowptr, g.col, g.value, r_pad, c_pad, **kwargs)

        for name in ("ell_cols", "ell_vals", "ovf_rows", "ovf_cols",
                     "ovf_vals", "deg"):
            a, b = getattr(got.bwd, name), getattr(want.bwd, name)
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"bwd.{name}")
        np.testing.assert_array_equal(
            np.asarray(got.t2f), np.asarray(want.t2f), err_msg="t2f")


class TestChunkedELL:
    """Row-chunked ELL aggregation (memory-budgeted lax.map path) must match
    the single-gather path exactly (reddit-scale [R,K,D] would OOM whole)."""

    def test_sum_and_max_chunked_match(self, rng, monkeypatch):
        from incagg_gnn_tpu.ops import ell as ell_mod

        rowptr, col, val, r, c = random_csr(rng, r=300, c=350, nnz=3000)
        hyb = build_hybrid_adj(rowptr, col, val, 320, 384, k=8)
        x = jnp.asarray(rng.standard_normal((384, 16)).astype(np.float32))
        want_sum = np.asarray(spmm_hybrid(hyb, x))
        want_max = np.asarray(spmm_hybrid_max(hyb, x))

        # force ~5 chunks (need = 320*8*16*4 = 160KB)
        monkeypatch.setattr(ell_mod, "_ELL_BUDGET_BYTES", 32 << 10)
        got_sum = np.asarray(spmm_hybrid(hyb, x))
        got_max = np.asarray(spmm_hybrid_max(hyb, x))
        assert np.allclose(want_sum, got_sum, atol=1e-5)
        np.testing.assert_array_equal(want_max, got_max)

    def test_chunked_rows_not_multiple_of_chunk(self, rng, monkeypatch):
        from incagg_gnn_tpu.ops import ell as ell_mod

        # r_pad deliberately NOT a multiple of the chunk size the budget
        # implies -> exercises the padding/slice tail
        rowptr, col, val, r, c = random_csr(rng, r=100, c=120, nnz=900)
        hyb = build_hybrid_adj(rowptr, col, val, 104, 128, k=8)
        x = jnp.asarray(rng.standard_normal((128, 8)).astype(np.float32))
        want = np.asarray(spmm_hybrid(hyb, x))
        monkeypatch.setattr(ell_mod, "_ELL_BUDGET_BYTES", 8 << 10)
        got = np.asarray(spmm_hybrid(hyb, x))
        assert got.shape == want.shape
        assert np.allclose(want, got, atol=1e-5)


class TestBiMax:
    """spmm_bi_max: scatter-free transpose backward for max aggregation
    (VERDICT r1 #7) — must match XLA autodiff exactly, ties included."""

    def _bi(self, rng, **kw):
        from incagg_gnn_tpu.ops.ell import build_bi_hybrid_adj

        rowptr, col, val, r, c = random_csr(rng, **kw)
        return (build_bi_hybrid_adj(rowptr, col, val, 64, 128, k=8),
                rowptr, col, val)

    def test_forward_matches_hybrid_max(self, rng):
        from incagg_gnn_tpu.ops.ell import spmm_bi_max

        bi, rowptr, col, val = self._bi(rng)
        x = jnp.asarray(rng.random((128, 16)).astype(np.float32))
        assert np.allclose(spmm_bi_max(bi, x), spmm_hybrid_max(bi.fwd, x))

    def test_grad_matches_autodiff(self, rng):
        from incagg_gnn_tpu.ops.ell import spmm_bi_max

        bi, rowptr, col, val = self._bi(rng)
        x = jnp.asarray(rng.random((128, 16)).astype(np.float32))
        w = jnp.asarray(rng.random((64, 16)).astype(np.float32))

        g_custom = jax.grad(lambda x: (w * spmm_bi_max(bi, x)).sum())(x)
        g_auto = jax.grad(lambda x: (w * spmm_hybrid_max(bi.fwd, x)).sum())(x)
        assert np.allclose(g_custom, g_auto, atol=1e-5), (
            np.abs(np.asarray(g_custom) - np.asarray(g_auto)).max())

    def test_tied_grad_matches_dense_oracle(self, rng):
        """With tied maxima the custom backward splits the cotangent evenly
        among ALL tied neighbors — exactly what autodiff of a dense rowwise
        max does.  (The composed hybrid autodiff deviates here: it splits
        across the ELL/overflow *branches* first, an artifact of the
        decomposition — measured 0.32 max error vs the dense oracle where
        the custom path is exact to 2e-7.)"""
        from incagg_gnn_tpu.graph.csr import CSRGraph
        from incagg_gnn_tpu.ops.ell import build_bi_hybrid_adj, spmm_bi_max

        nnz = 400
        row = rng.integers(0, 50, nnz)
        row[: nnz // 4] = 3  # hub row -> overflow edges
        col = rng.integers(0, 70, nnz)
        g = CSRGraph.from_coo(row, col, 50,
                              rng.random(nnz).astype(np.float32),
                              coalesce=True)
        bi = build_bi_hybrid_adj(g.rowptr, g.col, g.value, 64, 128, k=8)
        xv = np.round(rng.random((128, 16)).astype(np.float32) * 3.0) / 3.0
        x = jnp.asarray(xv)
        w = jnp.asarray(rng.random((64, 16)).astype(np.float32))

        mask = np.zeros((64, 128), bool)
        mask[np.repeat(np.arange(50), np.diff(g.rowptr)), g.col] = True
        mj = jnp.asarray(mask)

        def dense_max(x):
            m = jnp.where(mj[:, :, None], x[None, :, :], -jnp.inf)
            return jnp.where(mj.sum(1)[:, None] > 0, jnp.max(m, axis=1), 0.0)

        g_dense = jax.grad(lambda x: (w * dense_max(x)).sum())(x)
        g_custom = jax.grad(lambda x: (w * spmm_bi_max(bi, x)).sum())(x)
        assert np.allclose(g_custom, g_dense, atol=1e-5), (
            np.abs(np.asarray(g_custom) - np.asarray(g_dense)).max())

    def test_min_rides_the_same_backward(self, rng):
        from incagg_gnn_tpu.ops.agg import spmm_min
        from incagg_gnn_tpu.ops.ell import spmm_bi_max

        bi, *_ = self._bi(rng)
        x = jnp.asarray(rng.random((128, 16)).astype(np.float32))
        w = jnp.asarray(rng.random((64, 16)).astype(np.float32))
        g1 = jax.grad(lambda x: (w * spmm_min(bi, x)).sum())(x)
        g2 = jax.grad(lambda x: (w * -spmm_bi_max(bi, -x)).sum())(x)
        assert np.allclose(g1, g2, atol=1e-6)
