"""Property-based tests (hypothesis) for the host-side graph kernels.

Each property holds for *whichever* backend runs (native C++ or the numpy
fallback) — they assert the contract, not the implementation: relabel
preserves per-row edge order and values (reference contract:
csrc/cpu/relabel_cpu.cpp), partition returns a valid permutation+ptr,
the hybrid ELL/COO split is an exact repartition of the edge multiset,
transpose round-trips, and neighbor sampling returns in-order subsets.
"""

import pytest
import numpy as np
from hypothesis import given, settings, strategies as st

from incagg_gnn_tpu.graph.csr import CSRGraph
from incagg_gnn_tpu.graph.partition import partition_graph
from incagg_gnn_tpu.graph.relabel import (
    relabel_one_hop,
    relabel_one_hop_within_batch,
    sample_neighbors,
)
from incagg_gnn_tpu.utils.native import get_native_lib

SETTINGS = dict(max_examples=30, deadline=None)


@st.composite
def graphs(draw, max_n=40, max_m=200, values=True):
    n = draw(st.integers(1, max_n))
    m = draw(st.integers(0, max_m))
    row = draw(st.lists(st.integers(0, n - 1), min_size=m, max_size=m))
    col = draw(st.lists(st.integers(0, n - 1), min_size=m, max_size=m))
    val = None
    if values:
        # strictly positive so a 0.0 never aliases ELL padding
        val = np.asarray(
            draw(st.lists(st.floats(0.1, 2.0, allow_nan=False),
                          min_size=m, max_size=m)), np.float32)
    g = CSRGraph.from_coo(np.asarray(row, np.int64), np.asarray(col, np.int64),
                          n, val, coalesce=True)
    return g


@st.composite
def graph_and_batch(draw):
    g = draw(graphs())
    n = g.num_nodes
    k = draw(st.integers(1, n))
    idx = draw(st.permutations(list(range(n))))[:k]
    return g, np.asarray(idx, np.int64)


class TestRelabelProperties:
    @settings(**SETTINGS)
    @given(graph_and_batch())
    def test_one_hop_preserves_rows(self, gb):
        g, idx = gb
        rowptr, col, value, n_id = relabel_one_hop(g, idx)
        assert np.array_equal(n_id[: len(idx)], idx)
        assert len(np.unique(n_id)) == len(n_id)  # no duplicate ids
        for i, node in enumerate(idx):
            lo, hi = int(rowptr[i]), int(rowptr[i + 1])
            glo, ghi = int(g.rowptr[node]), int(g.rowptr[node + 1])
            # relabeled cols map back to the original row, order preserved
            assert np.array_equal(n_id[col[lo:hi]], g.col[glo:ghi])
            if g.value is not None:
                assert np.array_equal(value[lo:hi], g.value[glo:ghi])

    @settings(**SETTINGS)
    @given(graph_and_batch())
    def test_one_hop_ob_first_seen_order(self, gb):
        g, idx = gb
        rowptr, col, value, n_id = relabel_one_hop(g, idx)
        nb = len(idx)
        ob = col[col >= nb]
        if ob.size:
            # walking edges in order, each new OB local id is the next integer
            firsts = ob[np.sort(np.unique(ob, return_index=True)[1])]
            assert np.array_equal(firsts, np.arange(nb, nb + len(firsts)))

    @settings(**SETTINGS)
    @given(graph_and_batch())
    def test_within_batch_is_induced_subgraph(self, gb):
        g, idx = gb
        rowptr, col, value, n_id = relabel_one_hop_within_batch(g, idx)
        assert np.array_equal(n_id, idx)
        assert col.size == 0 or col.max() < len(idx)
        in_batch = np.zeros(g.num_nodes, bool)
        in_batch[idx] = True
        for i, node in enumerate(idx):
            lo, hi = int(rowptr[i]), int(rowptr[i + 1])
            glo, ghi = int(g.rowptr[node]), int(g.rowptr[node + 1])
            keep = in_batch[g.col[glo:ghi]]
            assert np.array_equal(idx[col[lo:hi]], g.col[glo:ghi][keep])
            if g.value is not None:
                assert np.array_equal(value[lo:hi], g.value[glo:ghi][keep])


class TestPartitionProperties:
    @settings(**SETTINGS)
    @given(graphs(max_n=60, max_m=300, values=False),
           st.integers(1, 8), st.integers(0, 3))
    def test_partition_is_valid(self, g, num_parts, seed):
        num_parts = min(num_parts, g.num_nodes)
        perm, ptr = partition_graph(g, num_parts, seed=seed)
        assert np.array_equal(np.sort(perm), np.arange(g.num_nodes))
        assert ptr.shape[0] == num_parts + 1
        assert ptr[0] == 0 and ptr[-1] == g.num_nodes
        assert (np.diff(ptr) >= 0).all()


class TestEllProperties:
    @settings(**SETTINGS)
    @given(graphs(), st.integers(1, 12))
    def test_hybrid_split_is_exact(self, g, k):
        from incagg_gnn_tpu.ops.ell import build_hybrid_adj

        n = g.num_nodes
        trash = n  # one past the real nodes — never a real column
        h = build_hybrid_adj(g.rowptr, g.col, g.value, n + 1, n + 1, k=k)
        ell_cols = np.asarray(h.ell_cols)
        ell_vals = np.asarray(h.ell_vals)
        ovf_rows = np.asarray(h.ovf_rows)
        ovf_cols = np.asarray(h.ovf_cols)
        ovf_vals = np.asarray(h.ovf_vals)
        deg = np.diff(g.rowptr)
        assert (np.asarray(h.deg)[:n] == deg).all()
        # sorted overflow rows (segment-sum contract)
        assert (np.diff(ovf_rows) >= 0).all() or ovf_rows.size <= 1
        for r in range(n):
            glo, ghi = int(g.rowptr[r]), int(g.rowptr[r + 1])
            head = min(k, ghi - glo)
            # ELL holds the first min(deg, k) edges of the row, in order
            assert np.array_equal(ell_cols[r, :head], g.col[glo:glo + head])
            assert np.array_equal(ell_vals[r, :head], g.value[glo:glo + head])
            assert (ell_cols[r, head:] == trash).all()
            assert (ell_vals[r, head:] == 0).all()
            # overflow holds the tail, in order (padding lives on row n,
            # outside this loop)
            sel = ovf_rows == r
            tail_cols = ovf_cols[sel][: ghi - glo - head]
            assert np.array_equal(tail_cols, g.col[glo + head:ghi])
            assert np.array_equal(ovf_vals[sel][: ghi - glo - head],
                                  g.value[glo + head:ghi])


class TestTransposeProperties:
    @settings(**SETTINGS)
    @given(graphs())
    def test_native_transpose_matches_oracle(self, g):
        lib = get_native_lib()
        if lib is None:
            return
        t_rowptr, t_col, t_val = lib.transpose_csr(g.rowptr, g.col, g.value,
                                                   g.num_nodes)
        oracle = g.transpose()
        assert np.array_equal(t_rowptr, oracle.rowptr)
        assert np.array_equal(t_col, oracle.col)
        assert np.allclose(t_val, oracle.value)

    @settings(**SETTINGS)
    @given(graphs())
    def test_double_transpose_roundtrip(self, g):
        tt = g.transpose().transpose()
        assert np.array_equal(tt.rowptr, g.rowptr)
        assert np.array_equal(tt.col, g.col)
        assert np.allclose(tt.value, g.value)


class TestSampleProperties:
    @settings(**SETTINGS)
    @given(graphs(), st.integers(0, 10), st.integers(0, 3))
    def test_sample_is_inorder_subset(self, g, k, seed):
        rowptr, col, value = sample_neighbors(g.rowptr, g.col, g.value, k,
                                              seed=seed)
        deg = np.diff(g.rowptr)
        assert np.array_equal(np.diff(rowptr), np.minimum(deg, k))
        for r in range(g.num_nodes):
            lo, hi = int(rowptr[r]), int(rowptr[r + 1])
            glo, ghi = int(g.rowptr[r]), int(g.rowptr[r + 1])
            # sampled (col, value) pairs are an order-preserving subsequence
            row_pairs = list(zip(g.col[glo:ghi].tolist(),
                                 g.value[glo:ghi].tolist()))
            it = iter(row_pairs)
            for pair in zip(col[lo:hi].tolist(), value[lo:hi].tolist()):
                assert any(p == pair for p in it), (
                    f"row {r}: {pair} not an in-order pick from {row_pairs}")


@pytest.mark.full
class TestBlockProperties:
    @given(g=graphs(max_n=40, max_m=200), thresh=st.integers(1, 12),
           d=st.integers(1, 9))
    @settings(**SETTINGS)
    def test_bi_block_forward_and_grad_match_dense(self, g, thresh, d):
        """For any coalesced graph and any per-block threshold, the
        bidirectional block tier computes A @ x and the custom VJP computes
        A^T @ w exactly (vs the dense matmul oracle)."""
        import jax
        import jax.numpy as jnp

        from incagg_gnn_tpu.ops.block import (
            build_bi_block_hybrid, spmm_block_bi)

        n_pad = 128 * max(1, -(-g.num_nodes // 128))
        adj = build_bi_block_hybrid(g.rowptr, g.col, g.value, n_pad, n_pad,
                                    thresh=thresh)
        dense = np.zeros((n_pad, n_pad), np.float32)
        deg = np.diff(g.rowptr)
        rows = np.repeat(np.arange(g.num_nodes), deg)
        np.add.at(dense, (rows, g.col),
                  g.value if g.value is not None else 1.0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((n_pad, d)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((n_pad, d)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(spmm_block_bi(adj, x)), dense @ np.asarray(x),
            atol=1e-3)
        gx = jax.grad(lambda x: (spmm_block_bi(adj, x) * w).sum())(x)
        np.testing.assert_allclose(
            np.asarray(gx), dense.T @ np.asarray(w), atol=1e-3)
