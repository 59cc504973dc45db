"""Unit tests for the host graph core: CSR container, gcn_norm, partitioner,
relabel kernels (numpy oracle vs native C++), permutation invariants.

The reference ships no tests (SURVEY §4); oracles here are brute-force dense
numpy implementations.
"""

import numpy as np
import pytest

from incagg_gnn_tpu.graph.csr import CSRGraph, gcn_norm, permute
from incagg_gnn_tpu.graph.partition import (
    edge_cut_fraction,
    ind2ptr,
    partition_graph,
)
from incagg_gnn_tpu.graph.relabel import (
    relabel_one_hop,
    relabel_one_hop_within_batch,
    sample_neighbors,
)
from incagg_gnn_tpu.utils import native as native_mod


def dense(adj: CSRGraph, num_cols=None):
    n = adj.num_nodes
    c = num_cols or n
    d = np.zeros((n, c))
    row, col, val = adj.to_coo()
    d[row, col] = val if val is not None else 1.0
    return d


def random_graph(rng, n=50, avg_deg=5, weighted=True):
    e = n * avg_deg
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    keep = row != col
    row, col = row[keep], col[keep]
    val = rng.random(row.shape[0]).astype(np.float32) if weighted else None
    return CSRGraph.from_coo(row, col, n, val)


class TestCSR:
    def test_from_coo_roundtrip(self, rng):
        g = random_graph(rng)
        r, c, v = g.to_coo()
        g2 = CSRGraph.from_coo(r, c, g.num_nodes, v)
        assert np.array_equal(g.rowptr, g2.rowptr)
        assert np.array_equal(g.col, g2.col)
        assert np.allclose(g.value, g2.value)

    def test_coalesce_sums_duplicates(self):
        g = CSRGraph.from_coo([0, 0, 1], [1, 1, 0], 2, np.array([1.0, 2.0, 3.0]))
        assert g.nnz == 2
        assert np.allclose(sorted(g.value), [3.0, 3.0])

    def test_set_diag(self, rng):
        g = random_graph(rng)
        gd = g.set_diag(2.5)
        d = dense(gd)
        assert np.allclose(np.diag(d), 2.5)
        off = ~np.eye(g.num_nodes, dtype=bool)
        assert np.allclose(d[off], dense(g)[off])

    def test_transpose(self, rng):
        g = random_graph(rng)
        assert np.allclose(dense(g.transpose()), dense(g).T)

    def test_gcn_norm_dense_oracle(self, rng):
        g = random_graph(rng, weighted=False).set_diag()
        a = dense(g)
        deg = a.sum(axis=1)
        dinv = 1 / np.sqrt(deg)
        dinv[~np.isfinite(dinv)] = 0
        expected = dinv[:, None] * a * dinv[None, :]
        assert np.allclose(dense(gcn_norm(g)), expected, atol=1e-6)


class TestPartition:
    def test_ind2ptr(self):
        ind = np.array([0, 0, 1, 1, 1, 3])
        assert np.array_equal(ind2ptr(ind, 4), [0, 2, 5, 5, 6])

    def test_partition_balanced_and_local(self, sbm_small):
        data, _, _ = sbm_small
        perm, ptr = partition_graph(data.adj_t, 8, seed=0)
        n = data.num_nodes
        assert sorted(perm.tolist()) == list(range(n))
        sizes = np.diff(ptr)
        assert sizes.sum() == n
        assert sizes.max() <= int(np.ceil(n / 8) * 1.1) + 1
        # locality: cut must be far below the random-partition expectation
        cluster = np.empty(n, dtype=np.int64)
        for k in range(8):
            cluster[perm[ptr[k]:ptr[k + 1]]] = k
        cut = edge_cut_fraction(data.adj_t, cluster)
        assert cut < 0.55  # random would be ~7/8 = 0.875

    def test_multilevel_method(self, sbm_small):
        """partition_graph(method="multilevel") — the METIS-style V-cycle —
        honors the same (perm, ptr) contract and finds real locality."""
        data, _, _ = sbm_small
        n = data.num_nodes
        perm, ptr = partition_graph(data.adj_t, 8, seed=0, method="multilevel")
        assert sorted(perm.tolist()) == list(range(n))
        assert np.diff(ptr).sum() == n
        cluster = np.empty(n, dtype=np.int64)
        for k in range(8):
            cluster[perm[ptr[k]:ptr[k + 1]]] = k
        assert edge_cut_fraction(data.adj_t, cluster) < 0.55
        with pytest.raises(ValueError):
            partition_graph(data.adj_t, 8, method="metis5")

    def test_single_part(self, sbm_tiny):
        data, _, _ = sbm_tiny
        perm, ptr = partition_graph(data.adj_t, 1)
        assert np.array_equal(perm, np.arange(data.num_nodes))
        assert np.array_equal(ptr, [0, data.num_nodes])

    def test_native_matches_contract(self, sbm_tiny):
        data, _, _ = sbm_tiny
        lib = native_mod.get_native_lib()
        if lib is None:
            pytest.skip("native lib unavailable")
        out = lib.partition(data.adj_t.rowptr, data.adj_t.col, 4, 2, 0)
        assert out.shape == (data.num_nodes,)
        assert set(np.unique(out)) <= set(range(4))
        sizes = np.bincount(out, minlength=4)
        assert sizes.max() <= int(np.ceil(data.num_nodes / 4) * 1.1) + 1


class TestPermute:
    def test_permute_preserves_graph(self, sbm_tiny):
        data, _, _ = sbm_tiny
        rng = np.random.default_rng(3)
        perm = rng.permutation(data.num_nodes)
        pd = permute(data, perm)
        # adjacency consistency: dense[perm][:, perm] == permuted dense
        a = dense(data.adj_t)
        b = dense(pd.adj_t)
        assert np.allclose(b, a[np.ix_(perm, perm)])
        assert np.allclose(pd.x, data.x[perm])
        assert np.array_equal(pd.y, data.y[perm])


class TestRelabel:
    @pytest.mark.parametrize("use_native", [False, True])
    @pytest.mark.parametrize("weighted", [False, True])
    def test_one_hop_semantics(self, rng, use_native, weighted, monkeypatch):
        if not use_native:
            monkeypatch.setattr(native_mod, "_LIB", None)
            monkeypatch.setattr(native_mod, "_TRIED", True)
        elif native_mod.get_native_lib() is None:
            pytest.skip("native lib unavailable")
        g = random_graph(rng, n=60, weighted=weighted)
        idx = np.arange(10, 25, dtype=np.int64)
        rowptr, col, value, n_id = relabel_one_hop(g, idx)
        # rows = IB nodes in idx order; every edge preserved with values
        assert rowptr.shape[0] == idx.shape[0] + 1
        assert np.array_equal(n_id[: idx.shape[0]], idx)
        assert len(set(n_id.tolist())) == n_id.shape[0]
        full = dense(g)
        sub = np.zeros((idx.shape[0], n_id.shape[0]), dtype=np.float64)
        rows = np.repeat(np.arange(idx.shape[0]), np.diff(rowptr))
        sub[rows, col] = value if value is not None else 1.0
        assert np.allclose(sub, full[np.ix_(idx, n_id)], atol=1e-6)
        # OB appended after IB, all referenced
        ob = n_id[idx.shape[0]:]
        assert not np.isin(ob, idx).any()
        assert set(col.tolist()) | set(range(idx.shape[0])) >= set(range(n_id.shape[0]))

    @pytest.mark.parametrize("use_native", [False, True])
    @pytest.mark.parametrize("weighted", [False, True])
    def test_within_batch_semantics(self, rng, use_native, weighted, monkeypatch):
        if not use_native:
            monkeypatch.setattr(native_mod, "_LIB", None)
            monkeypatch.setattr(native_mod, "_TRIED", True)
        elif native_mod.get_native_lib() is None:
            pytest.skip("native lib unavailable")
        g = random_graph(rng, n=60, weighted=weighted)
        idx = np.arange(10, 25, dtype=np.int64)
        rowptr, col, value, n_id = relabel_one_hop_within_batch(g, idx)
        assert np.array_equal(n_id, idx)
        assert (col < idx.shape[0]).all()
        full = dense(g)
        sub = np.zeros((idx.shape[0], idx.shape[0]))
        rows = np.repeat(np.arange(idx.shape[0]), np.diff(rowptr))
        sub[rows, col] = value if value is not None else 1.0
        assert np.allclose(sub, full[np.ix_(idx, idx)], atol=1e-6)

    def test_native_matches_numpy(self, rng, monkeypatch):
        if native_mod.get_native_lib() is None:
            pytest.skip("native lib unavailable")
        g = random_graph(rng, n=200, weighted=True)
        idx = np.sort(rng.choice(200, 50, replace=False)).astype(np.int64)
        res_native = relabel_one_hop(g, idx)
        monkeypatch.setattr(native_mod, "_LIB", None)
        monkeypatch.setattr(native_mod, "_TRIED", True)
        res_np = relabel_one_hop(g, idx)
        for a, b in zip(res_native, res_np):
            if a is None:
                assert b is None
            else:
                assert np.allclose(a, b)


class TestSampleNeighbors:
    def test_caps_degree(self, rng):
        g = random_graph(rng, n=40, avg_deg=12, weighted=True)
        idx = np.arange(40, dtype=np.int64)
        rowptr, col, value, n_id = relabel_one_hop(g, idx)
        srp, scol, sval = sample_neighbors(rowptr, col, value, 4, seed=1)
        deg = np.diff(srp)
        assert (deg <= 4).all()
        assert np.array_equal(np.minimum(np.diff(rowptr), 4), deg)
        # sampled edges are a subset of original edges (per row)
        for i in range(40):
            orig = set(col[rowptr[i]:rowptr[i + 1]].tolist())
            assert set(scol[srp[i]:srp[i + 1]].tolist()) <= orig
