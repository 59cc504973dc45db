"""Tests for padded SpMM ops and the subgraph loaders: padded aggregation must
match dense oracles, and batch subgraphs must reassemble into the full graph
(SURVEY §4 'golden' tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incagg_gnn_tpu.graph.csr import CSRGraph, gcn_norm
from incagg_gnn_tpu.graph.partition import partition_graph
from incagg_gnn_tpu.graph.csr import permute
from incagg_gnn_tpu.loader import EvalSubgraphLoader, SubgraphLoader
from incagg_gnn_tpu.ops.spmm import (
    build_padded_adj,
    segment_softmax,
    spmm,
    spmm_max,
    spmm_mean,
)


def dense_of(rowptr, col, value, num_rows, num_cols):
    d = np.zeros((num_rows, num_cols))
    rows = np.repeat(np.arange(num_rows), np.diff(rowptr))
    d[rows, col] = value if value is not None else 1.0
    return d


class TestPaddedSpmm:
    def _random_csr(self, rng, r=37, c=53, nnz=200, weighted=True):
        row = np.sort(rng.integers(0, r, nnz))
        col = rng.integers(0, c, nnz)
        val = rng.random(nnz).astype(np.float32) if weighted else None
        g = CSRGraph.from_coo(row, col, r, val, coalesce=True)
        # re-extract (coalesced)
        return g.rowptr, g.col, g.value, r, c

    @pytest.mark.parametrize("weighted", [True, False])
    def test_sum_matches_dense(self, rng, weighted):
        rowptr, col, val, r, c = self._random_csr(rng, weighted=weighted)
        adj = build_padded_adj(rowptr, col, val, 64, 64, 512)
        x = rng.random((64, 16)).astype(np.float32)
        x[c:] = 0
        out = spmm(adj, jnp.asarray(x))
        expected = dense_of(rowptr, col, val, r, c) @ x[:c]
        assert np.allclose(out[:r], expected, atol=1e-4)
        assert np.allclose(out[r:], 0.0)

    def test_mean_matches_dense(self, rng):
        rowptr, col, val, r, c = self._random_csr(rng, weighted=False)
        adj = build_padded_adj(rowptr, col, val, 64, 64, 512)
        x = rng.random((64, 8)).astype(np.float32)
        out = spmm_mean(adj, jnp.asarray(x))
        d = dense_of(rowptr, col, None, r, c)
        deg = np.maximum(d.sum(1), 1)
        expected = (d @ x[:c]) / deg[:, None]
        assert np.allclose(out[:r], expected, atol=1e-4)

    def test_max_matches_dense(self, rng):
        rowptr, col, val, r, c = self._random_csr(rng, weighted=False)
        adj = build_padded_adj(rowptr, col, val, 64, 64, 512)
        x = rng.standard_normal((64, 8)).astype(np.float32)
        out = spmm_max(adj, jnp.asarray(x))
        d = dense_of(rowptr, col, None, r, c).astype(bool)
        expected = np.zeros((r, 8))
        for i in range(r):
            if d[i].any():
                expected[i] = x[:c][d[i]].max(0)
        assert np.allclose(out[:r], expected, atol=1e-5)

    def test_grad_flows(self, rng):
        rowptr, col, val, r, c = self._random_csr(rng)
        adj = build_padded_adj(rowptr, col, val, 64, 64, 512)

        def loss(x):
            return spmm(adj, x).sum()

        g = jax.grad(loss)(jnp.asarray(rng.random((64, 4)).astype(np.float32)))
        # grad wrt x = A^T @ ones
        at = dense_of(rowptr, col, val, r, c).T
        assert np.allclose(g[:c], at @ np.ones((r, 4)), atol=1e-4)

    def test_mask_in_batch(self, rng):
        rowptr, col, val, r, c = self._random_csr(rng)
        adj = build_padded_adj(rowptr, col, val, 64, 64, 512)
        bs = 20
        masked = adj.mask_in_batch(bs)
        x = rng.random((64, 4)).astype(np.float32)
        out = spmm(masked, jnp.asarray(x))
        d = dense_of(rowptr, col, val, r, c)
        d[:, bs:] = 0
        assert np.allclose(out[:r], d @ x[:c], atol=1e-4)
        # degrees recomputed
        assert np.allclose(masked.deg[:r], (d != 0).sum(1))

    def test_segment_softmax(self, rng):
        rows = jnp.asarray(np.array([0, 0, 1, 2, 2, 2], dtype=np.int32))
        scores = jnp.asarray(rng.standard_normal((6, 2)).astype(np.float32))
        valid = jnp.asarray(np.array([1, 1, 1, 1, 1, 0], dtype=bool))
        out = np.asarray(segment_softmax(scores, rows, 4, valid))
        assert np.allclose(out[:2].sum(0), 1.0, atol=1e-5)
        assert np.allclose(out[2], 1.0, atol=1e-5)
        assert np.allclose(out[3:5].sum(0), 1.0, atol=1e-5)
        assert np.allclose(out[5], 0.0)


class TestLoader:
    def _prepared(self, sbm_small, num_parts=8):
        data, _, _ = sbm_small
        perm, ptr = partition_graph(data.adj_t, num_parts, seed=0)
        data = permute(data, perm)
        data.adj_t = gcn_norm(data.adj_t.set_diag())
        return data, ptr

    def test_gas_batches_cover_graph(self, sbm_small):
        data, ptr = self._prepared(sbm_small)
        loader = SubgraphLoader(data, ptr, batch_size=2, mode="gas")
        seen = np.zeros(data.num_nodes, dtype=bool)
        full = np.zeros((data.num_nodes, data.num_nodes))
        row, col, val = data.adj_t.to_coo()
        dense_full = np.zeros_like(full)
        dense_full[row, col] = val
        for hb in loader:
            bs, n_id = hb.batch_size, hb.n_id
            assert not seen[n_id[:bs]].any()
            seen[n_id[:bs]] = True
            # offset/count contract: IB ids are the contiguous cluster ranges
            expect_ib = np.concatenate(
                [np.arange(o, o + c) for o, c in zip(hb.offset, hb.count)]
            )
            assert np.array_equal(n_id[:bs], expect_ib)
            # device batch reassembles rows of the global matrix
            dev = hb.device
            rows = np.asarray(dev.adj.rows)
            cols = np.asarray(dev.adj.cols)
            vals = np.asarray(dev.adj.vals)
            real = vals != 0
            gr = n_id[rows[real]]  # local row -> global
            gc = np.asarray(dev.n_id)[cols[real]]
            full[gr, gc] += vals[real]
        assert seen.all()
        assert np.allclose(full, dense_full, atol=1e-5)

    def test_ib_batches_drop_ob_edges(self, sbm_small):
        data, ptr = self._prepared(sbm_small)
        loader = SubgraphLoader(data, ptr, batch_size=2, mode="ib")
        row, col, val = data.adj_t.to_coo()
        dense_full = np.zeros((data.num_nodes, data.num_nodes))
        dense_full[row, col] = val
        for hb in loader:
            dev = hb.device
            n_id = hb.n_id
            bs = hb.batch_size
            assert hb.num_nodes == bs  # no OB nodes at all (SURVEY §3.3)
            vals = np.asarray(dev.adj.vals)
            real = vals != 0
            gr = n_id[np.asarray(dev.adj.rows)[real]]
            gc = n_id[np.asarray(dev.adj.cols)[real]]
            ib_set = np.zeros(data.num_nodes, bool)
            ib_set[n_id] = True
            expected = dense_full[np.ix_(n_id, n_id)]
            got = np.zeros_like(expected)
            pos = np.empty(data.num_nodes, np.int64)
            pos[n_id] = np.arange(bs)
            got[pos[gr], pos[gc]] += vals[real]
            assert np.allclose(got, expected, atol=1e-5)

    def test_ns_mode_caps_edges(self, sbm_small):
        data, ptr = self._prepared(sbm_small)
        loader = SubgraphLoader(data, ptr, batch_size=2, mode="ns", num_neighbors=3,
                                shuffle=True, seed=5)
        for hb in loader:
            dev = hb.device
            vals = np.asarray(dev.adj.vals)
            rows = np.asarray(dev.adj.rows)[vals != 0]
            counts = np.bincount(rows, minlength=dev.adj.num_rows)
            assert counts.max() <= 3

    def test_shuffle_changes_grouping(self, sbm_small):
        data, ptr = self._prepared(sbm_small)
        loader = SubgraphLoader(data, ptr, batch_size=2, mode="ib", shuffle=True, seed=0)
        first = [hb.n_id[: hb.batch_size].copy() for hb in loader]
        second = [hb.n_id[: hb.batch_size].copy() for hb in loader]
        assert any(
            a.shape != b.shape or not np.array_equal(a, b)
            for a, b in zip(first, second)
        )

    def test_eval_loader_coarsens(self, sbm_small):
        data, ptr = self._prepared(sbm_small)
        loader = EvalSubgraphLoader(data, ptr, batch_size=3)
        assert len(loader) == -(-(len(ptr) - 1) // 3)
        total = sum(hb.batch_size for hb in loader)
        assert total == data.num_nodes

    def test_padding_is_harmless(self, sbm_small):
        """Trash-row contract: gathering features via padded n_id and running
        spmm gives exactly the unpadded result."""
        data, ptr = self._prepared(sbm_small)
        loader = SubgraphLoader(data, ptr, batch_size=2, mode="gas")
        x_full = np.concatenate([data.x, np.zeros((1, data.x.shape[1]), np.float32)])
        for hb in list(loader)[:2]:
            dev = hb.device
            xg = jnp.asarray(x_full)[dev.n_id]
            out = np.asarray(spmm(dev.adj, xg))
            # oracle: dense rows of global graph for IB nodes
            row, col, val = data.adj_t.to_coo()
            d = np.zeros((data.num_nodes, data.num_nodes))
            d[row, col] = val
            expected = d[hb.n_id[: hb.batch_size]] @ data.x
            assert np.allclose(out[: hb.batch_size], expected, atol=1e-4)
            assert np.allclose(out[hb.batch_size:], 0.0, atol=1e-5)


class TestSingletonShuffleCache:
    """batch_size=1 + shuffle: contents are epoch-invariant, so batches are
    collated once and replayed in the epoch's shuffled order."""

    def _prepared(self, sbm_small, num_parts=8):
        data, _, _ = sbm_small
        perm, ptr = partition_graph(data.adj_t, num_parts, seed=0)
        data = permute(data, perm)
        data.adj_t = gcn_norm(data.adj_t.set_diag())
        return data, ptr

    def test_replay_matches_fresh_collate_and_counts(self, sbm_small):
        data, ptr = self._prepared(sbm_small)
        cached = SubgraphLoader(data, ptr, batch_size=1, mode="ib",
                                shuffle=True, seed=7)
        calls = {"n": 0}
        orig = cached._collate

        def counting(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        cached._collate = counting
        epochs = [list(cached) for _ in range(3)]
        # one collate per cluster, total — not per epoch
        assert calls["n"] == cached.num_clusters
        # orders differ across epochs; batch set identical
        o0 = [int(hb.n_id[0]) for hb in epochs[0]]
        o1 = [int(hb.n_id[0]) for hb in epochs[1]]
        assert o0 != o1 and sorted(o0) == sorted(o1)
        # contents match a fresh unshuffled collation of the same cluster
        fresh = SubgraphLoader(data, ptr, batch_size=1, mode="ib",
                               shuffle=False, seed=7)
        by_first = {int(hb.n_id[0]): hb for hb in fresh}
        for hb in epochs[2]:
            ref = by_first[int(hb.n_id[0])]
            assert np.array_equal(np.asarray(hb.n_id), np.asarray(ref.n_id))
            assert hb.batch_size == ref.batch_size

    def test_ns_mode_not_cached(self, sbm_small):
        data, ptr = self._prepared(sbm_small)
        ns = SubgraphLoader(data, ptr, batch_size=1, mode="ns",
                            num_neighbors=3, shuffle=True, seed=0)
        calls = {"n": 0}
        orig = ns._collate

        def counting(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        ns._collate = counting
        list(ns), list(ns)
        assert calls["n"] == 2 * ns.num_clusters  # re-sampled every epoch


@pytest.mark.full
class TestStaticGroups:
    def test_static_groups_replay_fixed_composition(self):
        """static_groups: multi-cluster batches collate once; epochs replay
        the same batch set in different orders (vs per-epoch regrouping)."""
        from incagg_gnn_tpu.graph.csr import gcn_norm, permute
        from incagg_gnn_tpu.graph.datasets import make_sbm
        from incagg_gnn_tpu.graph.partition import partition_graph
        from incagg_gnn_tpu.loader import SubgraphLoader

        data, _, _ = make_sbm(num_nodes=800, num_classes=4, num_features=8,
                              avg_degree=12.0, seed=3)
        perm, ptr = partition_graph(data.adj_t, 8)
        data = permute(data, perm)
        data.adj_t = gcn_norm(data.adj_t.set_diag())
        ld = SubgraphLoader(data, ptr, batch_size=2, mode="gas", shuffle=True,
                            seed=0, adj_format="hybrid", static_groups=True)
        e1 = [tuple(hb.offset) for hb in ld]
        e2 = [tuple(hb.offset) for hb in ld]
        assert sorted(e1) == sorted(e2)  # same batch set
        assert e1 != e2  # different order across epochs
        # batches come from the same collated cache (no re-collate)
        assert ld._cache is not None and len(ld._cache) == len(e1)

    def test_static_groups_trains(self):
        from incagg_gnn_tpu.graph.datasets import get_data
        from incagg_gnn_tpu.models import GCN, GCNConfig
        from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

        d, in_c, out_c = get_data("/tmp/datasets", "sbm-small")
        cfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=True,
                            epochs=6, seed=0, static_groups=True)
        model = GCN(GCNConfig(
            num_nodes=d.num_nodes, in_channels=in_c, hidden_channels=32,
            out_channels=out_c, num_layers=2, dropout=0.0,
            drop_input=False, batch_norm=False, residual=False))
        res = Trainer(model, d, cfg).fit()
        assert res["best_test"] > 0.6, res


class TestAutoFormatGate:
    """Pin the worker-crash mitigation (VERDICT r1 #8): `adj_format=auto`
    must route tiny train batches (< 4096 expected rows) to COO — the
    composed hybrid train step intermittently crashed the v5e worker at
    ~1.4K-row shapes (docs/RESULTS.md "train-step worker-crash bisection",
    bisected on jax 0.9.0 / XLA:TPU of 2026-08-18) — and larger batches to
    the scatter-free tiers.  An intentional threshold change must be loud."""

    def _trainer(self, n_nodes, num_parts, batch_size, **kw):
        from incagg_gnn_tpu.graph.datasets import make_sbm
        from incagg_gnn_tpu.models import GCN, GCNConfig
        from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

        data, in_c, out_c = make_sbm(num_nodes=n_nodes, num_classes=4,
                                     num_features=16, avg_degree=8.0, seed=3)
        model = GCN(GCNConfig(
            num_nodes=data.num_nodes, in_channels=in_c, hidden_channels=16,
            out_channels=out_c, num_layers=2, dropout=0.0, drop_input=False,
            batch_norm=False, residual=False))
        tcfg = TrainerConfig(num_parts=num_parts, batch_size=batch_size,
                             vr_update=True, epochs=1, seed=0, **kw)
        return Trainer(model, data, tcfg)

    def test_small_batches_fall_back_to_coo(self):
        tr = self._trainer(2000, num_parts=8, batch_size=1)  # ~250 rows
        assert tr.train_loader.adj_format == "coo"
        # eval sweeps (forward-only) never showed the instability: stay tiered
        assert tr.eval_loader.adj_format in ("hybrid-fwd", "block-fwd")

    def test_large_batches_use_scatter_free_tier(self):
        tr = self._trainer(6000, num_parts=4, batch_size=4)  # ~6000 rows
        assert tr.train_loader.adj_format in ("block", "hybrid")

    def test_edge_dropout_forces_coo(self):
        tr = self._trainer(6000, num_parts=4, batch_size=4, edge_dropout=0.1)
        assert tr.train_loader.adj_format == "coo"
