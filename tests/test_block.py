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
        th = plan_block_tier(g.rowptr, g.col, n_pad, x_itemsize=4)
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

    def test_tile_cap_raises_threshold(self, rng, monkeypatch):
        """SMEM prefetch budget (ops/block.py): the plan must keep the
        dense-tile count under INCAGG_BLOCK_TILE_CAP by raising the
        threshold — one s32 per tile is scalar-prefetched to SMEM, and
        a 234K-tile graph failed Mosaic compilation outright."""
        import numpy as np

        g = clustered_graph(rng)
        n_pad = 640
        th0 = plan_block_tier(g.rowptr, g.col, n_pad, x_itemsize=4)
        assert th0 is not None
        deg = np.diff(g.rowptr)
        row = np.repeat(np.arange(g.rowptr.size - 1), deg)
        key = (row // 128) * (n_pad // 128) + g.col // 128
        counts = np.unique(key, return_counts=True)[1]
        n0 = int((counts >= th0).sum())
        assert n0 > 2
        monkeypatch.setenv("INCAGG_BLOCK_TILE_CAP", "2")
        th1 = plan_block_tier(g.rowptr, g.col, n_pad, x_itemsize=4)
        if th1 is not None:  # cost model may reject the shrunken tier
            assert int((counts >= th1).sum()) <= 2

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
        assert plan_block_tier(g.rowptr, g.col, 2048) is None

    def test_plan_empty(self):
        rowptr = np.zeros(129, dtype=np.int64)
        assert plan_block_tier(rowptr, np.empty(0, np.int32), 128) is None

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


class TestLoaderIntegration:
    def test_eval_loader_block_fwd_matches_hybrid(self, rng):
        from incagg_gnn_tpu.graph.datasets import make_sbm
        from incagg_gnn_tpu.graph.partition import partition_graph
        from incagg_gnn_tpu.graph.csr import permute, gcn_norm
        from incagg_gnn_tpu.loader import EvalSubgraphLoader
        from incagg_gnn_tpu.ops.agg import spmm, spmm_mean
        from incagg_gnn_tpu.ops.block import BlockHybridAdj

        data, _, _ = make_sbm(num_nodes=800, num_classes=4, num_features=8,
                              avg_degree=30.0, seed=3)
        perm, ptr = partition_graph(data.adj_t, 8)
        data = permute(data, perm)
        data.adj_t = gcn_norm(data.adj_t.set_diag())
        kw = dict(batch_size=2, bipartite=True)
        lb = EvalSubgraphLoader(data, ptr, adj_format="block-fwd",
                                block_force=True, **kw)
        lh = EvalSubgraphLoader(data, ptr, adj_format="hybrid-fwd", **kw)
        got_any_tier = False
        for hb, hh in zip(lb, lh):
            assert isinstance(hb.device.adj, BlockHybridAdj)
            got_any_tier |= bool(np.asarray(hb.device.adj.dense.a).any())
            c = hh.device.adj.ell_cols.shape  # same col space
            x = jnp.asarray(
                rng.standard_normal(
                    (hb.device.n_id.shape[0], 16)), jnp.float32)
            np.testing.assert_allclose(
                np.asarray(spmm(hb.device.adj, x)),
                np.asarray(spmm(hh.device.adj, x)), atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(spmm_mean(hb.device.adj, x)),
                np.asarray(spmm_mean(hh.device.adj, x)), atol=1e-4)
        assert got_any_tier  # forced tier actually materialized tiles

    def test_trainer_refresh_equivalence(self, tmp_path):
        """GCN fill logits with adj_format=block == default (hybrid) fill."""
        from incagg_gnn_tpu.graph.datasets import get_data
        from incagg_gnn_tpu.models import GCN, GCNConfig
        from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

        outs = {}
        for fmt in ("hybrid", "block"):
            d, in_c, out_c = get_data("/tmp/datasets", "sbm-small")
            cfg = TrainerConfig(num_parts=4, batch_size=2, vr_update=True,
                                epochs=1, seed=0, adj_format=fmt)
            model = GCN(GCNConfig(
                num_nodes=d.num_nodes, in_channels=in_c, hidden_channels=32,
                out_channels=out_c, num_layers=2, dropout=0.0,
                drop_input=False, batch_norm=False, residual=False))
            tr = Trainer(model, d, cfg)
            outs[fmt] = np.asarray(tr.fill_history())
        np.testing.assert_allclose(outs["hybrid"], outs["block"],
                                   atol=2e-4, rtol=1e-3)


class TestNativeBuilder:
    def test_native_matches_numpy(self, rng, monkeypatch):
        """C++ blocks_count/blocks_fill == the numpy builder, bit-exact
        (incl. tile order, remainder edge order, bf16 rounding class)."""
        import ml_dtypes

        from incagg_gnn_tpu.ops import block as block_mod
        from incagg_gnn_tpu.utils import native as native_mod

        assert native_mod.get_native_lib() is not None, "native lib required"
        g = clustered_graph(rng, n=700, clusters=5, intra=6000, inter=2500)
        n_pad = 768
        for dt in (np.float32, ml_dtypes.bfloat16):
            got = block_mod.build_block_hybrid(
                g.rowptr, g.col, g.value, n_pad, n_pad, thresh=28, a_dtype=dt)
            with monkeypatch.context() as m:
                m.setattr(block_mod, "get_native_lib", lambda: None,
                          raising=False)
                m.setattr(native_mod, "get_native_lib", lambda: None)
                want = block_mod.build_block_hybrid(
                    g.rowptr, g.col, g.value, n_pad, n_pad, thresh=28,
                    a_dtype=dt)
            np.testing.assert_array_equal(
                np.asarray(got.dense.brow_step),
                np.asarray(want.dense.brow_step))
            np.testing.assert_array_equal(
                np.asarray(got.dense.bcols), np.asarray(want.dense.bcols))
            ga = np.asarray(got.dense.a, np.float32)
            wa = np.asarray(want.dense.a, np.float32)
            atol = 0 if dt == np.float32 else 1e-2
            np.testing.assert_allclose(ga, wa, atol=atol)
            for name in ("ell_cols", "ell_vals", "ovf_rows", "ovf_cols",
                         "ovf_vals", "deg"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(got.rem, name)),
                    np.asarray(getattr(want.rem, name)), err_msg=name)

    def test_native_measure_matches_numpy(self, rng, monkeypatch):
        from incagg_gnn_tpu.ops import block as block_mod
        from incagg_gnn_tpu.utils import native as native_mod

        g = clustered_graph(rng, n=500, clusters=4)
        got = block_mod.measure_block_tier(g.rowptr, g.col, 512, 512, 24)
        with monkeypatch.context() as m:
            m.setattr(native_mod, "get_native_lib", lambda: None)
            want = block_mod.measure_block_tier(g.rowptr, g.col, 512, 512, 24)
        assert got[0] == want[0]
        np.testing.assert_array_equal(got[1], want[1])


class TestDuplicateEdges:
    def test_duplicates_sum_like_hybrid(self, rng, monkeypatch):
        """Non-coalesced CSR: dense tiles must SUM duplicate (row,col)
        entries exactly as the ELL/COO paths do (native and numpy)."""
        from incagg_gnn_tpu.ops import block as block_mod
        from incagg_gnn_tpu.utils import native as native_mod

        # rows 0..127 in one dense block, every edge duplicated
        row = np.repeat(rng.integers(0, 128, 900), 2)
        col = np.repeat(rng.integers(0, 128, 900), 2)
        val = rng.random(1800).astype(np.float32)
        rowptr = np.zeros(129, np.int64)
        np.add.at(rowptr, row + 1, 1)
        order = np.argsort(row, kind="stable")
        rowptr = np.cumsum(rowptr)
        col_s, val_s = col[order].astype(np.int32), val[order]
        hyb = build_hybrid_adj(rowptr, col_s, val_s, 128, 128, k=8)
        x = jnp.asarray(rng.standard_normal((128, 16)), jnp.float32)
        want = np.asarray(spmm_hybrid(hyb, x))
        for native in (True, False):
            with monkeypatch.context() as m:
                if not native:
                    m.setattr(native_mod, "get_native_lib", lambda: None)
                adj = block_mod.build_block_hybrid(
                    rowptr, col_s, val_s, 128, 128, thresh=4)
            got = np.asarray(spmm_block(adj, x))
            np.testing.assert_allclose(want, got, atol=1e-4,
                                       err_msg=f"native={native}")


@pytest.mark.full
class TestBiBlock:
    """Bidirectional tier: training forward + exact-transpose backward."""

    def _pair(self, rng, bipartite=False):
        from incagg_gnn_tpu.ops.block import build_bi_block_hybrid
        from incagg_gnn_tpu.ops.ell import build_bi_hybrid_adj

        g = clustered_graph(rng, n=600, clusters=6)
        r_pad, c_pad = (512, 640) if bipartite else (640, 640)
        if bipartite:  # truncate rows: [R x C] rectangular case
            rowptr = g.rowptr[: r_pad + 1]
            col, val = g.col[: rowptr[-1]], g.value[: rowptr[-1]]
        else:
            rowptr, col, val = g.rowptr, g.col, g.value
        blk = build_bi_block_hybrid(rowptr, col, val, r_pad, c_pad, thresh=24)
        hyb = build_bi_hybrid_adj(rowptr, col, val, r_pad, c_pad)
        return blk, hyb, r_pad, c_pad

    def test_forward_and_grad_match_bihybrid(self, rng):
        import jax

        from incagg_gnn_tpu.ops.agg import spmm, spmm_mean

        for bipartite in (False, True):
            blk, hyb, r_pad, c_pad = self._pair(rng, bipartite)
            x = jnp.asarray(rng.standard_normal((c_pad, 32)), jnp.float32)
            w = jnp.asarray(rng.standard_normal((r_pad, 32)), jnp.float32)
            np.testing.assert_allclose(
                np.asarray(spmm(blk, x)), np.asarray(spmm(hyb, x)), atol=1e-4)

            def loss(fn, adj):
                return lambda x: (fn(adj, x) * w).sum()

            for fn in (spmm, spmm_mean):
                gb = jax.grad(loss(fn, blk))(x)
                gh = jax.grad(loss(fn, hyb))(x)
                np.testing.assert_allclose(np.asarray(gb), np.asarray(gh),
                                           atol=1e-3, rtol=1e-4)

    def test_bwd_is_exact_transpose(self, rng):
        from incagg_gnn_tpu.ops.block import spmm_block

        blk, hyb, r_pad, c_pad = self._pair(rng)
        gy = jnp.asarray(rng.standard_normal((r_pad, 16)), jnp.float32)
        from incagg_gnn_tpu.ops.ell import spmm_hybrid

        np.testing.assert_allclose(
            np.asarray(spmm_block(blk.bwd, gy)),
            np.asarray(spmm_hybrid(hyb.bwd, gy)), atol=1e-4)

    def test_mask_in_batch_matches_bihybrid(self, rng):
        import jax

        from incagg_gnn_tpu.ops.agg import spmm, spmm_mean

        blk, hyb, r_pad, c_pad = self._pair(rng)
        bs = 300
        mb, mh = blk.mask_in_batch(bs), hyb.mask_in_batch(bs)
        np.testing.assert_allclose(np.asarray(mb.deg), np.asarray(mh.fwd.deg),
                                   atol=1e-5)
        x = jnp.asarray(rng.standard_normal((c_pad, 16)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((r_pad, 16)), jnp.float32)
        for fn in (spmm, spmm_mean):
            np.testing.assert_allclose(np.asarray(fn(mb, x)),
                                       np.asarray(fn(mh, x)), atol=1e-4)
            gb = jax.grad(lambda x: (fn(mb, x) * w).sum())(x)
            gh = jax.grad(lambda x: (fn(mh, x) * w).sum())(x)
            np.testing.assert_allclose(np.asarray(gb), np.asarray(gh),
                                       atol=1e-3, rtol=1e-4)


@pytest.mark.full
class TestBiBlockLoaderTrainer:
    def test_train_loader_block_matches_hybrid(self, rng):
        import jax

        from incagg_gnn_tpu.graph.csr import gcn_norm, permute
        from incagg_gnn_tpu.graph.datasets import make_sbm
        from incagg_gnn_tpu.graph.partition import partition_graph
        from incagg_gnn_tpu.loader import SubgraphLoader
        from incagg_gnn_tpu.ops.agg import spmm
        from incagg_gnn_tpu.ops.block import BiBlockHybridAdj

        data, _, _ = make_sbm(num_nodes=800, num_classes=4, num_features=8,
                              avg_degree=30.0, seed=3)
        perm, ptr = partition_graph(data.adj_t, 8)
        data = permute(data, perm)
        data.adj_t = gcn_norm(data.adj_t.set_diag())
        kw = dict(batch_size=2, mode="gas", shuffle=False)
        lb = SubgraphLoader(data, ptr, adj_format="block", block_force=True,
                            **kw)
        lh = SubgraphLoader(data, ptr, adj_format="hybrid", **kw)
        got_tier = False
        for hb, hh in zip(lb, lh):
            assert isinstance(hb.device.adj, BiBlockHybridAdj)
            got_tier |= bool(np.asarray(hb.device.adj.fwd.dense.a).any())
            c_pad = hb.device.n_id.shape[0]
            r_pad = hb.device.push_idx.shape[0]
            x = jnp.asarray(rng.standard_normal((c_pad, 16)), jnp.float32)
            w = jnp.asarray(rng.standard_normal((r_pad, 16)), jnp.float32)
            np.testing.assert_allclose(
                np.asarray(spmm(hb.device.adj, x)),
                np.asarray(spmm(hh.device.adj, x)), atol=1e-4)
            gb = jax.grad(lambda x: (spmm(hb.device.adj, x) * w).sum())(x)
            gh = jax.grad(lambda x: (spmm(hh.device.adj, x) * w).sum())(x)
            np.testing.assert_allclose(np.asarray(gb), np.asarray(gh),
                                       atol=1e-3, rtol=1e-4)
        assert got_tier

    def test_trainer_e2e_block_matches_hybrid(self):
        """Two GAS training epochs with adj_format=block == hybrid: same
        final params (f32 tiles are exact)."""
        from incagg_gnn_tpu.graph.datasets import get_data
        from incagg_gnn_tpu.models import GCN, GCNConfig
        from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

        import jax

        outs = {}
        for fmt in ("hybrid", "block"):
            d, in_c, out_c = get_data("/tmp/datasets", "sbm-small")
            cfg = TrainerConfig(num_parts=4, batch_size=2, vr_update=False,
                                epochs=2, seed=0, adj_format=fmt,
                                fused_epoch="off")
            model = GCN(GCNConfig(
                num_nodes=d.num_nodes, in_channels=in_c, hidden_channels=32,
                out_channels=out_c, num_layers=2, dropout=0.0,
                drop_input=False, batch_norm=False, residual=False))
            tr = Trainer(model, d, cfg)
            tr.fit()
            outs[fmt] = tr.params
        for a, b in zip(jax.tree_util.tree_leaves(outs["hybrid"]),
                        jax.tree_util.tree_leaves(outs["block"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-3)


def test_shuffled_multicluster_train_loader_rejects_tier():
    """Shuffled multi-cluster loaders re-collate each epoch: auto-admitting
    the tier would rebuild + restage the inflated tiles per epoch, so the
    decision must reject it unless forced (code-review finding)."""
    from incagg_gnn_tpu.graph.csr import gcn_norm, permute
    from incagg_gnn_tpu.graph.datasets import make_sbm
    from incagg_gnn_tpu.graph.partition import partition_graph
    from incagg_gnn_tpu.loader import SubgraphLoader
    from incagg_gnn_tpu.ops.block import BiBlockHybridAdj
    from incagg_gnn_tpu.ops.ell import BiHybridAdj

    data, _, _ = make_sbm(num_nodes=800, num_classes=4, num_features=8,
                          avg_degree=30.0, seed=3)
    perm, ptr = partition_graph(data.adj_t, 8)
    data = permute(data, perm)
    data.adj_t = gcn_norm(data.adj_t.set_diag())
    ld = SubgraphLoader(data, ptr, batch_size=2, mode="gas", shuffle=True,
                        adj_format="block")
    hb = next(iter(ld))
    assert isinstance(hb.device.adj, BiHybridAdj)  # tier auto-rejected
    assert ld.buckets.blk == -1
    # force still wins (explicit adj_format=block with block_force)
    ldf = SubgraphLoader(data, ptr, batch_size=2, mode="gas", shuffle=True,
                         adj_format="block", block_force=True)
    assert isinstance(next(iter(ldf)).device.adj, BiBlockHybridAdj)
    # single-cluster shuffled loaders replay a device cache: still admitted
    ld1 = SubgraphLoader(data, ptr, batch_size=1, mode="gas", shuffle=True,
                         adj_format="block", block_force=True)
    assert isinstance(next(iter(ld1)).device.adj, BiBlockHybridAdj)


class TestTallTiles:
    """rb_rows > 128 ([rb, 128] tall tiles, r5): x-DMA amortization.
    Equivalence vs the hybrid oracle for fwd, mean, native-vs-numpy build,
    non-multiple row pads (internal rounding + slice), and bi-pair grads."""

    def _graph(self, rng, n=600):
        return clustered_graph(rng, n=n)

    @pytest.mark.parametrize("rb", [256, 512])
    def test_fwd_matches_hybrid(self, rng, rb):
        g = self._graph(rng)
        n_pad = 640  # NOT a multiple of 256/512: exercises round+slice
        adj = build_block_hybrid(g.rowptr, g.col, g.value, n_pad, n_pad,
                                 thresh=20, rb_rows=rb)
        assert adj.dense.a.shape[1] == rb
        hyb = build_hybrid_adj(g.rowptr, g.col, g.value, n_pad, n_pad)
        x = jnp.asarray(rng.standard_normal((n_pad, 64)), jnp.float32)
        out = spmm_block(adj, x)
        assert out.shape == (n_pad, 64)
        assert np.allclose(out, spmm_hybrid(hyb, x), atol=1e-4)
        assert np.allclose(spmm_block_mean(adj, x),
                           spmm_hybrid_mean(hyb, x), atol=1e-4)

    def test_native_matches_numpy_tall(self, rng, monkeypatch):
        from incagg_gnn_tpu.utils import native
        g = self._graph(rng)
        n_pad = 768
        a1 = build_block_hybrid(g.rowptr, g.col, g.value, n_pad, n_pad,
                                thresh=20, rb_rows=256)
        monkeypatch.setattr(native, "get_native_lib", lambda: None)
        a2 = build_block_hybrid(g.rowptr, g.col, g.value, n_pad, n_pad,
                                thresh=20, rb_rows=256)
        assert np.allclose(a1.dense.a, a2.dense.a)
        assert np.array_equal(a1.dense.brow_step, a2.dense.brow_step)
        assert np.array_equal(a1.dense.bcols, a2.dense.bcols)
        x = jnp.asarray(rng.standard_normal((n_pad, 32)), jnp.float32)
        assert np.allclose(spmm_block(a1, x), spmm_block(a2, x), atol=1e-5)

    def test_bi_tall_grads_match_bihybrid(self, rng):
        import jax
        from incagg_gnn_tpu.ops.block import build_bi_block_hybrid, \
            spmm_block_bi
        from incagg_gnn_tpu.ops.ell import build_bi_hybrid_adj, spmm_bi
        g = self._graph(rng)
        n_pad = 640
        bi = build_bi_block_hybrid(g.rowptr, g.col, g.value, n_pad, n_pad,
                                   thresh=20, rb_rows=256, rb_rows_t=256)
        hyb = build_bi_hybrid_adj(g.rowptr, g.col, g.value, n_pad, n_pad)
        x = jnp.asarray(rng.standard_normal((n_pad, 32)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((32, 8)) * 0.1, jnp.float32)

        def loss(fn, ops, v):
            return (fn(ops, v) @ w).sum()

        l1, g1 = jax.value_and_grad(lambda v: loss(spmm_block_bi, bi, v))(x)
        l2, g2 = jax.value_and_grad(lambda v: loss(spmm_bi, hyb, v))(x)
        assert np.allclose(l1, l2, rtol=1e-4)
        assert np.allclose(g1, g2, atol=1e-4)

    def test_plan_rb_prefers_tall_on_dense_columns(self, rng):
        """Column-banded graphs (partition locality) keep blocks dense at
        every height -> the cost model must pick a taller tile."""
        from incagg_gnn_tpu.ops.block import plan_block_tier_rb
        n = 2048
        rows = np.repeat(np.arange(n, dtype=np.int64), 40)
        # every row draws 40 cols from a narrow band -> vertical stripes
        cols = (rng.integers(0, 256, rows.size)
                + (rows // 512) * 512).astype(np.int64) % n
        val = np.ones(rows.size, np.float32)
        from incagg_gnn_tpu.graph.csr import CSRGraph
        g = CSRGraph.from_coo(rows, cols, n, val, coalesce=True)
        plan = plan_block_tier_rb(g.rowptr, g.col, n, x_itemsize=2,
                                  a_itemsize=2)
        assert plan is not None
        th, rb = plan
        assert rb > 128
