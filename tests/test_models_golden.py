"""Golden + e2e tests for GCN2 / APPNP / GraphSAGE / PNA / PNA_JK / GAT.

Each model's layer-wise refresh output is validated against a dense numpy
oracle implementing the reference layer math; exact-VR models (GCN2, APPNP,
GraphSAGE) additionally satisfy the fresh-cache identity
``A_ib@(x−M_in)+M_ag == A_full@x``; every model then must learn on a
homophilous SBM in both GAS and VR modes.
"""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

from incagg_gnn_tpu.models import (
    APPNP, APPNPConfig, GAT, GATConfig, GCN2, GCN2Config,
    GraphSAGE, SAGEConfig, PNA, PNAConfig, PNA_JK, PNAJKConfig,
    compute_avg_deg,
)
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig


def dense_adj(adj, binary=False):
    n = adj.num_nodes
    d = np.zeros((n, n))
    row, col, val = adj.to_coo()
    d[row, col] = 1.0 if (binary or val is None) else val
    return d


def lin(p, x):
    y = x @ np.asarray(p["w"])
    if "b" in p:
        y = y + np.asarray(p["b"])
    return y


# ---------------- dense oracles (reference layer math) ----------------

def dense_gcn2(params, cfg, a, x):
    h = np.maximum(lin(params["lins"][0], x), 0)
    x0 = h
    for l in range(cfg.num_layers):
        beta = math.log(cfg.theta / (l + 1) + 1)
        xh = (1 - cfg.alpha) * (a @ h)
        xx0 = cfg.alpha * x0
        if cfg.shared_weights:
            s = xh + xx0
            h = (1 - beta) * s + beta * (s @ np.asarray(params["convs"][l]["w1"]))
        else:
            h = ((1 - beta) * xh + beta * (xh @ np.asarray(params["convs"][l]["w1"]))
                 + (1 - beta) * xx0 + beta * (xx0 @ np.asarray(params["convs"][l]["w2"])))
        h = np.maximum(h, 0)
    return lin(params["lins"][1], h)


def dense_appnp(params, cfg, a, x):
    h = np.maximum(lin(params["lins"][0], x), 0)
    h = lin(params["lins"][1], h)
    x0 = h
    for _ in range(cfg.num_layers):
        h = (1 - cfg.alpha) * (a @ h) + cfg.alpha * x0
    return h


def dense_sage(params, cfg, ab, x):
    """ab: binary adjacency (SAGE always binarizes)."""
    deg = np.maximum(ab.sum(1, keepdims=True), 1)
    h = x
    for l in range(cfg.num_layers):
        agg = (ab @ h) / deg
        z = lin(params["convs"][l]["lin_l"], agg) + lin(params["convs"][l]["lin_r"], h)
        h = np.maximum(z, 0) if l < cfg.num_layers - 1 else z
    return h


def dense_pna(params, cfg, ab, x):
    deg = ab.sum(1, keepdims=True)
    h = x
    for l in range(cfg.num_layers):
        out = 0.0
        i = 0
        for aggr in cfg.aggregators:
            for scaler in cfg.scalers:
                z = np.maximum(lin(params["convs"][l]["pre"][i], h), 0)
                if aggr == "mean":
                    g = (ab @ z) / np.maximum(deg, 1)
                elif aggr == "sum":
                    g = ab @ z
                elif aggr == "max":
                    g = np.where(
                        deg > 0,
                        np.stack([
                            z[ab[r] > 0].max(0) if (ab[r] > 0).any() else np.zeros(z.shape[1])
                            for r in range(ab.shape[0])
                        ]),
                        0.0,
                    )
                elif aggr == "min":
                    g = np.where(
                        deg > 0,
                        np.stack([
                            z[ab[r] > 0].min(0) if (ab[r] > 0).any() else np.zeros(z.shape[1])
                            for r in range(ab.shape[0])
                        ]),
                        0.0,
                    )
                g = lin(params["convs"][l]["post"][i], g)
                if scaler == "amplification":
                    g = g * (np.log(deg + 1) / cfg.avg_deg_log)
                elif scaler == "attenuation":
                    g = g * (cfg.avg_deg_log / (np.log(deg + 1) + 1e-5))
                out = out + g
                i += 1
        z = out + lin(params["convs"][l]["lin"], h)
        h = np.maximum(z, 0) if l < cfg.num_layers - 1 else z
    return h


def make_trainer(model_cls, cfg, data, vr, num_parts=1, **tkw):
    tcfg = TrainerConfig(num_parts=num_parts, batch_size=1, vr_update=vr,
                         seed=0, **tkw)
    return Trainer(model_cls(cfg), data, tcfg)


class TestGCN2:
    def _cfg(self, data, in_c, out_c, **kw):
        return GCN2Config(num_nodes=data.num_nodes, in_channels=in_c,
                          hidden_channels=24, out_channels=out_c, num_layers=3,
                          dropout=0.0, drop_input=False, alpha=0.1, theta=0.5, **kw)

    @pytest.mark.parametrize("shared", [True, False])
    def test_refresh_matches_dense(self, sbm_tiny, shared):
        data, in_c, out_c = sbm_tiny
        tr = make_trainer(GCN2, self._cfg(data, in_c, out_c, shared_weights=shared), data, vr=False)
        logits = tr.fill_history()
        a = dense_adj(tr.data.adj_t)
        expected = dense_gcn2(tr.params, tr.model.cfg, a, tr.data.x)
        assert np.allclose(logits, expected, atol=2e-3, rtol=1e-3)

    def test_vr_fresh_exact(self, sbm_tiny):
        data, in_c, out_c = sbm_tiny
        tr = make_trainer(GCN2, self._cfg(data, in_c, out_c), data, vr=True)
        tr.fill_history()
        hb = next(iter(tr.train_loader))
        x = jnp.take(tr.tables.x, hb.device.n_id, axis=0)
        out, _, m = tr.model.forward_vr(tr.params, tr.state, x, hb.device,
                                        tr.hist, None, training=False)
        a = dense_adj(tr.data.adj_t)
        expected = dense_gcn2(tr.params, tr.model.cfg, a, tr.data.x)
        bs = hb.batch_size
        assert np.allclose(np.asarray(out[:bs])[np.argsort(hb.n_id[:bs])],
                           expected, atol=2e-3, rtol=1e-3)
        assert float(m["drift"]) < 1e-3

    def test_gas_forward_matches_dense(self, sbm_tiny):
        data, in_c, out_c = sbm_tiny
        tr = make_trainer(GCN2, self._cfg(data, in_c, out_c), data, vr=False)
        hb = next(iter(tr.train_loader))
        x = jnp.take(tr.tables.x, hb.device.n_id, axis=0)
        out, _, _, _ = tr.model.forward_gas(tr.params, tr.state, x, hb.device,
                                            tr.hist.emb, None, training=False)
        a = dense_adj(tr.data.adj_t)
        expected = dense_gcn2(tr.params, tr.model.cfg, a, tr.data.x)
        bs = hb.batch_size
        assert np.allclose(np.asarray(out[:bs])[np.argsort(hb.n_id[:bs])],
                           expected, atol=2e-3, rtol=1e-3)


class TestAPPNP:
    def _cfg(self, data, in_c, out_c):
        return APPNPConfig(num_nodes=data.num_nodes, in_channels=in_c,
                           hidden_channels=24, out_channels=out_c,
                           num_layers=3, dropout=0.0, alpha=0.15)

    def test_refresh_matches_dense(self, sbm_tiny):
        data, in_c, out_c = sbm_tiny
        tr = make_trainer(APPNP, self._cfg(data, in_c, out_c), data, vr=False)
        logits = tr.fill_history()
        a = dense_adj(tr.data.adj_t)
        expected = dense_appnp(tr.params, tr.model.cfg, a, tr.data.x)
        assert np.allclose(logits, expected, atol=2e-3, rtol=1e-3)

    def test_vr_fresh_exact(self, sbm_tiny):
        data, in_c, out_c = sbm_tiny
        tr = make_trainer(APPNP, self._cfg(data, in_c, out_c), data, vr=True)
        tr.fill_history()
        hb = next(iter(tr.train_loader))
        x = jnp.take(tr.tables.x, hb.device.n_id, axis=0)
        out, _, m = tr.model.forward_vr(tr.params, tr.state, x, hb.device,
                                        tr.hist, None, training=False)
        a = dense_adj(tr.data.adj_t)
        expected = dense_appnp(tr.params, tr.model.cfg, a, tr.data.x)
        bs = hb.batch_size
        assert np.allclose(np.asarray(out[:bs])[np.argsort(hb.n_id[:bs])],
                           expected, atol=2e-3, rtol=1e-3)
        assert float(m["drift"]) < 1e-3


class TestSAGE:
    def _cfg(self, data, in_c, out_c):
        return SAGEConfig(num_nodes=data.num_nodes, in_channels=in_c,
                          hidden_channels=24, out_channels=out_c, num_layers=2,
                          dropout=0.0, drop_input=False)

    def test_refresh_matches_dense(self, sbm_tiny):
        data, in_c, out_c = sbm_tiny
        tr = make_trainer(GraphSAGE, self._cfg(data, in_c, out_c), data, vr=False)
        logits = tr.fill_history()
        ab = dense_adj(tr.data.adj_t, binary=True)
        expected = dense_sage(tr.params, tr.model.cfg, ab, tr.data.x)
        assert np.allclose(logits, expected, atol=2e-3, rtol=1e-3)

    def test_vr_fresh_exact(self, sbm_tiny):
        data, in_c, out_c = sbm_tiny
        tr = make_trainer(GraphSAGE, self._cfg(data, in_c, out_c), data, vr=True)
        tr.fill_history()
        hb = next(iter(tr.train_loader))
        x = jnp.take(tr.tables.x, hb.device.n_id, axis=0)
        out, _, m = tr.model.forward_vr(tr.params, tr.state, x, hb.device,
                                        tr.hist, None, training=False)
        ab = dense_adj(tr.data.adj_t, binary=True)
        expected = dense_sage(tr.params, tr.model.cfg, ab, tr.data.x)
        bs = hb.batch_size
        assert np.allclose(np.asarray(out[:bs])[np.argsort(hb.n_id[:bs])],
                           expected, atol=2e-3, rtol=1e-3)
        assert float(m["drift"]) < 1e-3


@pytest.mark.full
class TestPNA:
    def test_refresh_matches_dense(self, sbm_tiny):
        data, in_c, out_c = sbm_tiny
        lin_d, log_d = compute_avg_deg(data.adj_t.degrees() + 1)  # +1: set_diag
        cfg = PNAConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=16, out_channels=out_c, num_layers=2,
                        dropout=0.0, drop_input=False,
                        aggregators=("mean", "sum"), scalers=("identity", "amplification"),
                        avg_deg_lin=lin_d, avg_deg_log=log_d)
        tr = make_trainer(PNA, cfg, data, vr=False)
        logits = tr.fill_history()
        ab = dense_adj(tr.data.adj_t, binary=True)
        expected = dense_pna(tr.params, tr.model.cfg, ab, tr.data.x)
        assert np.allclose(logits, expected, atol=3e-3, rtol=1e-3)

    def _true_vr_cfg(self, data, in_c, out_c, aggregators):
        lin_d, log_d = compute_avg_deg(data.adj_t.degrees() + 1)
        return PNAConfig(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=16, out_channels=out_c, num_layers=2,
                         dropout=0.0, drop_input=False, true_vr=True,
                         aggregators=aggregators,
                         scalers=("identity", "amplification", "attenuation"),
                         avg_deg_lin=lin_d, avg_deg_log=log_d)

    def test_true_vr_fresh_exact_multi_part(self, sbm_tiny):
        """The capability the reference stubbed out (pna.py:235,270): with
        linear aggregators, PNA true-VR on a fresh cache reproduces the
        full-graph forward exactly from an IB-only batch — where the mock
        (IB-fresh propagation) provably cannot (the batch misses OB edges)."""
        data, in_c, out_c = sbm_tiny
        cfg = self._true_vr_cfg(data, in_c, out_c, ("sum", "mean"))
        tr = make_trainer(PNA, cfg, data, vr=True, num_parts=4)
        tr.fill_history()
        ab = dense_adj(tr.data.adj_t, binary=True)
        expected = dense_pna(tr.params, tr.model.cfg, ab, tr.data.x)
        hb = next(iter(tr.train_loader))
        x = jnp.take(tr.tables.x, hb.device.n_id, axis=0)
        out, _, m = tr.model.forward_vr(tr.params, tr.state, x, hb.device,
                                        tr.hist, None, training=False)
        bs = hb.batch_size
        got = np.asarray(out[:bs])
        want = expected[hb.n_id[:bs]]
        assert np.allclose(got, want, atol=3e-3, rtol=1e-3)
        assert float(m["drift"]) < 1e-3
        # the mock deviates on the same batch (OB neighbors are invisible)
        mock_cfg = dataclasses.replace(cfg, true_vr=False)
        mock_out, _, _ = PNA(mock_cfg).forward_vr(
            tr.params, tr.state, x, hb.device, tr.hist, None, training=False)
        assert np.abs(np.asarray(mock_out[:bs]) - want).max() > 1e-2

    def test_true_vr_training_learns(self, sbm_small):
        data, in_c, out_c = sbm_small
        lin_d, log_d = compute_avg_deg(data.adj_t.degrees() + 1)
        cfg = PNAConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=32, out_channels=out_c, num_layers=2,
                        dropout=0.1, drop_input=False, true_vr=True,
                        aggregators=("mean", "max"), scalers=("identity",),
                        avg_deg_lin=lin_d, avg_deg_log=log_d)
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=True,
                             epochs=6, lr=0.01, seed=0)
        res = Trainer(PNA(cfg), data, tcfg).fit()
        assert res["best_test"] > 0.75, res["best_test"]


@pytest.mark.full
class TestTraining:
    """Every model family must learn on the SBM in both modes."""

    def _fit(self, sbm_small, model_cls, cfg_cls, vr, epochs=8, thresh=0.75, **ck):
        data, in_c, out_c = sbm_small
        cfg = cfg_cls(num_nodes=data.num_nodes, in_channels=in_c,
                      hidden_channels=32, out_channels=out_c, num_layers=2,
                      dropout=0.1, **ck)
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=vr,
                             epochs=epochs, lr=0.01, seed=0)
        res = Trainer(model_cls(cfg), data, tcfg).fit()
        assert res["best_test"] > thresh, res["best_test"]

    def test_gcn2_gas(self, sbm_small):
        self._fit(sbm_small, GCN2, GCN2Config, vr=False, drop_input=False)

    def test_gcn2_vr(self, sbm_small):
        self._fit(sbm_small, GCN2, GCN2Config, vr=True, drop_input=False)

    def test_appnp_gas(self, sbm_small):
        self._fit(sbm_small, APPNP, APPNPConfig, vr=False, alpha=0.2)

    def test_appnp_vr(self, sbm_small):
        self._fit(sbm_small, APPNP, APPNPConfig, vr=True, alpha=0.2)

    def test_sage_gas(self, sbm_small):
        self._fit(sbm_small, GraphSAGE, SAGEConfig, vr=False, drop_input=False)

    def test_sage_vr(self, sbm_small):
        self._fit(sbm_small, GraphSAGE, SAGEConfig, vr=True, drop_input=False)

    def test_pna_gas(self, sbm_small):
        data, *_ = sbm_small
        lin_d, log_d = compute_avg_deg(data.adj_t.degrees() + 1)
        self._fit(sbm_small, PNA, PNAConfig, vr=False, epochs=6,
                  drop_input=False, aggregators=("mean", "max"),
                  scalers=("identity",), avg_deg_lin=lin_d, avg_deg_log=log_d)

    def test_pna_jk_gas(self, sbm_small):
        data, *_ = sbm_small
        lin_d, log_d = compute_avg_deg(data.adj_t.degrees() + 1)
        self._fit(sbm_small, PNA_JK, PNAJKConfig, vr=False, epochs=6,
                  drop_input=False, aggregators=("mean",),
                  scalers=("identity",), avg_deg_lin=lin_d, avg_deg_log=log_d)

    def test_gat_gas(self, sbm_small):
        self._fit(sbm_small, GAT, GATConfig, vr=False, epochs=8,
                  hidden_heads=2, out_heads=1)


def test_pna_jk_rejects_true_vr(sbm_tiny):
    data, in_c, out_c = sbm_tiny
    cfg = PNAJKConfig(num_nodes=data.num_nodes, in_channels=in_c,
                      hidden_channels=16, out_channels=out_c, num_layers=2,
                      dropout=0.0, true_vr=True)
    with pytest.raises(NotImplementedError, match="true-VR"):
        PNA_JK(cfg)


@pytest.mark.full
class TestGATHybridEval:
    def test_hybrid_refresh_matches_coo(self, sbm_small):
        """Scatter-free hybrid-ELL attention (gat_conv_hybrid) reproduces the
        COO edge-softmax refresh exactly (same params/partition)."""
        data, in_c, out_c = sbm_small
        cfg = GATConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=16, out_channels=out_c, num_layers=2,
                        dropout=0.0, hidden_heads=2, out_heads=1)
        t_coo = Trainer(GAT(cfg), data,
                        TrainerConfig(num_parts=8, batch_size=2, seed=0,
                                      adj_format="coo"))
        t_hyb = Trainer(GAT(cfg), data,
                        TrainerConfig(num_parts=8, batch_size=2, seed=0,
                                      adj_format="auto"))
        t_hyb.params = t_coo.params
        l1 = t_coo.fill_history()
        l2 = t_hyb.fill_history()
        assert np.allclose(l1, l2, atol=2e-3, rtol=1e-3)

    def test_gat_auto_format_trains(self, sbm_small):
        data, in_c, out_c = sbm_small
        cfg = GATConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=32, out_channels=out_c, num_layers=2,
                        dropout=0.1, hidden_heads=2, out_heads=1)
        tcfg = TrainerConfig(num_parts=8, batch_size=2, epochs=8, lr=0.01,
                             seed=0)
        res = Trainer(GAT(cfg), data, tcfg).fit()
        assert res["best_test"] > 0.75, res


@pytest.mark.full
class TestGATHybridTraining:
    def _cfg(self, data, in_c, out_c):
        return GATConfig(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=16, out_channels=out_c, num_layers=2,
                         dropout=0.0, hidden_heads=2, out_heads=1)

    def test_hybrid_train_epoch_matches_coo(self, sbm_small):
        """gat_conv_bi's scatter-free custom-VJP backward produces the same
        gradients as the COO edge-softmax autodiff: one epoch from identical
        params must yield identical losses and parameters."""
        data, in_c, out_c = sbm_small
        t_coo = Trainer(GAT(self._cfg(data, in_c, out_c)), data,
                        TrainerConfig(num_parts=8, batch_size=2, seed=0,
                                      lr=0.01, adj_format="coo"))
        t_hyb = Trainer(GAT(self._cfg(data, in_c, out_c)), data,
                        TrainerConfig(num_parts=8, batch_size=2, seed=0,
                                      lr=0.01, adj_format="auto"))
        t_coo.fill_history()
        t_hyb.fill_history()
        m1 = t_coo.train_epoch()
        m2 = t_hyb.train_epoch()
        assert abs(m1["loss"] - m2["loss"]) < 2e-3, (m1["loss"], m2["loss"])
        for k in ("w", "a_l", "a_r", "b"):
            w1 = np.asarray(t_coo.params["convs"][0][k])
            w2 = np.asarray(t_hyb.params["convs"][0][k])
            assert np.allclose(w1, w2, atol=1e-4), k

    def test_att_block_grads_match_autodiff(self, sbm_tiny):
        """jax.grad through the custom VJP == jax.grad through the same math
        with XLA's own (scatter-heavy) autodiff."""
        import jax
        import incagg_gnn_tpu.models.gat as gat_mod
        from incagg_gnn_tpu.graph.partition import partition_graph
        from incagg_gnn_tpu.graph.csr import permute, gcn_norm
        from incagg_gnn_tpu.loader import SubgraphLoader

        data, in_c, out_c = sbm_tiny
        perm, ptr = partition_graph(data.adj_t, 4, seed=0)
        data = permute(data, perm)
        ld = SubgraphLoader(data, ptr, batch_size=2, mode="gas",
                            adj_format="hybrid", adj_perm=True)
        adj = next(iter(ld)).device.adj
        rng = np.random.default_rng(0)
        H, D = 2, 8
        c_pad = adj.fwd.ell_cols.shape[1] and adj.fwd.ell_vals.shape
        C = int(np.asarray(adj.bwd.num_rows))
        R = int(adj.fwd.num_rows)
        a_src = jnp.asarray(rng.standard_normal((C, H)), jnp.float32)
        a_dst = jnp.asarray(rng.standard_normal((R, H)), jnp.float32)
        wx = jnp.asarray(rng.standard_normal((C, H, D)) * 0.3, jnp.float32)
        ones_e = jnp.ones(adj.fwd.ell_vals.shape + (H,), jnp.float32)
        ones_o = jnp.ones((adj.fwd.ovf_vals.shape[0], H), jnp.float32)

        def loss_custom(a_s, a_d, w):
            out = gat_mod._att_block(adj, a_s, a_d, w, ones_e, ones_o)
            return (out * out).sum()

        def loss_ref(a_s, a_d, w):
            att_e, att_o, *_ = gat_mod._hybrid_att_coeffs(adj.fwd, a_s, a_d)
            out = gat_mod._att_message_sum(adj.fwd, att_e, att_o, w)
            return (out * out).sum()

        g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(a_src, a_dst, wx)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(a_src, a_dst, wx)
        for a, b, name in zip(g1, g2, ("a_src", "a_dst", "wx")):
            assert np.allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-3), name


def test_gat_hybrid_fwd_training_dropout_rejected(sbm_tiny):
    """Explicit adj_format=hybrid-fwd cannot silently drop attention dropout
    during training (code-review finding)."""
    data, in_c, out_c = sbm_tiny
    cfg = GATConfig(num_nodes=data.num_nodes, in_channels=in_c,
                    hidden_channels=16, out_channels=out_c, num_layers=2,
                    dropout=0.3, hidden_heads=2, out_heads=1)
    tcfg = TrainerConfig(num_parts=4, batch_size=2, seed=0, epochs=1,
                         adj_format="hybrid-fwd")
    t = Trainer(GAT(cfg), data, tcfg)
    t.fill_history()
    with pytest.raises(ValueError, match="attention dropout"):
        t.train_epoch()


def test_gat_attention_budget_chunking(sbm_tiny, monkeypatch):
    """The [R,K,H,D] attention gathers (forward message sum and both custom-
    VJP backward gathers) must give identical results when row-chunked under
    a tiny gather budget (gat._row_chunked / reddit-scale OOM guard)."""
    import jax
    import incagg_gnn_tpu.models.gat as gat_mod
    import incagg_gnn_tpu.ops.ell as ell_mod
    from incagg_gnn_tpu.graph.partition import partition_graph
    from incagg_gnn_tpu.graph.csr import permute
    from incagg_gnn_tpu.loader import SubgraphLoader

    data, in_c, out_c = sbm_tiny
    perm, ptr = partition_graph(data.adj_t, 4, seed=0)
    data = permute(data, perm)
    ld = SubgraphLoader(data, ptr, batch_size=2, mode="gas",
                        adj_format="hybrid", adj_perm=True)
    adj = next(iter(ld)).device.adj
    rng = np.random.default_rng(0)
    H, D = 2, 8
    C = int(adj.bwd.num_rows)
    R = int(adj.fwd.num_rows)
    a_src = jnp.asarray(rng.standard_normal((C, H)), jnp.float32)
    a_dst = jnp.asarray(rng.standard_normal((R, H)), jnp.float32)
    wx = jnp.asarray(rng.standard_normal((C, H, D)) * 0.3, jnp.float32)
    ones_e = jnp.ones(adj.fwd.ell_vals.shape + (H,), jnp.float32)
    ones_o = jnp.ones((adj.fwd.ovf_vals.shape[0], H), jnp.float32)

    def loss(a_s, a_d, w):
        out = gat_mod._att_block(adj, a_s, a_d, w, ones_e, ones_o)
        return (out * out).sum()

    out_big = gat_mod._att_block(adj, a_src, a_dst, wx, ones_e, ones_o)
    g_big = jax.grad(loss, argnums=(0, 1, 2))(a_src, a_dst, wx)
    with monkeypatch.context() as m:
        m.setattr(ell_mod, "_ELL_BUDGET_BYTES", 16 << 10)
        out_small = gat_mod._att_block(adj, a_src, a_dst, wx, ones_e, ones_o)
        g_small = jax.grad(loss, argnums=(0, 1, 2))(a_src, a_dst, wx)
    np.testing.assert_allclose(np.asarray(out_big), np.asarray(out_small),
                               atol=1e-5)
    for a, b, name in zip(g_big, g_small, ("a_src", "a_dst", "wx")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=name)
