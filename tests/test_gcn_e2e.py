"""GCN golden + end-to-end tests.

- golden: forward_layer / forward_gas / forward_vr against a dense numpy GCN
  oracle on the full graph (1 partition, fresh caches) — the 'per-layer
  activations allclose' gate from BASELINE.md.
- e2e: GAS and VR training on a homophilous SBM must clearly beat chance and
  an MLP-ish bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incagg_gnn_tpu.graph.csr import gcn_norm
from incagg_gnn_tpu.models.gcn import GCN, GCNConfig
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig


def dense_adj(adj):
    n = adj.num_nodes
    d = np.zeros((n, n))
    row, col, val = adj.to_coo()
    d[row, col] = val if val is not None else 1.0
    return d


def dense_gcn_forward(params, a, x, num_layers):
    """Oracle: h_{l+1} = relu(A (h_l W_l) + b_l), final layer linear."""
    h = x
    for l in range(num_layers):
        w, b = np.asarray(params["convs"][l]["w"]), np.asarray(params["convs"][l]["b"])
        h = a @ (h @ w) + b
        if l < num_layers - 1:
            h = np.maximum(h, 0)
    return h


@pytest.fixture(scope="module")
def gcn_setup(sbm_tiny):
    data, in_c, out_c = sbm_tiny
    cfg = GCNConfig(
        num_nodes=data.num_nodes, in_channels=in_c, hidden_channels=24,
        out_channels=out_c, num_layers=3, dropout=0.0,
        drop_input=False, batch_norm=False, residual=False,
    )
    model = GCN(cfg)
    tcfg = TrainerConfig(num_parts=1, batch_size=1, vr_update=False, epochs=1,
                         lr=0.01, seed=0)
    trainer = Trainer(model, data, tcfg)
    return model, trainer


class TestGoldenFullGraph:
    def test_refresh_matches_dense(self, gcn_setup):
        model, trainer = gcn_setup
        logits = trainer.fill_history()
        a = dense_adj(trainer.data.adj_t)
        expected = dense_gcn_forward(trainer.params, a, trainer.data.x, 3)
        assert np.allclose(logits, expected, atol=2e-3, rtol=1e-3)

    def test_gas_forward_matches_dense(self, gcn_setup):
        model, trainer = gcn_setup
        hb = next(iter(trainer.train_loader))
        x = jnp.take(trainer.tables.x, hb.device.n_id, axis=0)
        out, _, _, _ = model.forward_gas(
            trainer.params, trainer.state, x, hb.device, trainer.hist.emb,
            None, training=False,
        )
        a = dense_adj(trainer.data.adj_t)
        expected = dense_gcn_forward(trainer.params, a, trainer.data.x, 3)
        bs = hb.batch_size
        # batch covers the whole graph -> exact match
        assert np.allclose(np.asarray(out[:bs])[np.argsort(hb.n_id[:bs])],
                           expected, atol=2e-3, rtol=1e-3)

    def test_vr_forward_matches_dense_when_fresh(self, sbm_tiny):
        """With fresh caches and a single full-graph partition the VR rule is
        exact: A@(x-M_in)+M_ag == A@x."""
        data, in_c, out_c = sbm_tiny
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=24, out_channels=out_c, num_layers=3,
                        dropout=0.0, drop_input=False)
        model = GCN(cfg)
        tcfg = TrainerConfig(num_parts=1, batch_size=1, vr_update=True, seed=0)
        trainer = Trainer(model, data, tcfg)
        trainer.fill_history()
        hb = next(iter(trainer.train_loader))
        x = jnp.take(trainer.tables.x, hb.device.n_id, axis=0)
        out, _, metrics = model.forward_vr(
            trainer.params, trainer.state, x, hb.device, trainer.hist,
            None, training=False,
        )
        a = dense_adj(trainer.data.adj_t)
        expected = dense_gcn_forward(trainer.params, a, trainer.data.x, 3)
        bs = hb.batch_size
        assert np.allclose(np.asarray(out[:bs])[np.argsort(hb.n_id[:bs])],
                           expected, atol=2e-3, rtol=1e-3)
        assert float(metrics["drift"]) < 1e-3  # fresh caches -> zero drift

    def test_vr_matches_full_aggregation_multi_part(self, sbm_tiny):
        """Fresh caches, many partitions: VR output on an IB batch must equal
        the dense full-neighborhood layer-1 output for IB nodes (the variance
        reduction identity A_ib@(x−M)+A_full@M == A_full@x at layer 1)."""
        data, in_c, out_c = sbm_tiny
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=24, out_channels=out_c, num_layers=1,
                        dropout=0.0, drop_input=False)
        model = GCN(cfg)
        tcfg = TrainerConfig(num_parts=4, batch_size=1, vr_update=True, seed=0)
        trainer = Trainer(model, data, tcfg)
        trainer.fill_history()
        hb = next(iter(trainer.train_loader))
        x = jnp.take(trainer.tables.x, hb.device.n_id, axis=0)
        out, _, _ = model.forward_vr(
            trainer.params, trainer.state, x, hb.device, trainer.hist,
            None, training=False,
        )
        a = dense_adj(trainer.data.adj_t)
        expected = dense_gcn_forward(trainer.params, a, trainer.data.x, 1)
        bs = hb.batch_size
        assert np.allclose(out[:bs], expected[hb.n_id[:bs]], atol=2e-3, rtol=1e-3)


class TestTrainE2E:
    def _run(self, sbm_small, vr, **kw):
        data, in_c, out_c = sbm_small
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=32, out_channels=out_c, num_layers=2,
                        dropout=0.2, drop_input=False, batch_norm=True)
        model = GCN(cfg)
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=vr,
                             epochs=15, lr=0.01, seed=0, **kw)
        trainer = Trainer(model, data, tcfg)
        return trainer.fit()

    def test_gas_training_learns(self, sbm_small):
        res = self._run(sbm_small, vr=False)
        assert res["best_test"] > 0.80, res["best_test"]

    def test_vr_training_learns(self, sbm_small):
        res = self._run(sbm_small, vr=True)
        assert res["best_test"] > 0.80, res["best_test"]

    def test_mlp_degrade_runs(self, sbm_small):
        res = self._run(sbm_small, vr=False, use_aggregation=False)
        assert res["best_test"] > 0.4  # MLP-only bound, features are informative
