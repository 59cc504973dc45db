"""Ablation-flag tests (the reference's correctness oracles, SURVEY §4):
use_aggregation=False degrades models to MLPs; aggregate_combined=False
restricts GAS aggregation to in-batch edges; GAT/PNA VR fallback trains."""

import numpy as np
import pytest

from incagg_gnn_tpu.models import (
    GAT, GATConfig, GCN, GCNConfig, GCN2, GCN2Config, PNA, PNAConfig,
    compute_avg_deg,
)
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig


@pytest.mark.full
class TestAblations:
    def test_gcn2_no_aggregation_runs(self, sbm_small):
        data, in_c, out_c = sbm_small
        cfg = GCN2Config(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=24, out_channels=out_c, num_layers=2,
                         dropout=0.1, drop_input=False)
        tcfg = TrainerConfig(num_parts=4, batch_size=2, epochs=4, seed=0,
                             use_aggregation=False)
        res = Trainer(GCN2(cfg), data, tcfg).fit()
        assert res["best_test"] > 0.3  # MLP-only bound

    def test_gcn_ib_only_aggregation(self, sbm_small):
        data, in_c, out_c = sbm_small
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=24, out_channels=out_c, num_layers=2,
                        dropout=0.1, drop_input=False)
        tcfg = TrainerConfig(num_parts=4, batch_size=2, epochs=6, seed=0,
                             aggregate_combined=False)
        res = Trainer(GCN(cfg), data, tcfg).fit()
        assert res["best_test"] > 0.6

    def test_gat_vr_fallback_trains(self, sbm_small):
        data, in_c, out_c = sbm_small
        cfg = GATConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=8, out_channels=out_c, num_layers=2,
                        dropout=0.1, hidden_heads=2, out_heads=1)
        tcfg = TrainerConfig(num_parts=4, batch_size=2, epochs=6, seed=0,
                             vr_update=True)
        res = Trainer(GAT(cfg), data, tcfg).fit()
        assert res["best_test"] > 0.6

    def test_pna_vr_mock_trains(self, sbm_small):
        data, in_c, out_c = sbm_small
        lin_d, log_d = compute_avg_deg(data.adj_t.degrees() + 1)
        cfg = PNAConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=24, out_channels=out_c, num_layers=2,
                        dropout=0.1, drop_input=False,
                        aggregators=("mean",), scalers=("identity",),
                        avg_deg_lin=lin_d, avg_deg_log=log_d)
        tcfg = TrainerConfig(num_parts=4, batch_size=2, epochs=5, seed=0,
                             vr_update=True)
        res = Trainer(PNA(cfg), data, tcfg).fit()
        assert res["best_test"] > 0.6

    def test_edge_dropout_forces_coo(self, sbm_small):
        data, in_c, out_c = sbm_small
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=24, out_channels=out_c, num_layers=2,
                        dropout=0.1, drop_input=False)
        tcfg = TrainerConfig(num_parts=4, batch_size=2, epochs=4, seed=0,
                             edge_dropout=0.2)
        tr = Trainer(GCN(cfg), data, tcfg)
        assert tr.train_loader.adj_format == "coo"
        res = tr.fit()
        assert res["best_test"] > 0.6
