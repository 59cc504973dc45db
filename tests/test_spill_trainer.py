"""Host-spill Reverb trainer: must match the HBM-resident trainer exactly
(same partition/params/caches) and learn end-to-end."""

import jax.numpy as jnp
import numpy as np
import pytest

from incagg_gnn_tpu.models import GCN, GCNConfig, GCN2, GCN2Config
from incagg_gnn_tpu.train.spill_trainer import SpillVRTrainer
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

pytestmark = pytest.mark.full


class TestSpillTrainer:
    def _cfg(self, data, in_c, out_c):
        return GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=32, out_channels=out_c, num_layers=2,
                         dropout=0.0, drop_input=False)

    def test_refresh_matches_hbm_trainer(self, sbm_small):
        data, in_c, out_c = sbm_small
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=True, seed=0)
        hbm = Trainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg)
        spill = SpillVRTrainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg)
        l1 = hbm.fill_history()
        l2 = spill.fill_history()
        assert np.allclose(l1, l2, atol=2e-3, rtol=1e-3)
        # cache contents agree (spill tables vs HBM stacks)
        for l in range(2):
            hb_in = np.asarray(hbm.hist.emb[l][:data.num_nodes])
            sp_in = spill.spill_in[l].table[:data.num_nodes]
            assert np.allclose(hb_in, sp_in, atol=2e-3), f"M_in layer {l}"
            hb_ag = np.asarray(hbm.hist.emb_ag[l][:data.num_nodes])
            sp_ag = spill.spill_ag[l].table[:data.num_nodes]
            assert np.allclose(hb_ag, sp_ag, atol=2e-3), f"M_ag layer {l}"

    def test_streamed_step_matches_hbm_step(self, sbm_small):
        """One VR step from identical state must produce identical params."""
        data, in_c, out_c = sbm_small
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=True, seed=0)
        hbm = Trainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg)
        spill = SpillVRTrainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg)
        hbm.fill_history()
        spill.fill_history()
        m1 = hbm.train_epoch()
        m2 = spill.train_epoch()
        assert abs(m1["loss"] - m2["loss"]) < 2e-3, (m1, m2)
        w1 = np.asarray(hbm.params["convs"][0]["w"])
        w2 = np.asarray(spill.params["convs"][0]["w"])
        assert np.allclose(w1, w2, atol=1e-4)

    def test_spill_training_learns(self, sbm_small):
        data, in_c, out_c = sbm_small
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=True,
                             epochs=8, lr=0.01, seed=0)
        res = SpillVRTrainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg).fit()
        assert res["best_test"] > 0.8, res

    def test_spill_gcn2_with_x0(self, sbm_small):
        """x0-dependent model (GCNII) through the spilled refresh."""
        data, in_c, out_c = sbm_small
        cfg = GCN2Config(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=32, out_channels=out_c, num_layers=3,
                         dropout=0.0, drop_input=False)
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=True, seed=0)
        hbm = Trainer(GCN2(cfg), data, tcfg)
        spill = SpillVRTrainer(GCN2(cfg), data, tcfg)
        l1 = hbm.fill_history()
        l2 = spill.fill_history()
        assert np.allclose(l1, l2, atol=2e-3, rtol=1e-3)


class TestSpillPNATrueVR:
    def test_spill_matches_hbm_true_vr(self, sbm_small):
        """PNA true-VR's packed per-branch caches flow through the spill
        tier's full-width pulls (StreamedPulls) identically to HBM."""
        from incagg_gnn_tpu.models import PNA, PNAConfig, compute_avg_deg

        data, in_c, out_c = sbm_small
        lin_d, log_d = compute_avg_deg(data.adj_t.degrees() + 1)
        cfg = PNAConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=16, out_channels=out_c, num_layers=2,
                        dropout=0.0, drop_input=False, true_vr=True,
                        aggregators=("sum", "mean"), scalers=("identity",),
                        avg_deg_lin=lin_d, avg_deg_log=log_d)
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=True, seed=0)
        hbm = Trainer(PNA(cfg), data, tcfg)
        spill = SpillVRTrainer(PNA(cfg), data, tcfg)
        l1 = hbm.fill_history()
        l2 = spill.fill_history()
        assert np.allclose(l1, l2, atol=2e-3, rtol=1e-3)
        m1 = hbm.train_epoch()
        m2 = spill.train_epoch()
        assert abs(m1["loss"] - m2["loss"]) < 2e-3, (m1, m2)


class TestSpillGAS:
    """GAS mode over host tables — the reference's shipped operating mode
    (GAS training + pinned-CPU histories + async pool).  Must match the
    HBM-resident GAS trainer exactly."""

    def _cfg(self, data, in_c, out_c):
        return GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=32, out_channels=out_c, num_layers=2,
                         dropout=0.0, drop_input=False)

    def test_gas_refresh_matches_hbm(self, sbm_small):
        data, in_c, out_c = sbm_small
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=False, seed=0)
        hbm = Trainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg)
        spill = SpillVRTrainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg)
        assert spill.spill_ag == []  # no M_ag tables in GAS mode
        l1 = hbm.fill_history()
        l2 = spill.fill_history()
        assert np.allclose(l1, l2, atol=2e-3, rtol=1e-3)
        # layer-output histories agree (slot 1 = layer-0 output)
        hb_in = np.asarray(hbm.hist.emb[1][: data.num_nodes])
        sp_in = spill.spill_in[1].table[: data.num_nodes]
        assert np.allclose(hb_in, sp_in, atol=2e-3)

    def test_gas_epoch_matches_hbm(self, sbm_small):
        """A full GAS epoch: identical params AND identical history pushes
        (per-step OB pulls must observe earlier batches' pushes, matching
        the HBM path's in-step scatter ordering)."""
        data, in_c, out_c = sbm_small
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=False,
                             seed=0, fused_epoch="off")
        hbm = Trainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg)
        spill = SpillVRTrainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg)
        hbm.fill_history()
        spill.fill_history()
        m1 = hbm.train_epoch()
        m2 = spill.train_epoch()
        assert abs(m1["loss"] - m2["loss"]) < 2e-3, (m1, m2)
        w1 = np.asarray(hbm.params["convs"][0]["w"])
        w2 = np.asarray(spill.params["convs"][0]["w"])
        assert np.allclose(w1, w2, atol=1e-4)
        assert spill._gas_push_slots == [1]  # 2-layer GCN pushes slot 1 only
        hb = np.asarray(hbm.hist.emb[1][: data.num_nodes])
        sp = spill.spill_in[1].table[: data.num_nodes]
        assert np.allclose(hb, sp, atol=2e-3)

    def test_gas_spill_learns(self, sbm_small):
        data, in_c, out_c = sbm_small
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=False,
                             epochs=8, lr=0.01, seed=0)
        res = SpillVRTrainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg).fit()
        assert res["best_test"] > 0.8, res

    def test_gas_spill_gcn2_x0(self, sbm_small):
        """x0-dependent model (GCNII) through the GAS spilled refresh."""
        data, in_c, out_c = sbm_small
        cfg = GCN2Config(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=32, out_channels=out_c, num_layers=3,
                         dropout=0.0, drop_input=False)
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=False, seed=0)
        hbm = Trainer(GCN2(cfg), data, tcfg)
        spill = SpillVRTrainer(GCN2(cfg), data, tcfg)
        l1 = hbm.fill_history()
        l2 = spill.fill_history()
        assert np.allclose(l1, l2, atol=2e-3, rtol=1e-3)
        m1 = hbm.train_epoch()
        m2 = spill.train_epoch()
        assert abs(m1["loss"] - m2["loss"]) < 2e-3, (m1, m2)
