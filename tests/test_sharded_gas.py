"""Memory-sharded GAS training on the virtual mesh: the single-stream Trainer
with node-row-sharded histories/tables must match the unsharded run."""

import jax
import numpy as np
import pytest

from incagg_gnn_tpu.models import GCN, GCNConfig
from incagg_gnn_tpu.parallel.mesh import make_mesh
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

pytestmark = pytest.mark.full


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 virtual devices")
class TestShardedGAS:
    def _cfg(self, data, in_c, out_c):
        return GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=24, out_channels=out_c, num_layers=2,
                         dropout=0.0, drop_input=False)

    def test_sharded_matches_unsharded(self, sbm_small):
        data, in_c, out_c = sbm_small
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=False,
                             seed=0, epochs=2)
        t1 = Trainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg)
        t2 = Trainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg,
                     mesh=make_mesh(4))
        l1 = t1.fill_history()
        l2 = t2.fill_history()
        assert np.allclose(l1, l2, atol=2e-3, rtol=1e-3)
        t1.train_epoch()
        t2.train_epoch()
        e1 = t1.evaluate()
        e2 = t2.evaluate()
        assert abs(e1["val_acc"] - e2["val_acc"]) < 0.05

    def test_sharded_gas_learns(self, sbm_small):
        data, in_c, out_c = sbm_small
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=False,
                             seed=0, epochs=8)
        res = Trainer(GCN(self._cfg(data, in_c, out_c)), data, tcfg,
                      mesh=make_mesh(4)).fit()
        assert res["best_test"] > 0.75, res
