"""Inductive (PPI-style) flow: separate train/val/test graphs, full-graph
forward for eval (reference: get_ppi data.py:100-107; full_test main.py:99-102;
eval wiring main.py:167-175,244-249)."""

import os

import numpy as np
import pytest

from incagg_gnn_tpu.graph.datasets import (
    INDUCTIVE_DATASETS,
    get_data,
    load_npz_dataset,
    make_sbm_inductive,
)
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestInductiveDatasets:
    def test_sbm_ppi_splits_disjoint_graphs(self):
        tr, in_c, out_c = get_data("/tmp", "sbm-ppi", split="train")
        va, _, _ = get_data("/tmp", "sbm-ppi", split="val")
        te, _, _ = get_data("/tmp", "sbm-ppi", split="test")
        # separate graphs, shared feature/label spaces
        assert va.num_nodes < tr.num_nodes and te.num_nodes < tr.num_nodes
        assert tr.num_features == va.num_features == te.num_features == in_c
        assert tr.y.shape[1] == va.y.shape[1] == te.y.shape[1] == out_c
        # multilabel protocol, split's own mask all-True (reference
        # data.py:105: data[f'{split}_mask'] = ones)
        assert tr.multilabel and va.multilabel
        assert tr.train_mask.all() and not tr.val_mask.any()
        assert va.val_mask.all() and not va.train_mask.any()
        assert te.test_mask.all()
        # val/test graphs differ from each other (different seeds)
        assert va.adj_t.nnz != te.adj_t.nnz or not np.array_equal(va.x, te.x)

    def test_shared_class_geometry(self):
        # same centers_seed => a class's mean feature agrees across splits
        tr, _, C = get_data("/tmp", "sbm-ppi", split="train")
        va, _, _ = get_data("/tmp", "sbm-ppi", split="val")

        def class_means(d):
            lab = d.y.argmax(axis=1)
            return np.stack([d.x[lab == c].mean(0) for c in range(C)])

        m_tr, m_va = class_means(tr), class_means(va)
        # correlated (noise=1.0 keeps them from being identical)
        cos = (m_tr * m_va).sum() / (
            np.linalg.norm(m_tr) * np.linalg.norm(m_va))
        assert cos > 0.5

    def test_registry_and_bad_split(self):
        assert "ppi" in INDUCTIVE_DATASETS and "sbm-ppi" in INDUCTIVE_DATASETS
        with pytest.raises(ValueError):
            make_sbm_inductive(split="validation")

    def test_split_archive_roundtrip(self, tmp_path):
        # per-split npz archives load through get_data(split=)
        d, _, _ = make_sbm_inductive(split="val", num_nodes=400, seed=1)
        os.makedirs(tmp_path / "ppi")
        np.savez(
            tmp_path / "ppi" / "data_val.npz",
            rowptr=d.adj_t.rowptr, col=d.adj_t.col, x=d.x, y=d.y,
            train_mask=d.train_mask, val_mask=d.val_mask,
            test_mask=d.test_mask,
        )
        got, in_c, out_c = get_data(str(tmp_path), "ppi", split="val")
        assert got.num_nodes == d.num_nodes
        assert np.array_equal(got.adj_t.col, d.adj_t.col)
        assert got.multilabel
        with pytest.raises(FileNotFoundError):
            load_npz_dataset(str(tmp_path), "ppi", split="test")


@pytest.mark.full
class TestFullForward:
    def test_matches_refresh_on_training_graph(self, sbm_small):
        """GAS refresh is exact full-graph inference, so full_forward on the
        (raw) training graph must reproduce the trainer's own refresh logits
        modulo the METIS permutation."""
        data, in_c, out_c = sbm_small
        from main import build_model
        from incagg_gnn_tpu.train.config import RunConfig

        run_cfg = RunConfig(model="GCN", dataset="sbm-small",
                            architecture={"num_layers": 2,
                                          "hidden_channels": 16})
        model = build_model(run_cfg, data, in_c, out_c)
        cfg = TrainerConfig(num_parts=4, batch_size=2, epochs=1, seed=0)
        tr = Trainer(model, data, cfg)
        ref = tr.fill_history()  # permuted order
        ff = tr.full_forward(data)  # original order (applies loop/norm itself)
        np.testing.assert_allclose(ff[tr.perm], ref, rtol=2e-4, atol=2e-4)

    def test_cli_inductive_e2e(self):
        """End-to-end: GraphSAGE on sbm-ppi, val/test from separate graphs."""
        import main as cli

        val, test = cli.main([
            "--model", os.path.join(REPO, "conf/model/graphsage.yaml"),
            "--dataset", "sbm-ppi",
            "epochs=8", "num_parts=4", "batch_size=2", "vr_update=true",
        ])
        # multilabel micro-F1 on held-out graphs: must beat the ~0.2-0.3 of
        # random logits and show real inductive generalization
        assert val > 0.5 and test > 0.5, (val, test)
