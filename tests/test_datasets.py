"""Dataset registry + converter tests (synthetic raw files)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from incagg_gnn_tpu.graph.datasets import get_data, load_npz_dataset, make_sbm


class TestRegistry:
    def test_sbm_presets(self):
        data, in_c, out_c = get_data("/tmp/nope", "sbm-tiny")
        assert data.num_nodes == 400
        assert in_c == 16 and out_c == 4

    def test_deterministic(self):
        a, _, _ = get_data("/tmp/nope", "sbm-tiny")
        b, _, _ = get_data("/tmp/nope", "sbm-tiny")
        assert np.array_equal(a.x, b.x)
        assert np.array_equal(a.adj_t.col, b.adj_t.col)

    def test_missing_real_dataset_raises(self):
        with pytest.raises(FileNotFoundError):
            get_data("/tmp/definitely-missing", "arxiv")

    def test_npz_roundtrip(self, sbm_tiny, tmp_path):
        data, in_c, out_c = sbm_tiny
        d = tmp_path / "fake"
        d.mkdir()
        np.savez(d / "data.npz", rowptr=data.adj_t.rowptr, col=data.adj_t.col,
                 x=data.x, y=data.y, train_mask=data.train_mask,
                 val_mask=data.val_mask, test_mask=data.test_mask)
        loaded, ic, oc = load_npz_dataset(str(tmp_path), "fake")
        assert ic == in_c and oc == out_c
        assert np.array_equal(loaded.adj_t.col, data.adj_t.col)
        assert np.allclose(loaded.x, data.x)


class TestConverter:
    def test_saint_conversion(self, tmp_path, rng):
        import scipy.sparse as sp

        import convert_dataset as cd

        n = 50
        a = sp.random(n, n, density=0.1, format="csr", random_state=1)
        sp.save_npz(tmp_path / "adj_full.npz", a)
        np.save(tmp_path / "feats.npy", rng.random((n, 8)).astype(np.float32))
        json.dump({str(i): int(i % 3) for i in range(n)},
                  open(tmp_path / "class_map.json", "w"))
        json.dump({"tr": list(range(30)), "va": list(range(30, 40)),
                   "te": list(range(40, 50))},
                  open(tmp_path / "role.json", "w"))
        rowptr, col, x, y, tr, va, te = cd.convert_saint(str(tmp_path))
        assert rowptr.shape == (n + 1,)
        assert x.shape == (n, 8)
        assert tr.sum() == 30 and va.sum() == 10 and te.sum() == 10
        # symmetrized: A[i,j] -> A[j,i] present
        dense = np.zeros((n, n))
        rows = np.repeat(np.arange(n), np.diff(rowptr))
        dense[rows, col] = 1
        assert np.array_equal(dense, dense.T)

    def test_symmetrize_dedups(self):
        import convert_dataset as cd

        rowptr, col = cd.symmetrize(np.array([0, 0, 1]), np.array([1, 1, 0]), 3)
        assert rowptr[-1] == 2  # one edge each direction, no dup, no self-loop

    def test_ogb_conversion(self, tmp_path, rng):
        import gzip

        import convert_dataset as cd

        n, f = 40, 6
        raw = tmp_path / "raw"
        raw.mkdir()
        edges = rng.integers(0, n, size=(120, 2))
        edges = edges[edges[:, 0] != edges[:, 1]]
        with gzip.open(raw / "edge.csv.gz", "wt") as fh:
            np.savetxt(fh, edges, fmt="%d", delimiter=",")
        with gzip.open(raw / "node-feat.csv.gz", "wt") as fh:
            np.savetxt(fh, rng.random((n, f)), delimiter=",")
        with gzip.open(raw / "node-label.csv.gz", "wt") as fh:
            np.savetxt(fh, rng.integers(0, 4, size=(n, 1)), fmt="%d")
        split = tmp_path / "split" / "time"
        split.mkdir(parents=True)
        idx = rng.permutation(n)
        for name, sl in (("train", idx[:20]), ("valid", idx[20:30]),
                         ("test", idx[30:])):
            with gzip.open(split / f"{name}.csv.gz", "wt") as fh:
                np.savetxt(fh, sl, fmt="%d")
        rowptr, col, x, y, tr, va, te = cd.convert_ogb(str(tmp_path))
        assert rowptr.shape == (n + 1,) and x.shape == (n, f)
        assert tr.sum() == 20 and va.sum() == 10 and te.sum() == 10
        assert not (tr & va).any() and not (tr & te).any()
        dense = np.zeros((n, n))
        rows = np.repeat(np.arange(n), np.diff(rowptr))
        dense[rows, col] = 1
        assert np.array_equal(dense, dense.T)
        assert dense.trace() == 0  # self-loops dropped (pipeline adds them)

    def test_planetoid_conversion(self, tmp_path, rng):
        import pickle

        import scipy.sparse as sp

        import convert_dataset as cd

        # Planetoid layout: allx = train+unlabeled (first na nodes), tx = test
        # features at test_idx positions, graph = dict-of-neighbor-lists
        na, nt, f, c = 30, 10, 5, 3
        n = na + nt
        allx = sp.csr_matrix(rng.random((na, f)).astype(np.float32))
        tx = sp.csr_matrix(rng.random((nt, f)).astype(np.float32))
        ally = np.eye(c, dtype=np.int64)[rng.integers(0, c, na)]
        ty = np.eye(c, dtype=np.int64)[rng.integers(0, c, nt)]
        x_lab = allx[:10]  # labeled-train block
        y_lab = ally[:10]
        graph = {i: [int(j) for j in rng.integers(0, n, 3) if j != i]
                 for i in range(n)}
        prefix = tmp_path / "ind.testset"
        for ext, obj in (("x", x_lab), ("tx", tx), ("allx", allx),
                         ("y", y_lab), ("ty", ty), ("ally", ally),
                         ("graph", graph)):
            with open(f"{prefix}.{ext}", "wb") as fh:
                pickle.dump(obj, fh)
        test_idx = np.arange(na, n)
        np.savetxt(f"{prefix}.test.index", test_idx, fmt="%d")
        rowptr, col, feat, y, tr, va, te = cd.convert_planetoid(str(prefix))
        assert feat.shape == (n, f)
        assert np.allclose(feat[na:], tx.toarray())
        assert np.array_equal(y[na:], ty.argmax(1))
        assert tr.sum() == 10 and te.sum() == nt
        assert not (tr & te).any()

    def test_converted_archive_trains(self, tmp_path, rng):
        """Converted npz → get_data → Trainer end-to-end (the real-dataset
        ingestion path, minus the download)."""
        import scipy.sparse as sp

        import convert_dataset as cd
        from incagg_gnn_tpu.graph.datasets import get_data
        from incagg_gnn_tpu.models import GCN, GCNConfig
        from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

        n = 60
        a = sp.random(n, n, density=0.15, format="csr", random_state=2)
        sp.save_npz(tmp_path / "adj_full.npz", a)
        np.save(tmp_path / "feats.npy", rng.random((n, 8)).astype(np.float32))
        json.dump({str(i): int(i % 3) for i in range(n)},
                  open(tmp_path / "class_map.json", "w"))
        json.dump({"tr": list(range(40)), "va": list(range(40, 50)),
                   "te": list(range(50, 60))},
                  open(tmp_path / "role.json", "w"))
        rowptr, col, x, y, tr, va, te = cd.convert_saint(str(tmp_path))
        out = tmp_path / "root" / "mini" / "data.npz"
        out.parent.mkdir(parents=True)
        np.savez_compressed(out, rowptr=rowptr, col=col, x=x, y=y,
                            train_mask=tr, val_mask=va, test_mask=te)
        data, in_c, out_c = get_data(str(tmp_path / "root"), "mini")
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=16, out_channels=out_c, num_layers=2,
                        dropout=0.0, drop_input=False)
        res = Trainer(GCN(cfg), data,
                      TrainerConfig(num_parts=2, batch_size=1, epochs=2,
                                    vr_update=True, seed=0)).fit()
        assert np.isfinite(res["best_test"])
