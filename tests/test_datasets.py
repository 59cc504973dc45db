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


class TestNewConverters:
    """PPI / WikiCS / gnn-benchmark raw formats (synthetic raw files)."""

    def _tiny_graph(self, rng, n):
        row = rng.integers(0, n, size=4 * n)
        col = rng.integers(0, n, size=4 * n)
        keep = row != col
        return row[keep], col[keep]

    def test_ppi_conversion(self, tmp_path, rng):
        import convert_dataset as cd

        src = tmp_path / "ppi_raw"
        src.mkdir()
        sizes = {"train": 60, "valid": 20, "test": 25}
        for raw, n in sizes.items():
            row, col = self._tiny_graph(rng, n)
            links = [{"source": int(r), "target": int(c)}
                     for r, c in zip(row, col)]
            json.dump({"directed": False, "nodes": [{"id": i} for i in range(n)],
                       "links": links}, open(src / f"{raw}_graph.json", "w"))
            np.save(src / f"{raw}_feats.npy",
                    rng.normal(size=(n, 8)).astype(np.float32))
            np.save(src / f"{raw}_labels.npy",
                    (rng.random((n, 5)) < 0.3).astype(np.float32))
        out = cd.convert_ppi(str(src))
        assert set(out) == {"train", "val", "test"}
        for split, (rowptr, col_, x, y, tr, va, te) in out.items():
            n = {"train": 60, "val": 20, "test": 25}[split]
            assert len(rowptr) == n + 1 and x.shape == (n, 8)
            assert y.shape == (n, 5) and y.dtype == np.float32
            mask = {"train": tr, "val": va, "test": te}[split]
            assert mask.all()
        # symmetric adjacency
        rowptr, col_ = out["train"][:2]
        deg = np.diff(rowptr)
        row_full = np.repeat(np.arange(60), deg)
        fwd = set(zip(row_full.tolist(), col_.tolist()))
        assert all((c, r) in fwd for r, c in fwd)

    def test_ppi_cli_writes_split_archives_and_loads(self, tmp_path, rng):
        import convert_dataset as cd

        src = tmp_path / "ppi_raw"
        src.mkdir()
        for raw, n in (("train", 40), ("valid", 15), ("test", 15)):
            row, col = self._tiny_graph(rng, n)
            json.dump({"links": [{"source": int(r), "target": int(c)}
                                 for r, c in zip(row, col)]},
                      open(src / f"{raw}_graph.json", "w"))
            np.save(src / f"{raw}_feats.npy",
                    rng.normal(size=(n, 6)).astype(np.float32))
            np.save(src / f"{raw}_labels.npy",
                    (rng.random((n, 3)) < 0.4).astype(np.float32))
        outdir = tmp_path / "ds" / "ppi"
        sys.argv = ["x", "--format", "ppi", "--src", str(src),
                    "--out", str(outdir / "data.npz")]
        cd.main()
        for split in ("train", "val", "test"):
            assert (outdir / f"data_{split}.npz").exists()
        d, ic, oc = get_data(str(tmp_path / "ds"), "ppi", split="val")
        assert d.num_nodes == 15 and ic == 6 and oc == 3
        assert d.val_mask.all() and d.multilabel

    def test_wikics_conversion(self, tmp_path, rng):
        import convert_dataset as cd

        n, f, nsplits = 30, 7, 3
        links = [[int(v) for v in rng.integers(0, n, size=3)] for _ in range(n)]
        d = {
            "features": rng.normal(size=(n, f)).tolist(),
            "labels": rng.integers(0, 4, size=n).tolist(),
            "links": links,
            "train_masks": [(rng.random(n) < 0.3).tolist() for _ in range(nsplits)],
            "val_masks": [(rng.random(n) < 0.2).tolist() for _ in range(nsplits)],
            "stopping_masks": [(rng.random(n) < 0.2).tolist() for _ in range(nsplits)],
            "test_mask": (rng.random(n) < 0.3).tolist(),
        }
        src = tmp_path / "wikics"
        src.mkdir()
        json.dump(d, open(src / "data.json", "w"))
        rowptr, col, x, y, tr, va, te = cd.convert_wikics(str(src), split_idx=1)
        assert x.shape == (n, f) and y.dtype == np.int32
        # val mask is the stopping mask (reference get_wikics, data.py:26)
        assert np.array_equal(va, np.asarray(d["stopping_masks"][1]))
        assert np.array_equal(te, np.asarray(d["test_mask"]))

    def test_gnnbench_conversion(self, tmp_path, rng):
        import convert_dataset as cd
        import scipy.sparse as sp

        n, f = 50, 9
        adj = sp.random(n, n, density=0.1, format="csr", random_state=0)
        attr = sp.random(n, f, density=0.3, format="csr", random_state=1)
        y = rng.integers(0, 3, size=n).astype(np.int32)
        path = tmp_path / "coauthor_cs.npz"
        np.savez(path, adj_data=adj.data, adj_indices=adj.indices,
                 adj_indptr=adj.indptr, adj_shape=np.array(adj.shape),
                 attr_data=attr.data, attr_indices=attr.indices,
                 attr_indptr=attr.indptr, attr_shape=np.array(attr.shape),
                 labels=y)
        rowptr, col, x, yy, tr, va, te = cd.convert_gnnbench(str(path))
        assert np.allclose(x, attr.toarray())
        assert np.array_equal(yy, y)
        # per-class budget: ~20 train / 30 val per class, disjoint masks
        assert not (tr & va).any() and not (tr & te).any()
        assert (tr | va | te).all()
        # deterministic under the pinned seed
        _, _, _, _, tr2, _, _ = cd.convert_gnnbench(str(path))
        assert np.array_equal(tr, tr2)

    def test_amazonproducts_transforms(self, tmp_path, rng):
        """--argmax-labels / --standardize-features (reference
        get_amazon_products, data.py:47-53)."""
        import convert_dataset as cd
        import scipy.sparse as sp

        n, f, c = 40, 5, 4
        src = tmp_path / "amazon_raw"
        src.mkdir()
        adj = sp.random(n, n, density=0.1, format="csr", random_state=2)
        sp.save_npz(src / "adj_full.npz", adj)
        np.save(src / "feats.npy", rng.normal(size=(n, f)).astype(np.float32))
        onehot = np.eye(c)[rng.integers(0, c, size=n)]
        json.dump({str(i): onehot[i].tolist() for i in range(n)},
                  open(src / "class_map.json", "w"))
        idx = rng.permutation(n)
        json.dump({"tr": idx[:20].tolist(), "va": idx[20:30].tolist(),
                   "te": idx[30:].tolist()}, open(src / "role.json", "w"))
        out = tmp_path / "ds" / "amazonproducts" / "data.npz"
        sys.argv = ["x", "--format", "saint", "--src", str(src),
                    "--out", str(out), "--argmax-labels",
                    "--standardize-features"]
        cd.main()
        d, ic, oc = get_data(str(tmp_path / "ds"), "amazonproducts")
        assert d.y.ndim == 1 and oc == c  # argmaxed to single-label
        assert abs(float(d.x.mean())) < 1e-5  # standardized
        assert not d.multilabel
