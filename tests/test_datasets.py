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
