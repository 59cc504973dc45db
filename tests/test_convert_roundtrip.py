"""Convert -> load round-trip on a synthetic OGB-format fixture (VERDICT r1
item 2b): proves ``scripts/convert_dataset.py --format ogb`` is known-good
the day real data appears (no real dataset exists in this environment).

Fixture mirrors the extracted OGB node-prediction layout the converter
documents (raw/{edge,node-feat,node-label}.csv.gz + split/time/*.csv.gz,
reference data.py:118-145)."""

import gzip
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_ogb_fixture(src, n=60, f=5, c=3, seed=0):
    rng = np.random.default_rng(seed)
    raw = os.path.join(src, "raw")
    split = os.path.join(src, "split", "time")
    os.makedirs(raw), os.makedirs(split)
    edges = rng.integers(0, n, size=(4 * n, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    x = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.integers(0, c, size=n)
    def _save(path, arr, fmt):
        with gzip.open(path, "wt") as fh:
            np.savetxt(fh, arr, fmt=fmt, delimiter=",")

    _save(os.path.join(raw, "edge.csv.gz"), edges, "%d")
    _save(os.path.join(raw, "node-feat.csv.gz"), x, "%.6f")
    _save(os.path.join(raw, "node-label.csv.gz"), y.reshape(-1, 1), "%d")
    perm = rng.permutation(n)
    for name, idx in (("train", perm[:30]), ("valid", perm[30:45]),
                      ("test", perm[45:])):
        _save(os.path.join(split, f"{name}.csv.gz"), idx.reshape(-1, 1), "%d")
    return edges, x, y, perm


def test_ogb_convert_load_roundtrip(tmp_path):
    src = str(tmp_path / "ogbn_tiny")
    root = str(tmp_path / "root")
    edges, x, y, perm = _write_ogb_fixture(src)
    out = os.path.join(root, "tiny", "data.npz")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_dataset.py"),
         "--format", "ogb", "--src", src, "--out", out],
        check=True, cwd=REPO, capture_output=True,
    )

    from incagg_gnn_tpu.graph.datasets import get_data

    data, in_c, out_c = get_data(root, "tiny")
    n = x.shape[0]
    assert (in_c, out_c) == (x.shape[1], 3)
    assert np.allclose(np.asarray(data.x), x, atol=1e-5)
    assert np.array_equal(np.asarray(data.y), y)
    assert data.train_mask.sum() == 30 and data.test_mask.sum() == n - 45
    assert not (data.train_mask & (data.val_mask | data.test_mask)).any()
    # adjacency: symmetrized, deduped, no self-loops
    adj = data.adj_t
    rowptr, col = np.asarray(adj.rowptr), np.asarray(adj.col)
    dense = np.zeros((n, n), dtype=bool)
    dense[edges[:, 0], edges[:, 1]] = True
    dense |= dense.T
    np.fill_diagonal(dense, False)
    got = np.zeros((n, n), dtype=bool)
    for i in range(n):
        got[i, col[rowptr[i]:rowptr[i + 1]]] = True
    assert np.array_equal(got, dense)

    # and the archive trains: one epoch of a tiny GCN end-to-end
    from incagg_gnn_tpu.models import GCN, GCNConfig
    from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

    cfg = GCNConfig(num_nodes=n, in_channels=in_c, hidden_channels=8,
                    out_channels=out_c, num_layers=2, dropout=0.0,
                    drop_input=False, batch_norm=False)
    res = Trainer(GCN(cfg), data,
                  TrainerConfig(num_parts=4, batch_size=2, epochs=1,
                                seed=0)).fit()
    assert 0.0 <= res["best_test"] <= 1.0
