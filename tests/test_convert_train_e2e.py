"""Raw files -> convert -> main.py training at full fidelity (VERDICT r2
item 10): an OGB-format on-disk fixture at ~1M edges goes through
``scripts/convert_dataset.py`` and then a real ``main.py`` run — dataset
load, partitioner, trainer, eval — without ever touching ``make_sbm``.

The fixture's labels are a linear readout of the node features
(``y = argmax(x[:, :C])``), so a GCN genuinely learns them through the
normalized propagation — the run must beat chance by a wide margin, not
just complete.  Named ``arxiv`` so the real conf/model/gcn.yaml arxiv
hyperparameter block (the one a real ogbn-arxiv run would use,
reference README.md:53-75) is exercised, with size overrides for the CPU
test budget."""

import gzip
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.full

N, F, C, E = 30_000, 32, 10, 1_000_000


def _write_csv_gz(path, arr, fmt):
    # np.savetxt is ~10x too slow at 1M rows; join formatted rows directly
    if arr.dtype.kind in "iu":
        lines = [",".join(map(str, row)) for row in arr.tolist()]
    else:
        lines = [",".join(fmt % v for v in row) for row in arr.tolist()]
    with gzip.open(path, "wt", compresslevel=1) as fh:
        fh.write("\n".join(lines) + "\n")


def _write_ogb_fixture(src, seed=0, n=N, f=F, c=C, e=E):
    rng = np.random.default_rng(seed)
    raw = os.path.join(src, "raw")
    split = os.path.join(src, "split", "time")
    os.makedirs(raw), os.makedirs(split)
    # homophilous graph (70% intra-class edges) + noisy one-hot features:
    # the same structure class as real arxiv, learnable by a GCN in a few
    # epochs, but written by hand — no make_sbm anywhere in this path
    y = rng.integers(0, c, size=n)
    by_class = [np.nonzero(y == cc)[0] for cc in range(c)]
    s_node = rng.integers(0, n, size=e)
    intra = rng.random(e) < 0.7
    dst = rng.integers(0, n, size=e)
    for cc in range(c):
        m = intra & (y[s_node] == cc)
        dst[m] = rng.choice(by_class[cc], size=int(m.sum()))
    edges = np.stack([s_node, dst], axis=1)
    edges = edges[edges[:, 0] != edges[:, 1]]
    x = (np.eye(c, dtype=np.float32)[y][:, :] * 2.0
         + rng.normal(size=(n, c)).astype(np.float32))
    x = np.concatenate([x, rng.normal(size=(n, f - c)).astype(np.float32)],
                       axis=1)
    _write_csv_gz(os.path.join(raw, "edge.csv.gz"), edges, "%d")
    _write_csv_gz(os.path.join(raw, "node-feat.csv.gz"), x, "%.4f")
    _write_csv_gz(os.path.join(raw, "node-label.csv.gz"),
                  y.reshape(-1, 1), "%d")
    perm = rng.permutation(n)
    for name, idx in (("train", perm[: n // 2]),
                      ("valid", perm[n // 2: 3 * n // 4]),
                      ("test", perm[3 * n // 4:])):
        _write_csv_gz(os.path.join(split, f"{name}.csv.gz"),
                      idx.reshape(-1, 1), "%d")


def test_ogb_fixture_convert_then_train(tmp_path):
    src = str(tmp_path / "ogbn_fixture")
    root = str(tmp_path / "root")
    _write_ogb_fixture(src)
    out = os.path.join(root, "arxiv", "data.npz")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_dataset.py"),
         "--format", "ogb", "--src", src, "--out", out],
        check=True, cwd=REPO, capture_output=True,
    )
    assert os.path.exists(out)

    env = {**os.environ, "INCAGG_PLATFORM": "cpu"}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"),
         "--model", os.path.join(REPO, "conf", "model", "gcn.yaml"),
         "--dataset", "arxiv", "--root", root,
         # real arxiv block, shrunk to the CPU test budget
         "epochs=4", "num_parts=16", "batch_size=4", "vr_update=true",
         "hidden_channels=64", "num_layers=2", "batch_norm=false",
         "dropout=0.1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # the epoch log + summary go through logging (stderr)
    m = re.search(r"Val: ([0-9.]+), Test: ([0-9.]+)",
                  proc.stdout + proc.stderr)
    assert m, (proc.stdout[-1000:], proc.stderr[-1000:])
    val, test = float(m.group(1)), float(m.group(2))
    # chance = 1/C = 0.10; homophilous edges + informative features make
    # even 4 epochs land far above chance
    assert val > 0.5 and test > 0.5, (val, test, proc.stderr[-1500:])


def test_ogb_fixture_products_scale_convert_then_train(tmp_path):
    """VERDICT r3 next #9: the converter + loader path proven at realistic
    size — a multi-million-edge OGB-format archive (products-shape: 250K
    nodes / 5M directed raw edges, 100 features) through
    ``scripts/convert_dataset.py`` and a real ``main.py`` training run.
    When real ogbn data shows up, this exact pipeline is day-one work; the
    fixture keeps it proven at scale meanwhile."""
    n, f, c, e = 250_000, 100, 16, 5_000_000
    src = str(tmp_path / "ogbn_fixture_big")
    root = str(tmp_path / "root")
    _write_ogb_fixture(src, n=n, f=f, c=c, e=e)
    out = os.path.join(root, "products", "data.npz")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_dataset.py"),
         "--format", "ogb", "--src", src, "--out", out],
        check=True, cwd=REPO, capture_output=True, timeout=1200,
    )
    z = np.load(out)
    assert z["rowptr"].shape[0] == n + 1
    assert z["col"].shape[0] >= e  # symmetrized: >= the raw directed count
    env = {**os.environ, "INCAGG_PLATFORM": "cpu"}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"),
         "--model", os.path.join(REPO, "conf", "model", "gcn.yaml"),
         "--dataset", "products", "--root", root,
         "epochs=2", "num_parts=32", "batch_size=4", "vr_update=true",
         "hidden_channels=64", "num_layers=2", "batch_norm=false",
         "dropout=0.1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = re.search(r"Val: ([0-9.]+), Test: ([0-9.]+)",
                  proc.stdout + proc.stderr)
    assert m, (proc.stdout[-1000:], proc.stderr[-1000:])
    val, test = float(m.group(1)), float(m.group(2))
    assert val > 0.4 and test > 0.4, (val, test, proc.stderr[-1500:])
