"""Convert raw dataset files into the framework's ``.npz`` archive format.

The reference downloads datasets through PyG/OGB at runtime (data.py:118-145);
this environment has no network egress, so real datasets must be converted
once from raw files with this script (run anywhere with the raw data, copy
the npz over):

    python scripts/convert_dataset.py --format ogb   --src path/to/ogbn_arxiv   --out {root}/arxiv/data.npz
    python scripts/convert_dataset.py --format saint --src path/to/reddit_raw   --out {root}/reddit/data.npz

Supported inputs:
- ``ogb``: an extracted OGB node-prediction directory (raw/ with
  edge.csv.gz, node-feat.csv.gz, node-label.csv.gz, split/...).
- ``saint``: GraphSAINT-style raw files (adj_full.npz [scipy CSR],
  feats.npy, class_map.json, role.json) — covers Reddit/Flickr/Yelp/
  AmazonProducts as distributed by GraphSAINT (reference data.py:81-116).

Output archive keys: rowptr, col, [value], x, y, train_mask, val_mask,
test_mask — see incagg_gnn_tpu/graph/datasets.py:load_npz_dataset.
"""

from __future__ import annotations

import argparse
import gzip
import json
import os

import numpy as np


def symmetrize(row, col, n):
    r = np.concatenate([row, col])
    c = np.concatenate([col, row])
    keep = r != c
    r, c = r[keep], c[keep]
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    dup = np.concatenate([[False], (r[1:] == r[:-1]) & (c[1:] == c[:-1])])
    r, c = r[~dup], c[~dup]
    rowptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(rowptr, r + 1, 1)
    return np.cumsum(rowptr), c.astype(np.int32)


def convert_ogb(src: str):
    raw = os.path.join(src, "raw")
    edges = np.loadtxt(gzip.open(os.path.join(raw, "edge.csv.gz"), "rt"),
                       delimiter=",", dtype=np.int64)
    x = np.loadtxt(gzip.open(os.path.join(raw, "node-feat.csv.gz"), "rt"),
                   delimiter=",", dtype=np.float32)
    y = np.loadtxt(gzip.open(os.path.join(raw, "node-label.csv.gz"), "rt"),
                   delimiter=",", dtype=np.int64).reshape(-1)
    n = x.shape[0]
    rowptr, col = symmetrize(edges[:, 0], edges[:, 1], n)
    split_dir = None
    for cand in ("split/time", "split/sales_ranking", "split"):
        d = os.path.join(src, cand)
        if os.path.exists(os.path.join(d, "train.csv.gz")):
            split_dir = d
            break
    masks = {}
    for name in ("train", "valid", "test"):
        idx = np.loadtxt(gzip.open(os.path.join(split_dir, f"{name}.csv.gz"), "rt"),
                         dtype=np.int64).reshape(-1)
        m = np.zeros(n, dtype=bool)
        m[idx] = True
        masks[name] = m
    return rowptr, col, x, y.astype(np.int32), masks["train"], masks["valid"], masks["test"]


def convert_saint(src: str):
    import scipy.sparse as sp

    adj = sp.load_npz(os.path.join(src, "adj_full.npz")).tocsr()
    x = np.load(os.path.join(src, "feats.npy")).astype(np.float32)
    n = x.shape[0]
    class_map = json.load(open(os.path.join(src, "class_map.json")))
    first = next(iter(class_map.values()))
    if isinstance(first, list):  # multi-label (yelp/amazon)
        y = np.zeros((n, len(first)), dtype=np.float32)
        for k, v in class_map.items():
            y[int(k)] = v
    else:
        y = np.zeros(n, dtype=np.int32)
        for k, v in class_map.items():
            y[int(k)] = v
    role = json.load(open(os.path.join(src, "role.json")))
    masks = []
    for key in ("tr", "va", "te"):
        m = np.zeros(n, dtype=bool)
        m[np.asarray(role[key])] = True
        masks.append(m)
    coo = adj.tocoo()
    rowptr, col = symmetrize(coo.row.astype(np.int64), coo.col.astype(np.int64), n)
    return rowptr, col, x, y, masks[0], masks[1], masks[2]


def convert_planetoid(src: str):
    """Planetoid raw pickles (ind.{name}.{x,tx,allx,y,ty,ally,graph,test.index})
    — covers Cora/Citeseer/Pubmed (reference: get_planetoid, data.py:15-36).
    ``src`` is the directory plus dataset prefix, e.g. ``raw/ind.cora``."""
    import pickle

    def load(ext):
        with open(f"{src}.{ext}", "rb") as f:
            return pickle.load(f, encoding="latin1")

    x, tx, allx = load("x"), load("tx"), load("allx")
    y, ty, ally = load("y"), load("ty"), load("ally")
    graph = load("graph")
    test_idx = np.loadtxt(f"{src}.test.index", dtype=np.int64)
    test_sorted = np.sort(test_idx)

    import scipy.sparse as sp

    def dense(m):
        return m.toarray() if sp.issparse(m) else np.asarray(m)

    allx, tx = dense(allx), dense(tx)
    n = int(max(test_idx.max() + 1, allx.shape[0] + tx.shape[0]))
    feat = np.zeros((n, allx.shape[1]), dtype=np.float32)
    feat[: allx.shape[0]] = allx
    feat[test_sorted] = tx
    labels = np.zeros((n, np.asarray(ally).shape[1]), dtype=np.float32)
    labels[: allx.shape[0]] = ally
    labels[test_sorted] = ty
    y_idx = labels.argmax(1).astype(np.int32)

    rows, cols = [], []
    for v, nbrs in graph.items():
        for u in nbrs:
            rows.append(v)
            cols.append(u)
    rowptr, col = symmetrize(np.array(rows), np.array(cols), n)

    train_mask = np.zeros(n, bool)
    train_mask[: dense(x).shape[0]] = True
    val_mask = np.zeros(n, bool)
    val_mask[dense(x).shape[0] : dense(x).shape[0] + 500] = True
    test_mask = np.zeros(n, bool)
    test_mask[test_sorted] = True
    return rowptr, col, feat, y_idx, train_mask, val_mask, test_mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--format", choices=["ogb", "saint", "planetoid"], required=True)
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    fn = {"ogb": convert_ogb, "saint": convert_saint,
          "planetoid": convert_planetoid}[args.format]
    rowptr, col, x, y, tr, va, te = fn(args.src)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, rowptr=rowptr, col=col, x=x, y=y,
                        train_mask=tr, val_mask=va, test_mask=te)
    print(f"wrote {args.out}: N={len(rowptr) - 1} E={len(col)} F={x.shape[1]}")


if __name__ == "__main__":
    main()
