"""One-hop subgraph extraction with local relabeling.

Host-side preprocessing matching the contract of the reference native kernels
(csrc/cpu/relabel_cpu.cpp):

- ``relabel_one_hop`` (reference: relabel_cpu.cpp:5-108): induced one-hop
  subgraph of the batch nodes ``idx``; rows = the ``idx`` nodes (bipartite),
  columns relabeled so in-batch (IB) nodes keep their position in ``idx`` and
  out-of-batch (OB) neighbors are appended after them in first-seen order.
  Returns ``(rowptr, col, value, n_id)`` with ``n_id = idx ++ ob_ids``.

- ``relabel_one_hop_within_batch`` (reference: relabel_cpu.cpp:112-214):
  same, but edges with an OB endpoint are dropped — the IB-only graph used by
  Reverb/VR training batches.

Uses the native C++ kernels (csrc/graph_ops.cpp) when available; the numpy
fallbacks below are fully vectorized and serve as the test oracle.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from incagg_gnn_tpu.graph.csr import CSRGraph
from incagg_gnn_tpu.utils.native import get_native_lib

RelabelOut = Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], np.ndarray]


def _gather_rows(adj: CSRGraph, idx: np.ndarray):
    """Concatenate the CSR rows of ``idx``: per-edge global col ids + new rowptr."""
    starts = adj.rowptr[idx]
    counts = adj.rowptr[idx + 1] - starts
    out_rowptr = np.zeros(idx.shape[0] + 1, dtype=np.int64)
    np.cumsum(counts, out=out_rowptr[1:])
    total = int(out_rowptr[-1])
    if total == 0:
        e_idx = np.empty(0, dtype=np.int64)
    else:
        e_idx = np.repeat(starts, counts) + (
            np.arange(total, dtype=np.int64) - np.repeat(out_rowptr[:-1], counts)
        )
    cols = adj.col[e_idx].astype(np.int64)
    vals = adj.value[e_idx] if adj.value is not None else None
    return out_rowptr, cols, vals


def relabel_one_hop(adj: CSRGraph, idx: np.ndarray, bipartite: bool = True) -> RelabelOut:
    """Full IB+OB relabel. ``n_id[: len(idx)] == idx``; OB ids follow in
    first-seen order, identical to the reference's hash-map construction."""
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    lib = get_native_lib()
    if lib is not None:
        rowptr, col, value, n_id = lib.relabel_one_hop(adj.rowptr, adj.col, adj.value, idx)
    else:
        rowptr, cols, value = _gather_rows(adj, idx)
        num_idx = idx.shape[0]
        # local ids for IB nodes
        in_batch_pos = np.full(adj.num_nodes, -1, dtype=np.int64)
        in_batch_pos[idx] = np.arange(num_idx, dtype=np.int64)
        local = in_batch_pos[cols]
        ob_mask = local < 0
        if ob_mask.any():
            ob_cols = cols[ob_mask]
            # first-seen order: np.unique returns first occurrence indices
            uniq, first_pos = np.unique(ob_cols, return_index=True)
            order = np.argsort(first_pos, kind="stable")
            ob_ids = uniq[order]
            ob_local = np.empty(adj.num_nodes, dtype=np.int64)
            ob_local[ob_ids] = num_idx + np.arange(ob_ids.shape[0], dtype=np.int64)
            local[ob_mask] = ob_local[ob_cols]
            n_id = np.concatenate([idx, ob_ids])
        else:
            n_id = idx.copy()
        col = local.astype(np.int32)
    if not bipartite:
        extra = n_id.shape[0] - (rowptr.shape[0] - 1)
        if extra > 0:
            rowptr = np.concatenate([rowptr, np.full(extra, rowptr[-1], dtype=np.int64)])
    return rowptr, col, value, n_id


def relabel_one_hop_within_batch(
    adj: CSRGraph, idx: np.ndarray, bipartite: bool = True
) -> RelabelOut:
    """IB-only relabel: drops all edges touching out-of-batch nodes
    (reference: relabel_cpu.cpp:143-155)."""
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    lib = get_native_lib()
    if lib is not None:
        return lib.relabel_one_hop_within_batch(adj.rowptr, adj.col, adj.value, idx)
    rowptr, cols, value = _gather_rows(adj, idx)
    num_idx = idx.shape[0]
    in_batch_pos = np.full(adj.num_nodes, -1, dtype=np.int64)
    in_batch_pos[idx] = np.arange(num_idx, dtype=np.int64)
    local = in_batch_pos[cols]
    keep = local >= 0
    # recompute rowptr over kept edges
    row = np.repeat(np.arange(num_idx, dtype=np.int64), np.diff(rowptr))
    kept_counts = np.bincount(row[keep], minlength=num_idx)
    out_rowptr = np.zeros(num_idx + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=out_rowptr[1:])
    out_col = local[keep].astype(np.int32)
    out_value = value[keep] if value is not None else None
    return out_rowptr, out_col, out_value, idx


def sample_neighbors(
    rowptr: np.ndarray,
    col: np.ndarray,
    value: Optional[np.ndarray],
    num_neighbors: int,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Cap each row at ``num_neighbors`` uniformly-sampled entries (without
    replacement).  Fixed reimplementation of the reference's broken
    ``sample_neighbors`` (loader.py:32-93, see SURVEY §2.9)."""
    if num_neighbors < 0:
        return rowptr, col, value
    lib = get_native_lib()
    if lib is not None:
        return lib.sample_neighbors(rowptr, col, value, num_neighbors, seed)
    rng = np.random.default_rng(seed)
    num_rows = rowptr.shape[0] - 1
    counts = np.diff(rowptr)
    out_counts = np.minimum(counts, num_neighbors)
    out_rowptr = np.zeros(num_rows + 1, dtype=np.int64)
    np.cumsum(out_counts, out=out_rowptr[1:])
    out_col = np.empty(int(out_rowptr[-1]), dtype=col.dtype)
    out_value = np.empty(int(out_rowptr[-1]), dtype=np.float32) if value is not None else None
    for i in range(num_rows):
        s, e = int(rowptr[i]), int(rowptr[i + 1])
        take = int(out_counts[i])
        if take == e - s:
            sel = np.arange(s, e)
        else:
            sel = s + np.sort(rng.choice(e - s, size=take, replace=False))
        o = int(out_rowptr[i])
        out_col[o : o + take] = col[sel]
        if out_value is not None:
            out_value[o : o + take] = value[sel]
    return out_rowptr, out_col, out_value
