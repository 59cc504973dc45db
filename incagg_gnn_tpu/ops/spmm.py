"""Sparse neighborhood aggregation as padded gather / segment-reduce.

This is the TPU replacement for the reference's ``torch_sparse`` SpMM
(``adj_t @ x`` / ``spmm(adj_t, x, reduce=...)``, e.g. models/graphsage.py:634).
Instead of CSR matvecs with dynamic shapes, every batch adjacency is a
statically-shaped edge list sorted by destination row:

- ``rows[e]`` — local destination (IB) row id,
- ``cols[e]`` — local source column id,
- ``vals[e]`` — edge weight (1.0 for binary adjacencies, 0.0 for padding),

padded to a bucketed ``num_edges`` so XLA compiles once per bucket.  Padding
edges carry ``vals == 0`` and point at a zero "trash" column, so sum/mean
reductions need no masking; max reductions mask explicitly.

The aggregation itself is ``take`` + ``segment_sum``, which XLA lowers to a
fused gather / scatter-add — the roofline here is HBM bandwidth on the
``x[cols]`` gather.  A Pallas row-blocked variant lives in
``ops/pallas_spmm.py`` and is used for large hidden dims where it wins.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PaddedAdj(NamedTuple):
    """A statically-shaped (bipartite) sparse adjacency block.

    ``num_rows``/``num_cols`` are the *padded* static sizes; ``deg`` holds the
    true per-row entry count (used by mean reductions and PNA scalers).
    Replaces the reference's ``SparseTensor`` batch adjacency
    (loader.py:183-185).
    """

    rows: jnp.ndarray  # [E_pad] int32, sorted ascending; padding -> num_rows-1 is NOT assumed
    cols: jnp.ndarray  # [E_pad] int32; padding -> a column with zero features
    vals: jnp.ndarray  # [E_pad] float32; padding -> 0.0
    deg: jnp.ndarray  # [R_pad] float32, true row degree (entry count)

    @property
    def num_rows(self) -> int:
        return self.deg.shape[0]

    def with_values(self, vals: jnp.ndarray) -> "PaddedAdj":
        return self._replace(vals=vals)

    def binarized(self) -> "PaddedAdj":
        """Drop edge weights, keeping the 0/1 padding structure (reference:
        ``adj_t.set_value(None)`` in SAGE's VR forward, graphsage.py:628)."""
        return self._replace(vals=(self.vals != 0).astype(jnp.float32))

    def mask_in_batch(self, batch_size) -> "PaddedAdj":
        """Keep only edges whose source column is in-batch (< batch_size) —
        the IB-only ablation adjacency (reference: gcn.py:117-141).  Degrees
        are recomputed to match the kept entries."""
        keep = (self.cols < batch_size) & (self.vals != 0)
        vals = jnp.where(keep, self.vals, 0.0)
        deg = jax.ops.segment_sum(
            keep.astype(jnp.float32), self.rows, num_segments=self.num_rows,
            indices_are_sorted=True,
        )
        return self._replace(vals=vals, deg=deg)


def spmm(adj: PaddedAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Weighted sum aggregation: ``out[r] = sum_e vals[e] * x[cols[e]]``.

    Equivalent to the reference's ``adj_t @ x`` (torch_sparse matmul with
    reduce='sum').  ``x: [C_pad, D] -> out: [R_pad, D]``.
    """
    gathered = jnp.take(x, adj.cols, axis=0) * adj.vals[:, None]
    return jax.ops.segment_sum(
        gathered, adj.rows, num_segments=adj.num_rows, indices_are_sorted=True
    )


def spmm_mean(adj: PaddedAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Mean aggregation over true (unpadded) neighbors — reference:
    ``spmm(adj_t, x, reduce='mean')`` used by SAGEConv (graphsage.py:634)."""
    s = spmm(adj, x)
    return s / jnp.maximum(adj.deg, 1.0)[:, None]


def spmm_max(adj: PaddedAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Max aggregation; padding edges are masked to -inf; rows with no
    neighbors produce 0 (matching torch_sparse reduce='max' semantics)."""
    gathered = jnp.take(x, adj.cols, axis=0)
    neg = jnp.finfo(x.dtype).min
    gathered = jnp.where((adj.vals != 0)[:, None], gathered, neg)
    out = jax.ops.segment_max(
        gathered, adj.rows, num_segments=adj.num_rows, indices_are_sorted=True
    )
    return jnp.where(adj.deg[:, None] > 0, out, 0.0)


def spmm_min(adj: PaddedAdj, x: jnp.ndarray) -> jnp.ndarray:
    return -spmm_max(adj, -x)


def spmm_reduce(adj: PaddedAdj, x: jnp.ndarray, reduce: str) -> jnp.ndarray:
    if reduce in ("sum", "add"):
        return spmm(adj, x)
    if reduce == "mean":
        return spmm_mean(adj, x)
    if reduce == "max":
        return spmm_max(adj, x)
    if reduce == "min":
        return spmm_min(adj, x)
    raise ValueError(f"unknown reduce: {reduce}")


def segment_softmax(scores: jnp.ndarray, rows: jnp.ndarray, num_rows: int,
                    valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-destination-row softmax over edge scores (for GAT attention).

    ``scores: [E_pad, H] -> [E_pad, H]``; padding edges (``valid == False``)
    get zero weight.
    """
    if valid is not None:
        scores = jnp.where(valid[:, None], scores, jnp.finfo(scores.dtype).min)
    row_max = jax.ops.segment_max(scores, rows, num_segments=num_rows,
                                  indices_are_sorted=True)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    ex = jnp.exp(scores - jnp.take(row_max, rows, axis=0))
    if valid is not None:
        ex = jnp.where(valid[:, None], ex, 0.0)
    denom = jax.ops.segment_sum(ex, rows, num_segments=num_rows,
                                indices_are_sorted=True)
    return ex / jnp.maximum(jnp.take(denom, rows, axis=0), 1e-16)


def build_padded_adj(
    rowptr: np.ndarray,
    col: np.ndarray,
    value: Optional[np.ndarray],
    num_rows_pad: int,
    num_cols_pad: int,
    num_edges_pad: int,
    trash_col: Optional[int] = None,
) -> PaddedAdj:
    """Host-side constructor: CSR block -> padded edge list (numpy).

    Padding edges target ``trash_col`` (default: last padded column, which the
    loader guarantees holds zero features) with value 0; padding rows target
    row ``num_rows_pad - 1`` (harmless: value 0 contributes nothing).
    """
    e = int(col.shape[0])
    r = int(rowptr.shape[0] - 1)
    assert e <= num_edges_pad, (e, num_edges_pad)
    assert r <= num_rows_pad, (r, num_rows_pad)
    if trash_col is None:
        trash_col = num_cols_pad - 1
    rows = np.repeat(np.arange(r, dtype=np.int32), np.diff(rowptr))
    out_rows = np.full(num_edges_pad, num_rows_pad - 1, dtype=np.int32)
    out_cols = np.full(num_edges_pad, trash_col, dtype=np.int32)
    out_vals = np.zeros(num_edges_pad, dtype=np.float32)
    out_rows[:e] = rows
    out_cols[:e] = col
    out_vals[:e] = value if value is not None else 1.0
    deg = np.zeros(num_rows_pad, dtype=np.float32)
    deg[:r] = np.diff(rowptr)
    return PaddedAdj(
        rows=jnp.asarray(out_rows),
        cols=jnp.asarray(out_cols),
        vals=jnp.asarray(out_vals),
        deg=jnp.asarray(deg),
    )
