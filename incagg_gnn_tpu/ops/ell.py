"""Hybrid ELL + COO sparse format — the scatter-free TPU aggregation path.

Measured on v5e (SURVEY hard-part #2): the gather half of gather/segment-sum
SpMM runs at ~155M edges/s but the scatter-add half caps the whole op at
~60M edges/s.  ELLPACK eliminates the scatter: each row stores exactly ``K``
column slots (padded with the zero trash column), so aggregation is

    out = (x[ell_cols] * ell_vals[..., None]).sum(axis=1)       # [R, K, D] -> [R, D]

— a gather + dense reduction with **no scatter at all**.  Rows whose true
degree exceeds ``K`` spill their extra edges to a small sorted-COO overflow
handled by the (cheap, because tiny) segment-sum path — the classic
hybrid/HYB format from vector-machine SpMV, which is exactly the right shape
for the TPU's VPU.

``K`` is chosen per batch bucket as a high quantile of row degrees, bounding
ELL padding waste while keeping the overflow tail short.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class HybridAdj(NamedTuple):
    """ELL core + COO overflow (both statically shaped).

    Drop-in functional replacement for ``PaddedAdj`` in sum/mean aggregations;
    ``deg`` is the true row degree (entry count) as in ``PaddedAdj``.
    """

    ell_cols: jnp.ndarray  # [R_pad, K] int32; padding -> trash col
    ell_vals: jnp.ndarray  # [R_pad, K] float32; padding -> 0
    ovf_rows: jnp.ndarray  # [O_pad] int32 sorted; padding -> R_pad-1
    ovf_cols: jnp.ndarray  # [O_pad] int32; padding -> trash col
    ovf_vals: jnp.ndarray  # [O_pad] float32; padding -> 0
    deg: jnp.ndarray  # [R_pad] float32 true degrees

    @property
    def num_rows(self) -> int:
        return self.ell_cols.shape[0]

    def binarized(self) -> "HybridAdj":
        return self._replace(
            ell_vals=(self.ell_vals != 0).astype(jnp.float32),
            ovf_vals=(self.ovf_vals != 0).astype(jnp.float32),
        )

    def with_scaled_values(self, keep_ell, keep_ovf):
        return self._replace(ell_vals=keep_ell, ovf_vals=keep_ovf)


def choose_k(degrees: np.ndarray, quantile: float = 0.98, align: int = 8) -> int:
    """ELL width: a high degree quantile, aligned; bounds padding waste while
    keeping the COO overflow small."""
    if degrees.size == 0:
        return align
    k = int(np.quantile(degrees[degrees > 0], quantile)) if (degrees > 0).any() else 1
    k = max(k, 1)
    return ((k + align - 1) // align) * align


def build_hybrid_adj(
    rowptr: np.ndarray,
    col: np.ndarray,
    value: Optional[np.ndarray],
    num_rows_pad: int,
    num_cols_pad: int,
    k: Optional[int] = None,
    ovf_pad: Optional[int] = None,
    trash_col: Optional[int] = None,
) -> HybridAdj:
    """Host-side conversion CSR -> hybrid ELL/COO with static shapes."""
    r = int(rowptr.shape[0] - 1)
    deg = np.diff(rowptr).astype(np.int64)
    if trash_col is None:
        trash_col = num_cols_pad - 1
    if k is None:
        k = choose_k(deg)

    ell_cols = np.full((num_rows_pad, k), trash_col, dtype=np.int32)
    ell_vals = np.zeros((num_rows_pad, k), dtype=np.float32)
    v = value if value is not None else np.ones(col.shape[0], dtype=np.float32)

    take = np.minimum(deg, k)
    # scatter the first `take[i]` edges of each row into the ELL slab
    if col.shape[0]:
        e_row = np.repeat(np.arange(r), deg)
        e_pos = np.arange(col.shape[0]) - np.repeat(rowptr[:-1], deg)
        in_ell = e_pos < k
        ell_cols[e_row[in_ell], e_pos[in_ell]] = col[in_ell]
        ell_vals[e_row[in_ell], e_pos[in_ell]] = v[in_ell]
        ovf_rows = e_row[~in_ell].astype(np.int32)
        ovf_cols = col[~in_ell].astype(np.int32)
        ovf_vals = v[~in_ell].astype(np.float32)
    else:
        ovf_rows = np.empty(0, np.int32)
        ovf_cols = np.empty(0, np.int32)
        ovf_vals = np.empty(0, np.float32)

    o = int(ovf_rows.shape[0])
    if ovf_pad is None:
        ovf_pad = max(8, ((o + 127) // 128) * 128)
    assert o <= ovf_pad, (o, ovf_pad)
    orows = np.full(ovf_pad, num_rows_pad - 1, dtype=np.int32)
    ocols = np.full(ovf_pad, trash_col, dtype=np.int32)
    ovals = np.zeros(ovf_pad, dtype=np.float32)
    orows[:o] = ovf_rows
    ocols[:o] = ovf_cols
    ovals[:o] = ovf_vals

    deg_full = np.zeros(num_rows_pad, dtype=np.float32)
    deg_full[:r] = deg
    return HybridAdj(
        ell_cols=jnp.asarray(ell_cols),
        ell_vals=jnp.asarray(ell_vals),
        ovf_rows=jnp.asarray(orows),
        ovf_cols=jnp.asarray(ocols),
        ovf_vals=jnp.asarray(ovals),
        deg=jnp.asarray(deg_full),
    )


def spmm_hybrid(adj: HybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Weighted-sum aggregation, scatter-free on the ELL core."""
    g = jnp.take(x, adj.ell_cols.reshape(-1), axis=0)
    g = g.reshape(adj.ell_cols.shape + (x.shape[1],))
    out = (g * adj.ell_vals[..., None]).sum(axis=1)
    if adj.ovf_rows.shape[0] > 0:
        go = jnp.take(x, adj.ovf_cols, axis=0) * adj.ovf_vals[:, None]
        out = out + jax.ops.segment_sum(
            go, adj.ovf_rows, num_segments=adj.num_rows, indices_are_sorted=True
        )
    return out


def spmm_hybrid_mean(adj: HybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    return spmm_hybrid(adj, x) / jnp.maximum(adj.deg, 1.0)[:, None]


def spmm_hybrid_max(adj: HybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    neg = jnp.finfo(x.dtype).min
    g = jnp.take(x, adj.ell_cols.reshape(-1), axis=0)
    g = g.reshape(adj.ell_cols.shape + (x.shape[1],))
    g = jnp.where((adj.ell_vals != 0)[..., None], g, neg)
    out = g.max(axis=1)
    if adj.ovf_rows.shape[0] > 0:
        go = jnp.take(x, adj.ovf_cols, axis=0)
        go = jnp.where((adj.ovf_vals != 0)[:, None], go, neg)
        ovf = jax.ops.segment_max(
            go, adj.ovf_rows, num_segments=adj.num_rows, indices_are_sorted=True
        )
        out = jnp.maximum(out, ovf)
    return jnp.where(adj.deg[:, None] > 0, out, 0.0)
