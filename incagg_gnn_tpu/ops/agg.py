"""Polymorphic aggregation front-end.

Models call these functions with whatever adjacency format the loader built:

- ``PaddedAdj`` — sorted COO edge list + segment ops (ops/spmm.py); required
  for edge-level computations (GAT attention) and edge dropout;
- ``HybridAdj`` — scatter-free ELL+COO (ops/ell.py); fastest forward-only
  path (refresh sweeps, eval);
- ``BiHybridAdj`` — hybrid pair with a transpose-based custom VJP; the
  training path (backward costs the same as forward).

Measured on v5e (100K nodes / 1.5M edges / d=256): COO segment-sum 58-65M
edges/s; hybrid ELL 106M edges/s.
"""

from __future__ import annotations

from incagg_gnn_tpu.ops.block import (
    BiBlockHybridAdj,
    BlockHybridAdj,
    spmm_block as _blk_sum,
    spmm_block_bi as _bblk_sum,
    spmm_block_bi_mean as _bblk_mean,
    spmm_block_mean as _blk_mean,
)
from incagg_gnn_tpu.ops.ell import (
    BiHybridAdj,
    HybridAdj,
    spmm_bi as _bi_sum,
    spmm_bi_max as _bi_max,
    spmm_bi_mean as _bi_mean,
    spmm_hybrid as _hyb_sum,
    spmm_hybrid_max as _hyb_max,
    spmm_hybrid_mean as _hyb_mean,
)
from incagg_gnn_tpu.ops.spmm import (
    PaddedAdj,
    spmm as _coo_sum,
    spmm_max as _coo_max,
    spmm_mean as _coo_mean,
    spmm_min as _coo_min,
)

AnyAdj = (PaddedAdj, HybridAdj, BiHybridAdj, BlockHybridAdj, BiBlockHybridAdj)


def spmm(adj, x):
    if isinstance(adj, BiBlockHybridAdj):
        return _bblk_sum(adj, x)
    if isinstance(adj, BlockHybridAdj):
        return _blk_sum(adj, x)
    if isinstance(adj, BiHybridAdj):
        return _bi_sum(adj, x)
    if isinstance(adj, HybridAdj):
        return _hyb_sum(adj, x)
    return _coo_sum(adj, x)


def spmm_mean(adj, x):
    if isinstance(adj, BiBlockHybridAdj):
        return _bblk_mean(adj, x)
    if isinstance(adj, BlockHybridAdj):
        return _blk_mean(adj, x)
    if isinstance(adj, BiHybridAdj):
        return _bi_mean(adj, x)
    if isinstance(adj, HybridAdj):
        return _hyb_mean(adj, x)
    return _coo_mean(adj, x)


def spmm_max(adj, x):
    if isinstance(adj, (BlockHybridAdj, BiBlockHybridAdj)):
        raise TypeError(
            "max aggregation is not expressible on the dense MXU tier; "
            "use hybrid/coo formats for max/min models (trainer gates this)"
        )
    if isinstance(adj, BiHybridAdj):
        return _bi_max(adj, x)  # scatter-free transpose backward
    if isinstance(adj, HybridAdj):
        return _hyb_max(adj, x)
    return _coo_max(adj, x)


def spmm_min(adj, x):
    if isinstance(adj, (BiHybridAdj, HybridAdj, BlockHybridAdj,
                        BiBlockHybridAdj)):
        return -spmm_max(adj, -x)
    return _coo_min(adj, x)


def spmm_reduce(adj, x, reduce: str):
    if reduce in ("sum", "add"):
        return spmm(adj, x)
    if reduce == "mean":
        return spmm_mean(adj, x)
    if reduce == "max":
        return spmm_max(adj, x)
    if reduce == "min":
        return spmm_min(adj, x)
    raise ValueError(f"unknown reduce: {reduce}")


def binarized_like(adj):
    return adj.binarized()


def edge_counts(adj, batch_size):
    """(#in-batch edges, #out-of-batch edges) — the reference's per-step
    neighbor counts (base.py:369-378)."""
    if isinstance(adj, BiBlockHybridAdj):
        adj = adj.fwd
    if isinstance(adj, BlockHybridAdj):
        import jax.numpy as jnp

        a_real = adj.dense.a != 0  # [NB, B, B]
        bcol_flat = adj.dense.bcols.T.reshape(-1)  # tile -> col-block id
        col_ids = bcol_flat[:, None] * 128 + jnp.arange(128)[None, :]
        ib_mask = (col_ids < batch_size)[:, None, :]
        d_ib = (a_real & ib_mask).sum()
        d_tot = a_real.sum()
        r_ib, r_ob = edge_counts(adj.rem, batch_size)
        return d_ib + r_ib, d_tot - d_ib + r_ob
    if isinstance(adj, BiHybridAdj):
        adj = adj.fwd
    if isinstance(adj, HybridAdj):
        e_real = adj.ell_vals != 0
        e_ib = (e_real & (adj.ell_cols < batch_size)).sum()
        o_real = adj.ovf_vals != 0
        o_ib = (o_real & (adj.ovf_cols < batch_size)).sum()
        n_ib = e_ib + o_ib
        return n_ib, e_real.sum() + o_real.sum() - n_ib
    real = adj.vals != 0
    ib = (real & (adj.cols < batch_size)).sum()
    return ib, real.sum() - ib
