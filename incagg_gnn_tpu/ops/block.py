"""Block-dense (MXU) aggregation tier: dense 128x128 adjacency tiles + the
hybrid ELL/COO remainder.

After partition+permute (the production pipeline, reference metis.py:43-63),
intra-cluster edges concentrate in dense 128x128 blocks of the adjacency.
Where a block holds enough edges, materializing it as a dense tile and
running it through the MXU beats the gather engine — the ELL path costs a
constant ~5.5-8 ns per edge slot (issue-rate bound, docs/RESULTS.md), while
a dense tile costs one DMA + one [128,128]@[128,D] matmul regardless of how
many edges it holds (~110 ns bf16 / ~230 ns f32 at D=256, measured v5e).

Break-even is ~20 edges/block (bf16) / ~40 (f32).  That is only reached on
high-degree graphs (products/reddit shapes: measured 1.5-1.6x end-to-end
SpMM at deg 50; the deg-14 arxiv shape measures 0.96x — worse), and the
dense tiles inflate adjacency bytes ~30-200x, so the tier only pays when
the format is device-resident and reused (refresh sweeps with the loader's
device cache).  Both gates live in :func:`plan_block_tier` — callers build
the tier only when the measured block-count histogram says it wins.

The kernel is a scalar-prefetch Pallas grid over dense tiles, LANES tiles
per step (amortizes per-step overhead ~4x, measured 287 -> 108 ns/block),
with the output row-tile accumulated in VMEM across consecutive steps of
the same row-block (grid sorted row-major).  No in-kernel dynamic gather is
needed — the "gather" is the x-tile BlockSpec index_map reading the
prefetched block-column ids, which Mosaic supports natively (unlike element
gathers, which it rejects; docs/RESULTS.md "Pallas gather re-probe").
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from incagg_gnn_tpu.ops.ell import (
    HybridAdj,
    _zero_cotangent,
    build_hybrid_adj,
    choose_k,
    spmm_hybrid,
)

B = 128  # tile edge (MXU native)
# dense tiles per grid step: amortizes the ~287 ns/step grid overhead.
# 8 measures 160 ns/tile vs 190 at 4 on the reddit-shape tile set (+4% more
# filler tiles but 12% faster; 16 is no better — r3 probe, docs/RESULTS.md);
# LANES=4/8 outputs agree to 7e-9.  Overridable for probes (the tile list
# layout is LANES-dependent — rebuild after changing).
LANES = int(os.environ.get("INCAGG_BLOCK_LANES", "8"))

# v5e cost-model constants (docs/RESULTS.md measurements)
_HBM_GBPS = 819.0
_C_SLOT_NS = {4: 5.7, 2: 5.3}  # ELL per-slot cost by x itemsize
_COO_RATIO = 3.0  # overflow edge ~3x an ELL slot in the small-overflow
# regime; the scale-dependent locality knee lives in ops/ell.choose_k


class BlockDense(NamedTuple):
    """Flat row-major dense-tile list, padded so every grid step's LANES
    tiles share one row-block (``brow_step``) and every row-block appears in
    at least one step (fillers are zero tiles -> contribute nothing)."""

    a: jnp.ndarray  # [NB_pad, B, B] tile values (0 = no edge / filler)
    brow_step: jnp.ndarray  # [S] int32 row-block id per grid step
    bcols: jnp.ndarray  # [LANES, S] int32 col-block id per step lane


class BlockHybridAdj(NamedTuple):
    """Dense tier + hybrid remainder.  Forward-only (refresh/eval sweeps):
    the Pallas kernel defines no VJP — training keeps BiHybridAdj."""

    dense: BlockDense
    rem: HybridAdj  # remainder edges, same [R_pad x C_pad] index space
    deg: jnp.ndarray  # [R_pad] float32 FULL true degrees (rem.deg is partial)

    @property
    def num_rows(self) -> int:
        return self.rem.num_rows

    def binarized(self) -> "BlockHybridAdj":
        return self._replace(
            dense=self.dense._replace(
                a=(self.dense.a != 0).astype(self.dense.a.dtype)),
            rem=self.rem.binarized(),
        )


def block_cost_ns(x_itemsize: int, a_itemsize: int, d_hint: int,
                  rb_rows: int = B) -> float:
    """Measured per-dense-tile cost model: the (A tile + x tile) DMA at HBM
    bandwidth (the kernel is DMA-roofline-bound at LANES=4, docs/RESULTS.md).
    Tall tiles (``rb_rows`` > 128) amortize the x-tile DMA over more rows —
    the [rb, 128] A tile still reads ONE [128, D] x tile."""
    return (rb_rows * B * a_itemsize + B * d_hint * x_itemsize) / _HBM_GBPS


def marginal_thresh(x_itemsize: int, a_itemsize: int, d_hint: int,
                    rb_rows: int = B) -> int:
    """Edges/block above which one dense tile beats its edges' ELL slots."""
    c_slot = _C_SLOT_NS.get(x_itemsize, 5.7)
    return max(8, int(np.ceil(
        block_cost_ns(x_itemsize, a_itemsize, d_hint, rb_rows) / c_slot)))


def _cost_ns(counts: np.ndarray, num_edges: int,
             thresh: int, deg: np.ndarray, x_itemsize: int, a_itemsize: int,
             d_hint: int, rb_rows: int = B) -> Tuple[float, float, int]:
    """(est. hybrid-only ns, est. block+remainder ns, dense edge count)."""
    c_slot = _C_SLOT_NS.get(x_itemsize, 5.7)

    def hyb_cost(degs, e):
        if e == 0:
            return 0.0
        from incagg_gnn_tpu.ops.ell import (_OVF_LOCALITY_EDGES,
                                            _OVF_LOCALITY_EXTRA)

        k = choose_k(degs)
        ovf = int(np.maximum(degs - k, 0).sum())
        extra = _OVF_LOCALITY_EXTRA * max(0, ovf - _OVF_LOCALITY_EDGES)
        return (degs.size * k + _COO_RATIO * ovf + extra) * c_slot

    base = hyb_cost(deg, num_edges)
    dense_mask = counts >= thresh
    nb = int(dense_mask.sum())
    e_dense = int(counts[dense_mask].sum())
    c_blk = block_cost_ns(x_itemsize, a_itemsize, d_hint, rb_rows)
    # remainder rows keep their row count; degrees shrink by the dense edges.
    # Approximate the remainder degree distribution by uniform shrink (exact
    # per-row recount needs the edge->block map; this errs conservative).
    if num_edges > 0 and e_dense > 0:
        rem_deg = np.floor(deg * (1.0 - e_dense / num_edges)).astype(np.int64)
    else:
        rem_deg = deg
    tiered = nb * c_blk + hyb_cost(rem_deg, num_edges - e_dense)
    return base, tiered, e_dense


def plan_block_tier(
    rowptr: np.ndarray,
    col: np.ndarray,
    num_cols_pad: int,
    x_itemsize: int = 4,
    a_itemsize: Optional[int] = None,
    d_hint: int = 256,
    min_gain: float = 0.08,
) -> Optional[int]:
    """Decide whether the dense tier pays for this (sub)graph.

    Returns the per-block edge threshold to use, or None when the cost model
    says the pure hybrid path is within ``min_gain`` of the tiered one (the
    tier's ~30-200x adjacency-byte inflation is not worth a marginal win).
    """
    plan = plan_block_tier_rb(rowptr, col, num_cols_pad, x_itemsize,
                              a_itemsize, d_hint, min_gain,
                              rb_candidates=(B,))
    return None if plan is None else plan[0]


def plan_block_tier_rb(
    rowptr: np.ndarray,
    col: np.ndarray,
    num_cols_pad: int,
    x_itemsize: int = 4,
    a_itemsize: Optional[int] = None,
    d_hint: int = 256,
    min_gain: float = 0.08,
    rb_candidates: Tuple[int, ...] = (128, 256, 512),
) -> Optional[Tuple[int, int]]:
    """Like :func:`plan_block_tier` but also chooses the row-tile height:
    returns ``(thresh, rb_rows)`` for the cheapest candidate, or None.

    Tall tiles amortize the [128, D] x-tile DMA over ``rb`` rows — at the
    reddit shape the partition locality keeps ~83% of edges dense at every
    height while the modeled tile DMA drops 13.6 -> 10.2 -> 9.0 ms for
    128/256/512 rows (r5 analysis; the 0.75x-roofline lever of VERDICT r4
    item 3)."""
    r = int(rowptr.shape[0] - 1)
    if col.size == 0 or r == 0:
        return None
    a_itemsize = x_itemsize if a_itemsize is None else a_itemsize
    deg = np.diff(rowptr).astype(np.int64)
    row = np.repeat(np.arange(r, dtype=np.int64), deg)
    ncb = num_cols_pad // B
    c64 = col.astype(np.int64)
    tile_cap = int(os.environ.get("INCAGG_BLOCK_TILE_CAP", "150000"))
    best = None  # (tiered_ns, thresh, rb)
    base_ns = None
    for rb in rb_candidates:
        key = (row // rb) * ncb + c64 // B
        counts = np.unique(key, return_counts=True)[1]
        # marginal break-even, then verify globally (k/overflow interactions)
        thresh = marginal_thresh(x_itemsize, a_itemsize, d_hint, rb)
        # SMEM prefetch budget: the kernel scalar-prefetches one s32
        # block-col id per tile (bcols [LANES, steps]) plus one s32 per grid
        # step (brow_step) = ~5 B/tile of SMEM per pallas_call.  Past ~200K
        # tiles the scoped allocation exceeds the v5e's SMEM and compilation
        # fails (hit at the 234K-tile reddit-shape full graph); raise the
        # threshold until the densest `tile_cap` blocks remain — the ones
        # the tier is for — and let the rest ride the hybrid remainder.
        if int((counts >= thresh).sum()) > tile_cap:
            sc = np.sort(counts)
            thresh = max(thresh, int(sc[sc.size - tile_cap]) + 1)
        base, tiered, e_dense = _cost_ns(
            counts, int(col.size), thresh, deg, x_itemsize, a_itemsize,
            d_hint, rb)
        base_ns = base
        if e_dense == 0:
            continue
        if best is None or tiered < best[0]:
            best = (tiered, thresh, rb)
    if best is None or best[0] > base_ns * (1.0 - min_gain):
        return None
    return best[1], best[2]


def measure_block_tier(
    rowptr: np.ndarray,
    col: np.ndarray,
    num_rows_pad: int,
    num_cols_pad: int,
    thresh: int,
    rb_rows: int = B,
) -> Tuple[int, np.ndarray]:
    """Pre-pass for static bucket sizing: (padded tile total that
    :func:`build_block_hybrid` will produce, remainder row degrees)."""
    r = int(rowptr.shape[0] - 1)
    nrb = -(-num_rows_pad // rb_rows)
    ncb = num_cols_pad // B
    deg = np.diff(rowptr).astype(np.int64)
    if col.size == 0:
        return nrb * LANES, deg  # one padded filler run per row-block

    from incagg_gnn_tpu.utils.native import get_native_lib

    lib = get_native_lib()
    if lib is not None:
        _, ndense, rem_deg = lib.blocks_count(rowptr, col, ncb, thresh,
                                              rb_rows=rb_rows)
        runs = np.zeros(nrb, dtype=np.int64)
        runs[: ndense.shape[0]] = ndense
    else:
        rem_deg = deg.copy()
        row = np.repeat(np.arange(r, dtype=np.int64), deg)
        key = (row // rb_rows) * ncb + col.astype(np.int64) // B
        uniq, inv, counts = np.unique(key, return_inverse=True,
                                      return_counts=True)
        dense_blk = counts >= thresh
        e_dense = dense_blk[inv]
        drb = (uniq[dense_blk] // ncb).astype(np.int64)
        runs = np.bincount(drb, minlength=nrb)
        if e_dense.any():
            rem_deg -= np.bincount(row[e_dense], minlength=r)
    runs_pad = ((np.maximum(runs, 1) + LANES - 1) // LANES) * LANES
    return int(runs_pad.sum()), rem_deg


def build_block_hybrid(
    rowptr: np.ndarray,
    col: np.ndarray,
    value: Optional[np.ndarray],
    num_rows_pad: int,
    num_cols_pad: int,
    thresh: int,
    a_dtype=np.float32,
    k: Optional[int] = None,
    ovf_pad: Optional[int] = None,
    nb_pad: Optional[int] = None,
    trash_col: Optional[int] = None,
    ovf_inc: Optional[bool] = False,
    bucket_ext: Optional[bool] = None,
    bucket_kink: bool = True,
    rb_rows: int = B,
) -> BlockHybridAdj:
    """Host-side conversion CSR -> dense tiles + hybrid remainder.

    ``nb_pad`` (total padded tile count, multiple of LANES) lets a loader
    keep static shapes across batches; extra tiles are appended as zero
    fillers on the last row-block.

    ``rb_rows``: row-tile height (tiles are [rb_rows, 128]).  Tall tiles
    amortize the x-tile DMA (plan_block_tier_rb chooses); the dense-tier
    output covers ``ceil(num_rows_pad / rb_rows) * rb_rows`` rows and
    :func:`_dense_call` slices back to ``num_rows_pad``.
    """
    assert num_rows_pad % B == 0 and num_cols_pad % B == 0
    r = int(rowptr.shape[0] - 1)
    nrb = -(-num_rows_pad // rb_rows)
    ncb = num_cols_pad // B
    deg = np.diff(rowptr).astype(np.int64)

    from incagg_gnn_tpu.utils.native import get_native_lib

    lib = get_native_lib()
    if lib is not None and col.size:
        # C++ two-phase build: count -> padded layout -> fill in place
        # (the numpy path's unique+fancy-scatter took ~50 s at reddit scale)
        _, ndense, rem_deg = lib.blocks_count(rowptr, col, ncb, thresh,
                                              rb_rows=rb_rows)
        runs = np.zeros(nrb, dtype=np.int64)
        runs[: ndense.shape[0]] = ndense
        runs_pad = ((np.maximum(runs, 1) + LANES - 1) // LANES) * LANES
        total = int(runs_pad.sum())
        if nb_pad is not None:
            assert nb_pad >= total and nb_pad % LANES == 0, (nb_pad, total)
        else:
            nb_pad = total
        starts_pad = np.concatenate([[0], np.cumsum(runs_pad)])[:-1]

        a = np.zeros((nb_pad, rb_rows, B), dtype=a_dtype)
        bcol_flat = np.zeros(nb_pad, dtype=np.int32)
        brow_flat = np.full(nb_pad, nrb - 1, dtype=np.int32)
        brow_flat[:total] = np.repeat(np.arange(nrb, dtype=np.int32), runs_pad)

        rp = np.zeros(num_rows_pad + 1, dtype=np.int64)
        rp[1 : r + 1] = np.cumsum(rem_deg)
        rp[r + 1 :] = rp[r]
        nrem = int(rp[r])
        r_col = np.empty(max(nrem, 1), dtype=np.int32)
        r_val = np.empty(max(nrem, 1), dtype=np.float32)
        lib.blocks_fill(rowptr, col, value, ncb, thresh, starts_pad, rp,
                        a, bcol_flat, r_col, r_val, rb_rows=rb_rows)
        r_col, r_val = r_col[:nrem], r_val[:nrem]
    else:
        row = np.repeat(np.arange(r, dtype=np.int64), deg)
        c64 = col.astype(np.int64)
        val = value if value is not None else np.ones(col.size, np.float32)

        key = (row // rb_rows) * ncb + c64 // B
        uniq, inv, counts = np.unique(key, return_inverse=True,
                                      return_counts=True)
        dense_blk = counts >= thresh
        e_dense = dense_blk[inv]

        dkeys = uniq[dense_blk]
        drb = (dkeys // ncb).astype(np.int64)
        dcb = (dkeys % ncb).astype(np.int32)
        nb = int(dkeys.size)

        # padded layout: per row-block runs, >=1 tile, rounded up to LANES
        runs = np.bincount(drb, minlength=nrb)
        runs_pad = np.maximum(runs, 1)
        runs_pad = ((runs_pad + LANES - 1) // LANES) * LANES
        total = int(runs_pad.sum())
        if nb_pad is not None:
            assert nb_pad >= total and nb_pad % LANES == 0, (nb_pad, total)
        else:
            nb_pad = total

        starts_pad = np.concatenate([[0], np.cumsum(runs_pad)])[:-1]
        starts_real = np.concatenate([[0], np.cumsum(runs)])[:-1]
        # position of each dense tile in the padded layout
        tile_pos = starts_pad[drb] + (np.arange(nb) - starts_real[drb])

        a = np.zeros((nb_pad, rb_rows, B), dtype=a_dtype)
        bcol_flat = np.zeros(nb_pad, dtype=np.int32)
        bcol_flat[tile_pos] = dcb
        brow_flat = np.full(nb_pad, nrb - 1, dtype=np.int32)  # trailing fillers
        brow_flat[:total] = np.repeat(np.arange(nrb, dtype=np.int32), runs_pad)

        if nb:
            t = np.searchsorted(dkeys, key[e_dense])
            p = tile_pos[t]
            # add (not assign): duplicate (row,col) entries must SUM, as the
            # ELL/COO paths do (each duplicate gets its own slot there)
            acc = a if a.dtype == np.float32 else np.zeros_like(a, np.float32)
            np.add.at(acc, (p, row[e_dense] % rb_rows, c64[e_dense] % B),
                      val[e_dense])
            if acc is not a:
                a[...] = acc

        # remainder CSR
        r_row = row[~e_dense]
        r_col = col[~e_dense].astype(np.int32)
        r_val = val[~e_dense].astype(np.float32)
        rp = np.zeros(num_rows_pad + 1, dtype=np.int64)
        np.add.at(rp, r_row + 1, 1)
        rp = np.cumsum(rp)

    s = nb_pad // LANES
    brow_step = brow_flat[::LANES].copy()
    bcols = bcol_flat.reshape(s, LANES).T.copy()
    # r4 measured: the overflow-incidence path wins in TRAIN programs
    # (XLA's in-context scatter costs ~19 ns/edge there vs ~10 in fwd-only
    # programs, docs/RESULTS.md) — fwd/refresh builds default to the
    # scatter; the bi builder opts its two directions in.
    rem = build_hybrid_adj(rp, r_col, r_val, num_rows_pad, num_cols_pad,
                           k=k, ovf_pad=ovf_pad, trash_col=trash_col,
                           ovf_inc=ovf_inc, bucket_ext=bucket_ext,
                           bucket_kink=bucket_kink)

    deg_full = np.zeros(num_rows_pad, dtype=np.float32)
    deg_full[:r] = deg
    return BlockHybridAdj(
        dense=BlockDense(a=jnp.asarray(a), brow_step=jnp.asarray(brow_step),
                         bcols=jnp.asarray(bcols)),
        rem=rem,
        deg=jnp.asarray(deg_full),
    )


def _dense_reference(dense, x: jnp.ndarray,
                     num_rows: int) -> jnp.ndarray:
    """Pure-XLA equivalent of the Pallas kernel (block gather + batched
    matmul + sorted block segment-sum).  Used on non-TPU backends: it is
    semantically identical, and unlike interpret-mode Pallas it composes
    with shard_map/vmap/GSPMD on CPU test meshes.  (On TPU it measures
    0.38-1.02x of hybrid — docs/RESULTS.md — hence the kernel.)"""
    lanes = int(dense.bcols.shape[0])
    rb = int(dense.a.shape[1])  # row-tile height (tall tiles: rb > B)
    d = x.shape[1]
    s = dense.brow_step.shape[0]
    bcol_flat = dense.bcols.T.reshape(-1)  # [NB] tile -> col block
    brow_flat = jnp.repeat(dense.brow_step, lanes)  # [NB] tile -> row block
    xt = x.reshape(-1, B, d)
    g = jnp.take(xt, bcol_flat, axis=0)  # [NB, B, d]
    # f32 tiles must multiply at f32 (3-pass) — the TPU default single
    # bf16 pass costs ~3e-3 relative error, which the f32 tier (and the
    # overflow-incidence path replacing an exact segment-sum) must not pay;
    # bf16 tiles keep the fast default (that IS their precision budget)
    prec = (jax.lax.Precision.HIGHEST
            if dense.a.dtype == jnp.float32 else None)
    prod = jnp.einsum("nij,njd->nid", dense.a.astype(jnp.float32),
                      g.astype(jnp.float32),
                      preferred_element_type=jnp.float32, precision=prec)
    nrb = -(-num_rows // rb)
    out = jax.ops.segment_sum(prod, brow_flat, num_segments=nrb,
                              indices_are_sorted=True)
    return out.reshape(nrb * rb, d)[:num_rows]


def _dense_call(dense, x: jnp.ndarray, num_rows: int):
    """Dense-tile aggregation.  ``dense`` is any structure with fields
    ``a [NB, B, B]``, ``brow_step [S]``, ``bcols [lanes, S]`` (BlockDense or
    ops.ell.OvfIncidence); the lane count comes from ``bcols``."""
    lanes = int(dense.bcols.shape[0])
    if jax.default_backend() != "tpu":
        # uniform dtype policy as the kernel below (tile-precision compute)
        if x.dtype != dense.a.dtype:
            x = x.astype(dense.a.dtype)
        return _dense_reference(dense, x, num_rows)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = dense.brow_step.shape[0]
    d = x.shape[1]
    rb = int(dense.a.shape[1])  # row-tile height ([rb, 128] tall tiles
    # amortize the x DMA over rb rows; plan_block_tier_rb chooses)
    rows_dense = -(-num_rows // rb) * rb

    # f32 tiles: full f32 multiply (see _dense_reference note)
    prec = (jax.lax.Precision.HIGHEST
            if dense.a.dtype == jnp.float32 else None)

    def kernel(brow_ref, bcols_ref, a_ref, *refs):
        *xs, o_ref = refs
        i = pl.program_id(0)
        prev = brow_ref[jnp.maximum(i - 1, 0)]
        first = jnp.logical_or(i == 0, brow_ref[i] != prev)
        acc = jnp.dot(a_ref[0], xs[0][...],
                      preferred_element_type=jnp.float32, precision=prec)
        for j in range(1, lanes):
            acc += jnp.dot(a_ref[j], xs[j][...],
                           preferred_element_type=jnp.float32,
                           precision=prec)

        @pl.when(first)
        def _():
            o_ref[...] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            o_ref[...] += acc

    def make_xspec(j):
        return pl.BlockSpec((B, d), lambda i, br, bc, j=j: (bc[j, i], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s,),
        in_specs=[pl.BlockSpec((lanes, rb, B), lambda i, br, bc: (i, 0, 0))]
                 + [make_xspec(j) for j in range(lanes)],
        out_specs=pl.BlockSpec((rb, d), lambda i, br, bc: (br[i], 0)),
    )
    call = pl.pallas_call(
        kernel,
        # under shard_map the output varies over the same mesh axes as x
        # (per-device kernel); vma must be declared or check_vma rejects it
        out_shape=jax.ShapeDtypeStruct(
            (rows_dense, d), jnp.float32,
            vma=getattr(jax.typeof(x), "vma", None) or frozenset()),
        grid_spec=grid_spec,
    )
    # uniform dtypes through the MXU, at the TILE precision: the tile dtype
    # encodes the configured cache-precision budget (bf16 tiles under f32
    # activations run the dense tier in bf16 — same error class as bf16
    # caches; accumulation stays f32 via preferred_element_type)
    if x.dtype != dense.a.dtype:
        x = x.astype(dense.a.dtype)
    out = call(dense.brow_step, dense.bcols, dense.a, *([x] * lanes))
    return out[:num_rows] if rows_dense != num_rows else out


def spmm_block(adj: BlockHybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Weighted-sum aggregation: dense MXU tier + hybrid remainder."""
    out = _dense_call(adj.dense, x, adj.rem.num_rows).astype(x.dtype)
    return out + spmm_hybrid(adj.rem, x)


def spmm_block_mean(adj: BlockHybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    return spmm_block(adj, x) / jnp.maximum(adj.deg, 1.0)[:, None]


# ---------------------------------------------------------------------------
# Bidirectional tier: training forward + transpose backward on the MXU.
#
# XLA's autodiff of the Pallas kernel is unavailable (no VJP rule) and its
# autodiff of the _dense_reference gather would scatter-add; instead dx =
# A^T @ g is computed as *another* block-tier aggregation over the
# host-precomputed transpose — the same design as BiHybridAdj (ops/ell.py).
# Block (i, j) of A holds exactly the edges of block (j, i) of A^T, so
# building the transpose with the SAME per-block edge threshold densifies
# exactly the transposed tiles and the remainders are mutual transposes:
# the VJP is exact.
# ---------------------------------------------------------------------------


class BiBlockHybridAdj(NamedTuple):
    """Forward + transposed block-hybrid pair — the MXU training format.

    Reference counterpart: none (the reference's training SpMM backward is
    torch autograd over cuSPARSE).  Drop-in for ``BiHybridAdj`` in sum/mean
    aggregations (ops/agg.py dispatch)."""

    fwd: BlockHybridAdj  # [R x C]
    bwd: BlockHybridAdj  # [C x R]

    @property
    def num_rows(self) -> int:
        return self.fwd.num_rows

    @property
    def deg(self) -> jnp.ndarray:
        return self.fwd.deg

    def binarized(self) -> "BiBlockHybridAdj":
        return BiBlockHybridAdj(self.fwd.binarized(), self.bwd.binarized())

    def mask_in_batch(self, batch_size) -> "BiBlockHybridAdj":
        """IB-only ablation (reference gcn.py:117-141): forward drops edges
        whose SOURCE (column) id >= batch_size; the transpose drops the same
        edges, which live in its ROWS >= batch_size.  Degrees recomputed from
        the surviving dense + remainder entries.

        Caveat: the recomputed dense degree counts nonzero CELLS, so it is
        exact only for coalesced input (the production pipeline coalesces;
        duplicate (row,col) entries summed into one tile cell — or cancelling
        to zero — are undercounted vs the hybrid path's per-slot count).  The
        trainer routes aggregate_combined=False runs to hybrid/COO."""
        # the bwd row-masking below assumes square tiles (tile row id =
        # brow * B + in-tile row); tall-tile pairs never reach this path —
        # the trainer routes IB ablations to hybrid/COO
        assert self.fwd.dense.a.shape[1] == B, "mask_in_batch needs rb=128"
        assert self.bwd.dense.a.shape[1] == B, "mask_in_batch needs rb=128"
        col_of = jnp.arange(B, dtype=jnp.int32)
        # fwd: mask tile columns by global col id
        f = self.fwd
        bcol_flat = f.dense.bcols.T.reshape(-1)  # [NB] tile -> col block
        keep_f = (bcol_flat[:, None] * B + col_of[None, :]) < batch_size
        a_f = jnp.where(keep_f[:, None, :], f.dense.a, 0)
        rem_f = f.rem.mask_in_batch(batch_size)
        deg = rem_f.deg + _dense_row_counts(
            f.dense._replace(a=a_f), f.num_rows)
        fwd = f._replace(dense=f.dense._replace(a=a_f), rem=rem_f, deg=deg)
        # bwd: mask tile rows by global row id
        bw = self.bwd
        brow_flat = jnp.repeat(bw.dense.brow_step,
                               bw.dense.bcols.shape[0])  # [NB]
        keep_b = (brow_flat[:, None] * B + col_of[None, :]) < batch_size
        a_b = jnp.where(keep_b[:, :, None], bw.dense.a, 0)
        bwd = bw._replace(dense=bw.dense._replace(a=a_b),
                          rem=bw.rem.mask_rows(batch_size))
        return BiBlockHybridAdj(fwd, bwd)


def _dense_row_counts(dense: BlockDense, num_rows: int) -> jnp.ndarray:
    """True (nonzero) entry count per row of the dense tier."""
    rb = int(dense.a.shape[1])
    counts = (dense.a != 0).sum(axis=2).astype(jnp.float32)  # [NB, rb]
    brow_flat = jnp.repeat(dense.brow_step, dense.bcols.shape[0])
    nrb = -(-num_rows // rb)
    per_block = jax.ops.segment_sum(
        counts, brow_flat, num_segments=nrb, indices_are_sorted=True)
    return per_block.reshape(nrb * rb)[:num_rows]


@jax.custom_vjp
def _spmm_block_bi(fwd: BlockHybridAdj, bwd: BlockHybridAdj,
                   x: jnp.ndarray) -> jnp.ndarray:
    return spmm_block(fwd, x)


def _spmm_block_bi_fw(fwd, bwd, x):
    return spmm_block(fwd, x), (fwd, bwd)


def _spmm_block_bi_bw(res, g):
    fwd, bwd = res
    # keep the cotangent in its own dtype (bf16 when the tier is bf16): the
    # f32 upcast doubled the backward remainder's gather bytes and pushed it
    # over the row-chunk budget into a 2-chunk lax.map (r4 trace,
    # docs/RESULTS.md "train-step backward chain") — same policy as the
    # hybrid bi backward (ops/ell.py _spmm_sum_bi_bw)
    dx = spmm_block(bwd, g)
    return (
        jax.tree.map(_zero_cotangent, fwd),
        jax.tree.map(_zero_cotangent, bwd),
        dx,
    )


_spmm_block_bi.defvjp(_spmm_block_bi_fw, _spmm_block_bi_bw)


def spmm_block_bi(adj: BiBlockHybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Weighted-sum aggregation, MXU tier forward AND backward."""
    return _spmm_block_bi(adj.fwd, adj.bwd, x)


def spmm_block_bi_mean(adj: BiBlockHybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    return spmm_block_bi(adj, x) / jnp.maximum(adj.fwd.deg, 1.0)[:, None]


def transpose_csr_host(rowptr: np.ndarray, col: np.ndarray,
                       value: Optional[np.ndarray], num_cols: int):
    """Host CSR transpose (C++ counting sort when available)."""
    from incagg_gnn_tpu.utils.native import get_native_lib

    lib = get_native_lib()
    if lib is not None and col.size:
        return lib.transpose_csr(rowptr, col, value, num_cols)
    r = int(rowptr.shape[0] - 1)
    deg = np.diff(rowptr)
    rows = np.repeat(np.arange(r, dtype=np.int64), deg)
    order = np.argsort(col, kind="stable")
    t_rowptr = np.zeros(num_cols + 1, dtype=np.int64)
    np.add.at(t_rowptr, col.astype(np.int64) + 1, 1)
    t_rowptr = np.cumsum(t_rowptr)
    t_col = rows[order].astype(np.int32)
    t_val = value[order].astype(np.float32) if value is not None else None
    return t_rowptr, t_col, t_val


def build_bi_block_hybrid(
    rowptr: np.ndarray,
    col: np.ndarray,
    value: Optional[np.ndarray],
    num_rows_pad: int,
    num_cols_pad: int,
    thresh: int,
    a_dtype=np.float32,
    k: Optional[int] = None,
    k_t: Optional[int] = None,
    ovf_pad: Optional[int] = None,
    ovf_pad_t: Optional[int] = None,
    nb_pad: Optional[int] = None,
    nb_pad_t: Optional[int] = None,
    transpose: Optional[tuple] = None,
    rb_rows: int = B,
    rb_rows_t: Optional[int] = None,
) -> BiBlockHybridAdj:
    """Build the forward block-hybrid and its exact transpose.

    ``transpose`` optionally supplies a precomputed host
    ``(t_rowptr, t_col, t_val)`` (the loader measures the transpose for
    bucket sizing and passes it through to avoid a second transpose)."""
    # bi remainders size WITHOUT the overflow-locality kink (choose_k):
    # the chained fwd+bwd keeps the gather working set hot, so large
    # overflows stay cheap and extra ELL slots are pure cost (measured:
    # products bi k=8 131M vs k=16 105M e/s).  One-off builds (no static
    # pads) leave k=None so build_hybrid_adj's bucketed-ELL level
    # optimizer (choose_k_levels) can size the remainder instead.
    one_off = ovf_pad is None and ovf_pad_t is None
    rb_t = rb_rows if rb_rows_t is None else rb_rows_t
    if k is None and not one_off:
        _, rem_deg = measure_block_tier(rowptr, col, num_rows_pad,
                                        num_cols_pad, thresh,
                                        rb_rows=rb_rows)
        k = choose_k(rem_deg, locality_kink=False)
    if transpose is None:
        transpose = transpose_csr_host(rowptr, col, value, num_cols_pad)
    t_rowptr, t_col, t_val = transpose
    if k_t is None and not one_off:
        _, rem_deg_t = measure_block_tier(t_rowptr, t_col, num_cols_pad,
                                          num_rows_pad, thresh,
                                          rb_rows=rb_t)
        k_t = choose_k(rem_deg_t, locality_kink=False)
    fwd = build_block_hybrid(rowptr, col, value, num_rows_pad, num_cols_pad,
                             thresh, a_dtype=a_dtype, k=k, ovf_pad=ovf_pad,
                             nb_pad=nb_pad,
                             ovf_inc=None if ovf_pad is None else False,
                             bucket_kink=False, rb_rows=rb_rows)
    bwd = build_block_hybrid(t_rowptr, t_col, t_val, num_cols_pad,
                             num_rows_pad, thresh, a_dtype=a_dtype, k=k_t,
                             ovf_pad=ovf_pad_t, nb_pad=nb_pad_t,
                             ovf_inc=None if ovf_pad_t is None else False,
                             bucket_kink=False, rb_rows=rb_t)
    return BiBlockHybridAdj(fwd=fwd, bwd=bwd)
