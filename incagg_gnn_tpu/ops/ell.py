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

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class OvfIncidence(NamedTuple):
    """Scatter-free overflow: the sorted-COO segment-sum recast as a
    binary-incidence block matmul on the MXU (round 4).

    The overflow's ``out[r] += val_e * x[col_e]`` is ``out += S @ V`` where
    ``V[e] = val_e * x[col_e]`` (a gather, fast class via ops/gatherpad) and
    ``S`` is the [R_pad x E_pad] 0/1 row-incidence.  Because overflow edges
    are sorted by row, consecutive 128-edge chunks touch only a handful of
    rows: padding each 128-row block's edges to whole chunks makes every
    ``S`` tile live in one row block, which is exactly the layout the
    block-tier Pallas kernel (ops/block._dense_call) consumes — ``bcols``
    is the identity (chunk j reads V block j).  Measured v5e: the XLA
    scatter-add costs ~17-19 ns/edge with no fast size class (probed
    500K-850K); this path costs the V gather (~6-8 ns) + ~1 ns of matmul.

    Fields mirror ``BlockDense`` (duck-typed into ``_dense_call``) plus the
    padded-slot edge arrays.  ``a`` is BINARY — per-edge values stay in
    ``vals2`` so :meth:`HybridAdj.binarized` / :meth:`mask_in_batch` remain
    cheap elementwise rewrites; ``with_scaled_values`` (per-slot rewrites in
    forward-ELL order, GAT only) drops the incidence instead."""

    a: jnp.ndarray  # [NC_pad, B, B] 0/1 tiles
    brow_step: jnp.ndarray  # [S] int32 output row-block per grid step
    bcols: jnp.ndarray  # [lanes, S] int32 V block per lane (identity layout)
    cols2: jnp.ndarray  # [NC_pad*B] int32 edge source; pad -> 0
    vals2: jnp.ndarray  # [NC_pad*B] float edge value; pad -> 0
    rows2: jnp.ndarray  # [NC_pad*B] int32 edge row; pad -> R_pad-1


class EllExt(NamedTuple):
    """One bucketed-ELL extension level (round 4).

    A single [R, K] ELL table pays K slots for EVERY row; at e.g. the reddit
    block remainder the degree histogram is a broad hump (deg 3..24+), so
    K=24 leaves 32% of the 5.6M gathered slots as padding while 341K edges
    still overflow to the ~20 ns/edge COO scatter.  Splitting the width into
    levels — a narrow base table over all rows plus extension tables over
    only the rows that spill past each boundary — gathers far fewer padded
    slots and shrinks the overflow, at the cost of one sorted [Ri, D]
    index-add per level.  Level widths are chosen by the same slot/COO cost
    model as ``choose_k`` (``choose_k_levels``).

    ``rows`` is sorted ascending; padding rows point at the trash row
    (R_pad-1) with zero vals, so the index-add contributes nothing there.
    """

    rows: jnp.ndarray  # [Ri_pad] int32 sorted; padding -> R_pad-1
    cols: jnp.ndarray  # [Ri_pad, Ki] int32; padding -> trash col
    vals: jnp.ndarray  # [Ri_pad, Ki] float; padding -> 0


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
    ovf_inc: Optional[OvfIncidence] = None  # big-overflow MXU path
    ext: Tuple["EllExt", ...] = ()  # bucketed-ELL extension levels

    @property
    def num_rows(self) -> int:
        return self.ell_cols.shape[0]

    def binarized(self) -> "HybridAdj":
        # preserves the values dtype: the global-column refresh pre-casts
        # values to the cache-table dtype so bf16 aggregations stay uniform
        # (mixed bf16 x / f32 vals is the measured 0.64x path, RESULTS.md)
        inc = self.ovf_inc
        if inc is not None:
            inc = inc._replace(vals2=(inc.vals2 != 0).astype(inc.vals2.dtype))
        return self._replace(
            ell_vals=(self.ell_vals != 0).astype(self.ell_vals.dtype),
            ovf_vals=(self.ovf_vals != 0).astype(self.ovf_vals.dtype),
            ovf_inc=inc,
            ext=tuple(e._replace(vals=(e.vals != 0).astype(e.vals.dtype))
                      for e in self.ext),
        )

    def cast_values(self, dtype) -> "HybridAdj":
        """Cast every value-carrying array (incl. the incidence tiles) —
        the single dtype-budget knob callers should use."""
        inc = self.ovf_inc
        if inc is not None:
            inc = inc._replace(a=inc.a.astype(dtype),
                               vals2=inc.vals2.astype(dtype))
        return self._replace(ell_vals=self.ell_vals.astype(dtype),
                             ovf_vals=self.ovf_vals.astype(dtype),
                             ovf_inc=inc,
                             ext=tuple(e._replace(vals=e.vals.astype(dtype))
                                       for e in self.ext))

    def with_scaled_values(self, keep_ell, keep_ovf):
        # per-slot value rewrite in forward layout (GAT attention): the
        # incidence's vals2 cannot be rewritten without a slot gather —
        # drop it; the scatter path is semantically identical
        assert not self.ext, "per-slot rewrites assume single-K ELL layout"
        return self._replace(ell_vals=keep_ell, ovf_vals=keep_ovf,
                             ovf_inc=None)

    def mask_in_batch(self, batch_size) -> "HybridAdj":
        """Keep only edges with in-batch sources (< batch_size) — the IB-only
        ablation (reference gcn.py:117-141); degrees recomputed."""
        keep_e = (self.ell_cols < batch_size) & (self.ell_vals != 0)
        keep_o = (self.ovf_cols < batch_size) & (self.ovf_vals != 0)
        deg = keep_e.sum(axis=1).astype(jnp.float32)
        if self.ovf_rows.shape[0] > 0:
            deg = deg + jax.ops.segment_sum(
                keep_o.astype(jnp.float32), self.ovf_rows,
                num_segments=self.num_rows, indices_are_sorted=True,
            )
        ext = []
        for e in self.ext:
            keep_x = (e.cols < batch_size) & (e.vals != 0)
            deg = deg.at[e.rows].add(
                keep_x.sum(axis=1).astype(jnp.float32),
                indices_are_sorted=True)
            ext.append(e._replace(vals=jnp.where(keep_x, e.vals, 0.0)))
        inc = self.ovf_inc
        if inc is not None:
            keep2 = inc.cols2 < batch_size
            inc = inc._replace(vals2=jnp.where(keep2, inc.vals2, 0.0))
        return self._replace(
            ell_vals=jnp.where(keep_e, self.ell_vals, 0.0),
            ovf_vals=jnp.where(keep_o, self.ovf_vals, 0.0),
            deg=deg,
            ovf_inc=inc,
            ext=tuple(ext),
        )

    def mask_rows(self, batch_size) -> "HybridAdj":
        """Zero every edge whose ROW id >= batch_size (the transpose-side
        IB mask used by the bi pairs' ``mask_in_batch``); ``deg`` is left
        untouched (the bi backward never reads the transpose's deg)."""
        row_keep = (jnp.arange(self.num_rows) < batch_size)[:, None]
        inc = self.ovf_inc
        if inc is not None:
            inc = inc._replace(
                vals2=jnp.where(inc.rows2 < batch_size, inc.vals2, 0.0))
        return self._replace(
            ell_vals=jnp.where(row_keep, self.ell_vals, 0.0),
            ovf_vals=jnp.where(
                jnp.take(row_keep[:, 0], self.ovf_rows), self.ovf_vals, 0.0),
            ovf_inc=inc,
            ext=tuple(e._replace(vals=jnp.where(
                (e.rows < batch_size)[:, None], e.vals, 0.0))
                for e in self.ext),
        )


#: see choose_k: extra per-edge slot-cost beyond ``coo_cost_ratio`` for
#: overflow edges past the locality knee
_OVF_LOCALITY_EXTRA = 7.0
_OVF_LOCALITY_EDGES = 200_000


def choose_k(degrees: np.ndarray, quantile: float = 0.98, align: int = 8,
             coo_cost_ratio: float = 3.0, locality_kink: bool = True) -> int:
    """ELL width minimizing the measured hybrid cost model.

    Every row pays ``k`` ELL slots (gather + reduce) whether real or padded;
    edges beyond ``k`` fall to the COO overflow whose per-edge cost is
    ~``coo_cost_ratio``x an ELL slot (v5e measurement, docs/RESULTS.md: ELL
    ~5.7 ns/slot vs sorted COO segment-sum ~17 ns/edge).  The old
    high-quantile heuristic over-padded: at avg degree ~15 it picked k=24
    (109M edges/s) where the cost-model optimum k=16 measures 126M (+16%).
    ``align=8`` is mandatory for performance, not just neatness — unaligned
    K collapses throughput (measured k18 < k8).  ``quantile`` caps the
    search (compat; rarely binds)."""
    if degrees.size == 0:
        return align
    # single pass: everything (quantile, overflow curve) from the histogram
    hist = np.bincount(degrees)
    nz = int(degrees.size - hist[0])
    if nz == 0:
        return align
    cum_pos = np.cumsum(hist[1:])  # positive-degree rows with deg <= j+1
    qv = int(np.searchsorted(cum_pos, quantile * nz) + 1)
    dmax = len(hist) - 1
    kmax = min(qv * 4 + align, dmax)
    kmax = ((kmax + align - 1) // align) * align
    hist = np.concatenate([hist, np.zeros(max(0, kmax + 2 - len(hist)), hist.dtype)])
    # ovf(k) = Σ_d max(d-k,0)·hist[d] = Σ_{j>=k} #{deg > j}, via suffix sums
    gt = nz - np.cumsum(hist[1:])  # gt[j] = #rows with degree > j+1
    gt = np.concatenate([[nz], gt])  # now gt[j] = #rows with degree > j
    ovf = np.concatenate([np.cumsum(gt[::-1])[::-1], [0]])
    cands = np.arange(align, kmax + 1, align, dtype=np.int64)
    # Two-regime overflow cost for FORWARD aggregations: ~3x an ELL slot
    # while the overflow working set stays cache/locality-friendly, rising
    # toward ~10x once it does not (measured at the reddit block
    # remainder: 855K ovf edges cost ~55-70 ns/edge vs the 17 ns
    # small-overflow measurement — widening K 16->24 bought +20% e2e).
    # ``locality_kink=False`` for the BI (train fwd+bwd) chains: measured
    # the OPPOSITE there (products bi k=8: 131M vs k=16: 105M e/s — the
    # chained VJP keeps the gather working set hot, so overflow stays
    # cheap and extra ELL slots are pure cost).
    # scripts/probes/_block_tune_probe.py, /tmp probes; docs/RESULTS.md r3.
    oc = ovf[cands].astype(np.float64)
    extra = (_OVF_LOCALITY_EXTRA if locality_kink else 0.0)
    cost = (degrees.size * cands + coo_cost_ratio * oc
            + extra * np.maximum(0.0, oc - _OVF_LOCALITY_EDGES))
    return int(cands[int(np.argmin(cost))])


#: estimated cost of one extension-level row in ELL-slot units (the sorted
#: [Ri, D] index-add the level pays on top of its Ki gathered slots)
_EXT_ROW_COST = 3.0
#: fixed per-level cost in slot units (extra fusion dispatch + pad waste)
_EXT_LEVEL_COST = 32768.0


def choose_k_levels(degrees: np.ndarray, align: int = 8,
                    coo_cost_ratio: float = 3.0,
                    locality_kink: bool = True,
                    max_levels: int = 3,
                    max_k: int = 96) -> Tuple[int, Tuple[int, ...]]:
    """Bucketed-ELL widths minimizing the slot/COO cost model.

    Returns ``(k0, ext_widths)``: a base width every row pays plus up to
    ``max_levels`` extension widths paid only by rows whose degree exceeds
    the running boundary (see :class:`EllExt`).  Each extension level costs
    its slots plus ``_EXT_ROW_COST`` per live row (the index-add) plus a
    fixed dispatch term; overflow beyond the last boundary costs the
    ``choose_k`` COO model.  Brute-force over aligned widths — the search
    space is tiny and the histogram suffix sums make each candidate O(1).
    """
    if degrees.size == 0:
        return align, ()
    hist = np.bincount(degrees.astype(np.int64))
    dmax = len(hist) - 1
    kcap = min(max_k, ((dmax + align - 1) // align) * align)
    if kcap < align:
        return align, ()
    # gt[b] = #rows with degree > b ; ovf(b) = sum max(deg-b, 0) = suffix sum
    nz = int(degrees.size - hist[0])
    gt = np.concatenate([[nz], nz - np.cumsum(hist[1:])])
    gt = np.concatenate([gt, np.zeros(max(0, kcap + 2 - len(gt)), gt.dtype)])
    ovf = np.concatenate([np.cumsum(gt[::-1])[::-1], [0]])

    def ovf_cost(b):
        o = float(ovf[min(b, len(ovf) - 1)])
        extra = (_OVF_LOCALITY_EXTRA if locality_kink else 0.0)
        return coo_cost_ratio * o + extra * max(0.0, o - _OVF_LOCALITY_EDGES)

    cands = list(range(align, kcap + 1, align))
    r = float(degrees.size)
    best_c = [None]
    best_pick = [None]

    def rows_gt(b):
        return float(gt[min(b, len(gt) - 1)])

    def search(boundary, acc, widths, depth):
        c = acc + ovf_cost(boundary)
        if best_c[0] is None or c < best_c[0]:
            best_c[0] = c
            best_pick[0] = tuple(widths)
        if depth >= max_levels or rows_gt(boundary) <= 0:
            return
        for ki in cands:
            ri = rows_gt(boundary)
            search(boundary + ki,
                   acc + ri * ki + _EXT_ROW_COST * ri + _EXT_LEVEL_COST,
                   widths + [ki], depth + 1)

    for k0 in cands:
        search(k0, r * k0, [k0], 0)
    picked = best_pick[0]
    return int(picked[0]), tuple(int(k) for k in picked[1:])


def ell_buckets(degree_arrays, k: int = 8, ovf: int = 8,
                coo_cost_ratio: float = 3.0, locality_kink: bool = True):
    """Shared ELL/overflow bucket sizes covering every batch.

    ``degree_arrays`` is an iterable of per-row degree vectors (one per
    batch, forward or transpose direction).  Grows the current ``(k, ovf)``
    monotonically: first the cost-model ELL width ``k`` over all batches,
    then the overflow slot count against that *final* ``k``, rounded up to
    128 (floor 8).  This is the single sizing policy for the loader's
    incremental bucket growth and the sharded trainer's static stacks —
    previously three drifting copies of the same logic."""
    arrays = list(degree_arrays)
    for deg in arrays:
        k = max(k, choose_k(deg, coo_cost_ratio=coo_cost_ratio,
                            locality_kink=locality_kink))
    need = 0
    for deg in arrays:
        need = max(need, int(np.maximum(deg - k, 0).sum()))
    return k, max(ovf, 8, -(-need // 128) * 128)


#: row count below which bucketed-ELL auto never engages (the extension
#: levels' extra dispatches outweigh slot savings on small graphs)
_BUCKET_MIN_ROWS = int(os.environ.get("INCAGG_BUCKET_MIN_ROWS", "32768"))


def _attach_ell_ext(base: HybridAdj, o: int, ext_widths, num_rows_pad: int,
                    trash_col: int, ovf_inc, ovf_inc_pad) -> HybridAdj:
    """Split the base build's (row-sorted) overflow into bucketed-ELL
    extension levels + a residual overflow (see :class:`EllExt`)."""
    orows = np.asarray(base.ovf_rows)[:o]
    ocols = np.asarray(base.ovf_cols)[:o]
    ovals = np.asarray(base.ovf_vals)[:o]
    # position of each overflow edge within its row's overflow run
    first = np.concatenate([[0], np.flatnonzero(np.diff(orows)) + 1]) \
        if o else np.zeros(0, np.int64)
    rows_u = orows[first] if o else np.zeros(0, np.int32)
    cnt = np.diff(np.append(first, o))
    pos = np.arange(o) - np.repeat(first, cnt)

    exts = []
    prev = 0
    for ki in ext_widths:
        live = rows_u[cnt > prev]
        ri = int(live.size)
        ri_pad = max(8, ((ri + 7) // 8) * 8)
        rows_i = np.full(ri_pad, num_rows_pad - 1, np.int32)
        rows_i[:ri] = live
        cols_i = np.full((ri_pad, ki), trash_col, np.int32)
        vals_i = np.zeros((ri_pad, ki), ovals.dtype)
        sel = (pos >= prev) & (pos < prev + ki)
        rank = np.searchsorted(live, orows[sel])
        cols_i[rank, pos[sel] - prev] = ocols[sel]
        vals_i[rank, pos[sel] - prev] = ovals[sel]
        exts.append(EllExt(rows=jnp.asarray(rows_i),
                           cols=jnp.asarray(cols_i),
                           vals=jnp.asarray(vals_i)))
        prev += ki

    sel = pos >= prev
    ro = int(sel.sum())
    opad = max(8, ((ro + 127) // 128) * 128)
    res_rows = np.full(opad, num_rows_pad - 1, np.int32)
    res_cols = np.full(opad, trash_col, np.int32)
    res_vals = np.zeros(opad, ovals.dtype)
    res_rows[:ro] = orows[sel]
    res_cols[:ro] = ocols[sel]
    res_vals[:ro] = ovals[sel]
    inc = None
    if ovf_inc is True or (ovf_inc is None and ro >= _OVF_INC_MIN):
        inc = build_ovf_incidence(res_rows, res_cols, res_vals, num_rows_pad,
                                  nc_pad=ovf_inc_pad)
    return base._replace(
        ovf_rows=jnp.asarray(res_rows),
        ovf_cols=jnp.asarray(res_cols),
        ovf_vals=jnp.asarray(res_vals),
        ovf_inc=inc,
        ext=tuple(exts),
    )


def build_hybrid_adj(
    rowptr: np.ndarray,
    col: np.ndarray,
    value: Optional[np.ndarray],
    num_rows_pad: int,
    num_cols_pad: int,
    k: Optional[int] = None,
    ovf_pad: Optional[int] = None,
    trash_col: Optional[int] = None,
    ovf_inc: Optional[bool] = None,
    ovf_inc_pad: Optional[int] = None,
    bucket_ext: Optional[bool] = None,
    bucket_kink: bool = True,
) -> HybridAdj:
    """Host-side conversion CSR -> hybrid ELL/COO with static shapes.

    ``ovf_inc``: build the scatter-free overflow-incidence structure
    (None = auto: only for one-off builds — ``ovf_pad is None`` — with an
    overflow slot count >= INCAGG_OVF_INC_MIN; loader-bucketed builds pass
    a static ``ovf_pad`` and must opt in with ``ovf_inc=True`` +
    ``ovf_inc_pad`` to keep pytree shapes stable across batches).

    ``bucket_ext``: build bucketed-ELL extension levels (:class:`EllExt`)
    when the ``choose_k_levels`` cost model prefers them (None = auto: only
    for one-off builds — ``ovf_pad is None``, ``k is None`` — above
    ``_BUCKET_MIN_ROWS`` rows; static loader builds keep single-K layouts).
    ``bucket_kink`` forwards the overflow-locality term (False for bi/train
    chains, like ``choose_k(locality_kink=)``)."""
    from incagg_gnn_tpu.utils.native import get_native_lib

    if ovf_inc is None and ovf_pad is not None:
        ovf_inc = False

    r = int(rowptr.shape[0] - 1)
    deg = np.diff(rowptr).astype(np.int64)
    if trash_col is None:
        trash_col = num_cols_pad - 1

    if bucket_ext is None:
        bucket_ext = (ovf_pad is None and k is None and r >= _BUCKET_MIN_ROWS
                      and col.size > 0)
    if bucket_ext and k is None:
        k0, ext_widths = choose_k_levels(deg, locality_kink=bucket_kink)
        if ext_widths:
            cap = int(np.maximum(deg - k0, 0).sum())
            base = build_hybrid_adj(
                rowptr, col, value, num_rows_pad, num_cols_pad, k=k0,
                ovf_pad=max(8, ((cap + 127) // 128) * 128),
                trash_col=trash_col, ovf_inc=False, bucket_ext=False)
            return _attach_ell_ext(base, cap, ext_widths, num_rows_pad,
                                   trash_col, ovf_inc, ovf_inc_pad)
        k = k0
    if k is None:
        k = choose_k(deg, locality_kink=bucket_kink)

    lib = get_native_lib()
    if lib is not None and col.shape[0] and r > 0:
        # C++ writes straight into the final padded device-layout buffers
        # (measured: the old pad-then-copy numpy assembly dominated collate)
        cap = int(np.maximum(deg - k, 0).sum())
        if ovf_pad is None:
            ovf_pad = max(8, ((cap + 127) // 128) * 128)
        assert cap <= ovf_pad, (cap, ovf_pad)
        res = lib.csr_to_ell(rowptr, col, value, k, trash_col, ovf_pad,
                             rows_alloc=num_rows_pad,
                             ovf_row_fill=num_rows_pad - 1)
        ell_cols, ell_vals, orows, ocols, ovals, o = res
        deg_full = np.zeros(num_rows_pad, dtype=np.float32)
        deg_full[:r] = deg
        inc = None
        if ovf_inc is True or (ovf_inc is None
                               and orows.shape[0] >= _OVF_INC_MIN):
            inc = build_ovf_incidence(orows, ocols, ovals, num_rows_pad,
                                      nc_pad=ovf_inc_pad)
        return HybridAdj(
            ell_cols=jnp.asarray(ell_cols),
            ell_vals=jnp.asarray(ell_vals),
            ovf_rows=jnp.asarray(orows),
            ovf_cols=jnp.asarray(ocols),
            ovf_vals=jnp.asarray(ovals),
            deg=jnp.asarray(deg_full),
            ovf_inc=inc,
        )
    else:
        ell_cols = np.full((num_rows_pad, k), trash_col, dtype=np.int32)
        ell_vals = np.zeros((num_rows_pad, k), dtype=np.float32)
        v = value if value is not None else np.ones(col.shape[0], dtype=np.float32)
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
    inc = None
    if ovf_inc is True or (ovf_inc is None
                           and orows.shape[0] >= _OVF_INC_MIN):
        inc = build_ovf_incidence(orows, ocols, ovals, num_rows_pad,
                                  nc_pad=ovf_inc_pad)
    return HybridAdj(
        ell_cols=jnp.asarray(ell_cols),
        ell_vals=jnp.asarray(ell_vals),
        ovf_rows=jnp.asarray(orows),
        ovf_cols=jnp.asarray(ocols),
        ovf_vals=jnp.asarray(ovals),
        deg=jnp.asarray(deg_full),
        ovf_inc=inc,
    )


import os

# XLA materializes the gathered [R, K, D] ELL tensor in HBM.  At small-graph
# scale that is the fastest formulation (docs/RESULTS.md), but at e.g. reddit
# scale (R=233K, K=53, D=602 f32 -> 31.6 GB) it OOMs the 16 GB chip.  Above
# this budget the ELL rows are processed in lax.map chunks (measured ~10%
# slower per RESULTS.md "lax.map row-block tiling" — only paid at shapes that
# could not run at all otherwise).
_ELL_BUDGET_BYTES = int(os.environ.get("INCAGG_ELL_BUDGET_MB", "2048")) << 20


def row_chunked(fn, r: int, bytes_per_row: int, *arrs):
    """Apply ``fn(*row_chunks) -> [rc, ...]`` over the leading (row) axis of
    every array in ``arrs``, in one shot when the materialized intermediate
    (``r * bytes_per_row``) fits the gather budget, else via ``lax.map`` over
    8-aligned row chunks.  Padding rows are zeros (col 0 / value 0): their
    products vanish and they are sliced off.  Shared by the ELL sum/max paths
    and the GAT attention gathers (models/gat.py)."""
    budget = max(_ELL_BUDGET_BYTES, 1)
    need = r * bytes_per_row
    if need <= budget:
        return fn(*arrs)
    n_chunks = -(-need // budget)
    rc = -(-r // n_chunks)
    rc = -(-rc // 8) * 8
    n_chunks = -(-r // rc)
    pad = n_chunks * rc - r
    padded = tuple(
        jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in arrs)
    stacked = tuple(
        a.reshape((n_chunks, rc) + a.shape[1:]) for a in padded)
    out = jax.lax.map(lambda t: fn(*t), stacked)
    return out.reshape((n_chunks * rc,) + out.shape[2:])[:r]


def _chunked_rows(per_chunk, ell_cols, ell_vals, x):
    """Apply ``per_chunk(cols[rc,k], vals[rc,k], rc) -> [rc, d]`` over all ELL
    rows, budgeted by the materialized [R,K,D] gather (see row_chunked)."""
    r, k = ell_cols.shape
    d = x.shape[1]
    return row_chunked(lambda c, v: per_chunk(c, v, c.shape[0]),
                       r, k * d * x.dtype.itemsize, ell_cols, ell_vals)


def _ell_padded_gather(x, cols, vals, rr, k, d):
    """Gather [rr*k] x-rows with the count padded into the gather emitter's
    fast class (ops/gatherpad).  The pad is a whole number of K-rows with
    zero vals, so callers reduce over K *first* and slice the few pad rows
    off the [rr_pad, D] result — the big [count, D] intermediate is
    consumed unsliced (a [count, D] slice measured 5.8 ms/direction at the
    reddit shape before this)."""
    from incagg_gnn_tpu.ops.gatherpad import fast_gather_len

    n = rr * k
    npad = fast_gather_len(n, int(x.shape[0]), d, x.dtype, multiple_of=k)
    flat = cols.reshape(-1)
    if npad > n:
        flat = jnp.concatenate(
            [flat, jnp.zeros((npad - n,), flat.dtype)])
        vals = jnp.concatenate(
            [vals, jnp.zeros((npad // k - rr, k), vals.dtype)])
    g = jnp.take(x, flat, axis=0).reshape(-1, k, d)
    return g, vals


def _ell_sum(ell_cols: jnp.ndarray, ell_vals: jnp.ndarray,
             x: jnp.ndarray) -> jnp.ndarray:
    """(x[ell_cols] * ell_vals).sum(axis=1), row-chunked under the budget."""
    k = ell_cols.shape[1]
    d = x.shape[1]

    def dense(cols, vals, rr):
        g, v = _ell_padded_gather(x, cols, vals, rr, k, d)
        return (g * v[..., None]).sum(axis=1)[:rr]

    return _chunked_rows(dense, ell_cols, ell_vals, x)


#: overflow edge count above which the incidence-matmul path is built by
#: default (below it the scatter's fixed ~17 ns/edge never adds up to the
#: incidence tiles' memory + build cost)
_OVF_INC_MIN = int(os.environ.get("INCAGG_OVF_INC_MIN", "131072"))
_OVF_INC_LANES = int(os.environ.get("INCAGG_OVF_INC_LANES", "4"))
_B = 128  # MXU tile edge (ops.block.B; kept literal to avoid the circular
# import — ops/block.py imports this module)


def build_ovf_incidence(ovf_rows: np.ndarray, ovf_cols: np.ndarray,
                        ovf_vals: np.ndarray, num_rows_pad: int,
                        lanes: int = None,
                        nc_pad: Optional[int] = None) -> OvfIncidence:
    """Host-side build of the scatter-free overflow structure (see
    :class:`OvfIncidence`).  ``ovf_rows`` must be sorted ascending (the
    hybrid build invariant); trailing padding rows (== num_rows_pad-1 with
    val 0) are fine — they land in the last row block like any edge.
    ``nc_pad`` fixes the padded chunk count for static loader buckets."""
    lanes = _OVF_INC_LANES if lanes is None else lanes
    o = int(ovf_rows.shape[0])
    nrb = num_rows_pad // _B
    rb = ovf_rows.astype(np.int64) // _B  # sorted
    counts = np.bincount(rb, minlength=nrb)
    # chunks per row block: >=1 (kernel output coverage), padded to lanes
    runs = np.maximum(-(-counts // _B), 1)
    runs_pad = ((runs + lanes - 1) // lanes) * lanes
    total = int(runs_pad.sum())
    if nc_pad is None:
        nc_pad = total
    else:
        assert nc_pad >= total and nc_pad % lanes == 0, (nc_pad, total)
    starts_pad = np.concatenate([[0], np.cumsum(runs_pad)])[:-1]
    brow_flat = np.full(nc_pad, nrb - 1, dtype=np.int32)
    brow_flat[:total] = np.repeat(np.arange(nrb, dtype=np.int32), runs_pad)

    # slot of each edge: chunk = rb's chunk range + within//B
    grp_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
    within = np.arange(o, dtype=np.int64) - grp_start[rb]
    chunk = starts_pad[rb] + within // _B
    pos = within % _B

    a = np.zeros((nc_pad, _B, _B), dtype=np.float32)
    # duplicate (chunk, r_local, pos) slots cannot occur (pos unique per
    # chunk), so plain assignment suffices
    a[chunk, ovf_rows.astype(np.int64) % _B, pos] = 1.0
    cols2 = np.zeros(nc_pad * _B, dtype=np.int32)
    vals2 = np.zeros(nc_pad * _B, dtype=np.float32)
    rows2 = np.full(nc_pad * _B, num_rows_pad - 1, dtype=np.int32)
    slot = chunk * _B + pos
    cols2[slot] = ovf_cols
    vals2[slot] = ovf_vals if ovf_vals is not None else 1.0
    rows2[slot] = ovf_rows
    s = nc_pad // lanes
    bcols = np.arange(nc_pad, dtype=np.int32).reshape(s, lanes).T.copy()
    return OvfIncidence(
        a=jnp.asarray(a),
        brow_step=jnp.asarray(brow_flat[::lanes].copy()),
        bcols=jnp.asarray(bcols),
        cols2=jnp.asarray(cols2),
        vals2=jnp.asarray(vals2),
        rows2=jnp.asarray(rows2),
    )


def _ovf_padded(adj: HybridAdj, x: jnp.ndarray):
    """Overflow triple with the edge count padded into the gather fast
    class: pad cols with trash index 0 / vals 0 / rows with the trash row
    (num_rows-1, keeps ``indices_are_sorted``) — zero contribution, and no
    [count, D] output slice is needed anywhere."""
    from incagg_gnn_tpu.ops.gatherpad import fast_gather_len

    n = int(adj.ovf_cols.shape[0])
    npad = fast_gather_len(n, int(x.shape[0]), int(x.shape[1]), x.dtype)
    cols, vals, rows = adj.ovf_cols, adj.ovf_vals, adj.ovf_rows
    if npad > n:
        pad = npad - n
        cols = jnp.concatenate([cols, jnp.zeros((pad,), cols.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
        rows = jnp.concatenate(
            [rows, jnp.full((pad,), adj.num_rows - 1, rows.dtype)])
    return cols, vals, rows


def spmm_hybrid(adj: HybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Weighted-sum aggregation, scatter-free on the ELL core."""
    out = _ell_sum(adj.ell_cols, adj.ell_vals, x)
    for e in adj.ext:
        # bucketed extension level: K_i more slots for the rows that spill
        # past the running boundary, added back via a sorted index-add
        # (padding rows all point at the trash row with zero vals)
        s = _ell_sum(e.cols, e.vals, x)
        out = out.at[e.rows].add(s, indices_are_sorted=True)
    if adj.ovf_inc is not None:
        from incagg_gnn_tpu.ops.block import _dense_call
        from incagg_gnn_tpu.ops.gatherpad import fast_gather_len

        inc = adj.ovf_inc
        n = int(inc.cols2.shape[0])
        cols2, vals2 = inc.cols2, inc.vals2
        npad = fast_gather_len(n, int(x.shape[0]), int(x.shape[1]), x.dtype,
                               multiple_of=_B)
        if npad > n:
            cols2 = jnp.concatenate(
                [cols2, jnp.zeros((npad - n,), cols2.dtype)])
            vals2 = jnp.concatenate(
                [vals2, jnp.zeros((npad - n,), vals2.dtype)])
        v = jnp.take(x, cols2, axis=0) * vals2[:, None]
        return out + _dense_call(inc, v, adj.num_rows).astype(x.dtype)
    if adj.ovf_rows.shape[0] > 0:
        cols, vals, rows = _ovf_padded(adj, x)
        go = jnp.take(x, cols, axis=0) * vals[:, None]
        out = out + jax.ops.segment_sum(
            go, rows, num_segments=adj.num_rows, indices_are_sorted=True
        )
    return out


class BiHybridAdj(NamedTuple):
    """Forward + transposed hybrid adjacency pair.

    XLA's autodiff of the ELL gather produces an unsorted scatter-add over
    R*K indices — measured 10x slower than the forward on v5e.  The custom
    VJP below instead computes ``dx = A^T @ g`` as *another* scatter-free
    hybrid aggregation over the host-precomputed transpose, so backward costs
    the same as forward.

    ``t2f`` (optional, built with ``with_perm=True``): for every transpose
    slot (flattened bwd ELL [C_pad*K_t] then bwd overflow), the flat position
    of the same edge in the forward layout (fwd ELL [R_pad*K] then fwd
    overflow); -1 on padding.  Lets a consumer move *per-edge values computed
    in forward layout* (attention coefficients, score gradients) onto the
    transpose with a static gather — the enabler for scatter-free attention
    backward (models/gat.py).
    """

    fwd: HybridAdj  # [R x C]
    bwd: HybridAdj  # [C x R]
    t2f: Optional[jnp.ndarray] = None  # [C_pad*K_t + O_t] int64, -1 = pad

    @property
    def num_rows(self) -> int:
        return self.fwd.num_rows

    @property
    def deg(self) -> jnp.ndarray:
        return self.fwd.deg

    def binarized(self) -> "BiHybridAdj":
        return BiHybridAdj(self.fwd.binarized(), self.bwd.binarized())

    def mask_in_batch(self, batch_size) -> "BiHybridAdj":
        """IB-only ablation on both directions: forward drops cols >= bs,
        the transpose drops the corresponding ROWS >= bs."""
        fwd = self.fwd.mask_in_batch(batch_size)
        bwd = self.bwd.mask_rows(batch_size)
        return BiHybridAdj(fwd, bwd, self.t2f)


@jax.custom_vjp
def _spmm_sum_bi(fwd: HybridAdj, bwd: HybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    return spmm_hybrid(fwd, x)


def _spmm_sum_bi_fw(fwd, bwd, x):
    return spmm_hybrid(fwd, x), (fwd, bwd)


def _zero_cotangent(t):
    # integer index arrays take float0 cotangents
    if jnp.issubdtype(t.dtype, jnp.inexact):
        return jnp.zeros_like(t)
    return np.zeros(t.shape, dtype=jax.dtypes.float0)


def _spmm_sum_bi_bw(res, g):
    fwd, bwd = res
    dx = spmm_hybrid(bwd, g)
    return (
        jax.tree.map(_zero_cotangent, fwd),
        jax.tree.map(_zero_cotangent, bwd),
        dx,
    )


_spmm_sum_bi.defvjp(_spmm_sum_bi_fw, _spmm_sum_bi_bw)


def spmm_bi(adj: BiHybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Weighted-sum aggregation with transpose-based backward."""
    return _spmm_sum_bi(adj.fwd, adj.bwd, x)


def spmm_bi_mean(adj: BiHybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Mean aggregation: out = (A @ x) / deg; backward divides the cotangent
    before the transposed aggregation (scale commutes through the sum)."""
    return spmm_bi(adj, x) / jnp.maximum(adj.fwd.deg, 1.0)[:, None]


def build_bi_hybrid_adj(
    rowptr: np.ndarray,
    col: np.ndarray,
    value: Optional[np.ndarray],
    num_rows_pad: int,
    num_cols_pad: int,
    k: Optional[int] = None,
    k_t: Optional[int] = None,
    ovf_pad: Optional[int] = None,
    ovf_pad_t: Optional[int] = None,
    with_perm: bool = False,
    bucket_ext: Optional[bool] = None,
) -> BiHybridAdj:
    """Build the forward hybrid and its transpose ([C x R], trash col at
    R_pad-1) from one local CSR block.  The transpose's ELL is built directly
    from the forward CSR in one C++ pass (csr_to_ell_t) — no intermediate
    transposed CSR is materialized (collate hot path).

    ``bucket_ext`` (None = auto for one-off builds, like
    ``build_hybrid_adj``): bucketed-ELL levels on BOTH directions, sized
    without the overflow-locality kink (bi chains keep the gather working
    set hot).  Incompatible with ``with_perm`` (t2f assumes single-K
    layouts); static-pad builds keep single-K."""
    from incagg_gnn_tpu.utils.native import get_native_lib

    if bucket_ext is None:
        bucket_ext = (k is None and k_t is None and ovf_pad is None
                      and ovf_pad_t is None and not with_perm
                      and rowptr.shape[0] - 1 >= _BUCKET_MIN_ROWS
                      and col.size > 0)
    if bucket_ext:
        fwd = build_hybrid_adj(rowptr, col, value, num_rows_pad,
                               num_cols_pad, bucket_ext=True,
                               bucket_kink=False)
        if fwd.ext:
            # transpose CSR on the host, then an independent bucketed build
            r = int(rowptr.shape[0] - 1)
            deg = np.diff(rowptr)
            rows = np.repeat(np.arange(r, dtype=np.int64), deg)
            order = np.lexsort((rows, col))
            t_cols = rows[order].astype(np.int32)
            t_vals = (value[order] if value is not None else None)
            t_deg = np.bincount(col.astype(np.int64),
                                minlength=num_cols_pad).astype(np.int64)
            t_rowptr = np.concatenate(([0], np.cumsum(t_deg)))
            bwd = build_hybrid_adj(
                t_rowptr, t_cols, t_vals, num_cols_pad, num_rows_pad,
                trash_col=num_rows_pad - 1, bucket_ext=True,
                bucket_kink=False)
            return BiHybridAdj(fwd=fwd, bwd=bwd)
        # level optimizer preferred single-K: keep that build
    else:
        fwd = build_hybrid_adj(rowptr, col, value, num_rows_pad,
                               num_cols_pad, k=k, ovf_pad=ovf_pad)
    k_fwd = int(fwd.ell_cols.shape[1])
    fwd_ovf_base = num_rows_pad * k_fwd
    r = int(rowptr.shape[0] - 1)
    lib = get_native_lib()
    if lib is not None and col.shape[0]:
        t_deg = np.bincount(col, minlength=num_cols_pad).astype(np.int64)
        if k_t is None:
            k_t = choose_k(t_deg)
        cap = int(np.maximum(t_deg - k_t, 0).sum())
        if ovf_pad_t is None:
            ovf_pad_t = max(8, ((cap + 127) // 128) * 128)
        assert cap <= ovf_pad_t, (cap, ovf_pad_t)
        res = lib.csr_to_ell_t(rowptr, col, value, num_cols_pad, k_t,
                               num_rows_pad - 1, ovf_pad_t,
                               ovf_row_fill=num_cols_pad - 1,
                               k_fwd=k_fwd, fwd_ovf_base=fwd_ovf_base,
                               with_perm=with_perm)
        ell_cols, ell_vals, orows, ocols, ovals, o, t2f = res
        inc = None
        if ovf_pad_t is None and orows.shape[0] >= _OVF_INC_MIN \
                and not with_perm:
            inc = build_ovf_incidence(orows, ocols, ovals, num_cols_pad)
        bwd = HybridAdj(
            ell_cols=jnp.asarray(ell_cols),
            ell_vals=jnp.asarray(ell_vals),
            ovf_rows=jnp.asarray(orows),
            ovf_cols=jnp.asarray(ocols),
            ovf_vals=jnp.asarray(ovals),
            deg=jnp.asarray(t_deg.astype(np.float32)),
            ovf_inc=inc,
        )
        return BiHybridAdj(fwd=fwd, bwd=bwd,
                           t2f=jnp.asarray(t2f) if t2f is not None else None)
    deg = np.diff(rowptr)
    rows = np.repeat(np.arange(r, dtype=np.int64), deg)
    order = np.lexsort((rows, col))
    t_rows = col.astype(np.int64)[order]
    t_cols = rows[order].astype(np.int32)
    t_vals = (value[order] if value is not None else None)
    t_rowptr = np.zeros(num_cols_pad + 1, dtype=np.int64)
    np.add.at(t_rowptr, t_rows + 1, 1)
    t_rowptr = np.cumsum(t_rowptr)
    bwd = build_hybrid_adj(
        t_rowptr, t_cols, t_vals, num_cols_pad, num_rows_pad, k=k_t,
        ovf_pad=ovf_pad_t, trash_col=num_rows_pad - 1,
    )
    t2f = None
    if with_perm:
        t2f = _transpose_perm_numpy(rowptr, col, k_fwd, fwd_ovf_base,
                                    int(bwd.ell_cols.shape[1]), num_cols_pad,
                                    int(bwd.ovf_rows.shape[0]))
    return BiHybridAdj(fwd=fwd, bwd=bwd,
                       t2f=jnp.asarray(t2f) if t2f is not None else None)


def _transpose_perm_numpy(rowptr, col, k_fwd, fwd_ovf_base, k_t, c_pad,
                          ovf_pad_t):
    """Numpy fallback for the transpose-slot -> forward-slot permutation
    (identical contract to csr_to_ell_t's ``t2f``)."""
    r = int(rowptr.shape[0] - 1)
    deg = np.diff(rowptr)
    e_row = np.repeat(np.arange(r, dtype=np.int64), deg)
    p_row = np.arange(col.shape[0]) - np.repeat(rowptr[:-1], deg)
    fwd_ovf_start = np.concatenate([[0], np.cumsum(np.maximum(deg - k_fwd, 0))])
    fwd_flat = np.where(
        p_row < k_fwd,
        e_row * k_fwd + p_row,
        fwd_ovf_base + fwd_ovf_start[e_row] + (p_row - k_fwd),
    )
    # transpose slot: counting-cursor order per column in CSR edge order
    # (stable sort by col preserves exactly that order within each column)
    order = np.argsort(col, kind="stable")
    j = col[order].astype(np.int64)
    t_deg = np.bincount(col, minlength=c_pad).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(t_deg)])[:-1]
    s_sorted = np.arange(j.shape[0]) - starts[j]
    t_ovf_start = np.concatenate([[0], np.cumsum(np.maximum(t_deg - k_t, 0))])
    bwd_flat = np.where(
        s_sorted < k_t,
        j * k_t + s_sorted,
        c_pad * k_t + t_ovf_start[j] + (s_sorted - k_t),
    )
    t2f = np.full(c_pad * k_t + max(ovf_pad_t, 1), -1, dtype=np.int64)
    t2f[bwd_flat] = fwd_flat[order]
    return t2f


def spmm_hybrid_mean(adj: HybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    return spmm_hybrid(adj, x) / jnp.maximum(adj.deg, 1.0)[:, None]


def _ell_max(ell_cols: jnp.ndarray, ell_vals: jnp.ndarray,
             x: jnp.ndarray) -> jnp.ndarray:
    """Masked row-max over ELL slots, chunked like ``_ell_sum``.  Padding
    rows come back as the sentinel; spmm_hybrid_max zeroes deg-0 rows."""
    k = ell_cols.shape[1]
    d = x.shape[1]
    neg = jnp.finfo(x.dtype).min

    def dense(cols, vals, rr):
        g, v = _ell_padded_gather(x, cols, vals, rr, k, d)
        return jnp.where((v != 0)[..., None], g, neg).max(axis=1)[:rr]

    return _chunked_rows(dense, ell_cols, ell_vals, x)


def spmm_hybrid_max(adj: HybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    assert not adj.ext, "max aggregation expects single-K layouts " \
        "(bucketed builds are sum/mean block-tier remainders only)"
    neg = jnp.finfo(x.dtype).min
    out = _ell_max(adj.ell_cols, adj.ell_vals, x)
    if adj.ovf_rows.shape[0] > 0:
        go = jnp.take(x, adj.ovf_cols, axis=0)
        go = jnp.where((adj.ovf_vals != 0)[:, None], go, neg)
        ovf = jax.ops.segment_max(
            go, adj.ovf_rows, num_segments=adj.num_rows, indices_are_sorted=True
        )
        out = jnp.maximum(out, ovf)
    return jnp.where(adj.deg[:, None] > 0, out, 0.0)


def _max_tie_count(adj: HybridAdj, x: jnp.ndarray,
                   out: jnp.ndarray) -> jnp.ndarray:
    """Per-(row, feature) count of valid slots equal to the row max —
    JAX autodiff splits the max cotangent evenly among ties, so the custom
    backward divides by this to match (verified grad-equivalence test)."""
    k = adj.ell_cols.shape[1]
    d = x.shape[1]

    def fn(cols, vals, o):
        rr = cols.shape[0]
        g = jnp.take(x, cols.reshape(-1), axis=0).reshape(rr, k, d)
        eq = (vals != 0)[..., None] & (g == o[:, None, :])
        return eq.sum(axis=1).astype(x.dtype)

    cnt = row_chunked(fn, adj.ell_cols.shape[0],
                      k * d * x.dtype.itemsize,
                      adj.ell_cols, adj.ell_vals, out)
    if adj.ovf_rows.shape[0] > 0:
        go = jnp.take(x, adj.ovf_cols, axis=0)
        eq = ((adj.ovf_vals != 0)[:, None]
              & (go == jnp.take(out, adj.ovf_rows, axis=0)))
        cnt = cnt + jax.ops.segment_sum(
            eq.astype(x.dtype), adj.ovf_rows, num_segments=adj.num_rows,
            indices_are_sorted=True)
    return jnp.maximum(cnt, 1.0)


@jax.custom_vjp
def _spmm_max_bi(fwd: HybridAdj, bwd: HybridAdj, x: jnp.ndarray):
    return spmm_hybrid_max(fwd, x)


def _spmm_max_bi_fw(fwd, bwd, x):
    out = spmm_hybrid_max(fwd, x)
    return out, (fwd, bwd, x, out)


def _spmm_max_bi_bw(res, g):
    """dx[c,d] = sum over edges (r,c) of g[r,d]/ties[r,d] where x[c,d] won
    row r's max — computed scatter-free over the transpose hybrid (the
    argmax indicator is the equality x[c,d] == out[r,d]; exact because the
    winner was gathered from the same x).  Same cost class as the sum
    backward (two [C,K_t,D] gathers instead of one)."""
    fwd, bwd, x, out = res
    h = jnp.where(fwd.deg[:, None] > 0, g, 0.0) / _max_tie_count(fwd, x, out)
    kt = bwd.ell_cols.shape[1]
    d = x.shape[1]

    def fn(cols, vals, xr):
        rr = cols.shape[0]
        hg = jnp.take(h, cols.reshape(-1), axis=0).reshape(rr, kt, d)
        og = jnp.take(out, cols.reshape(-1), axis=0).reshape(rr, kt, d)
        eq = (vals != 0)[..., None] & (og == xr[:, None, :])
        return jnp.where(eq, hg, 0.0).sum(axis=1)

    dx = row_chunked(fn, bwd.ell_cols.shape[0],
                     2 * kt * d * x.dtype.itemsize,
                     bwd.ell_cols, bwd.ell_vals, x)
    if bwd.ovf_rows.shape[0] > 0:
        # transpose overflow: row index = c (sorted), col index = r
        ho = jnp.take(h, bwd.ovf_cols, axis=0)
        oo = jnp.take(out, bwd.ovf_cols, axis=0)
        xo = jnp.take(x, bwd.ovf_rows, axis=0)
        eq = (bwd.ovf_vals != 0)[:, None] & (oo == xo)
        dx = dx + jax.ops.segment_sum(
            jnp.where(eq, ho, 0.0), bwd.ovf_rows,
            num_segments=bwd.num_rows, indices_are_sorted=True)
    return (
        jax.tree.map(_zero_cotangent, fwd),
        jax.tree.map(_zero_cotangent, bwd),
        dx.astype(x.dtype),
    )


_spmm_max_bi.defvjp(_spmm_max_bi_fw, _spmm_max_bi_bw)


def spmm_bi_max(adj: BiHybridAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Max aggregation with a scatter-free transpose-based backward
    (VERDICT r1 #7: the autodiff scatter path measured ~10x the forward)."""
    return _spmm_max_bi(adj.fwd, adj.bwd, x)
