"""Subgraph batch construction with static (padded) shapes.

Reference counterpart: ``SubgraphLoader`` / ``EvalSubgraphLoader``
(loader.py:119-284) and the batch tuple ``SubData(data, batch_size, n_id,
offset, count)`` (loader.py:95-104).  The data contract is preserved exactly
(SURVEY §2.3):

- a batch is a group of METIS-style clusters; ``n_id[:batch_size]`` are the
  in-batch (IB) node global ids — contiguous cluster ranges in the permuted
  order — and ``n_id[batch_size:]`` the out-of-batch (OB) 1-hop neighbors;
- ``offset[k]/count[k]`` give cluster ``k``'s contiguous range in the global
  permuted order (enables chunk-local pushes and, multi-host, tells which
  host owns which rows).

TPU delta: every batch is padded to bucketed static sizes (nodes, columns,
edges) so XLA compiles a handful of programs instead of one per batch — the
single biggest design change vs. the reference's fully dynamic GPU batches
(SURVEY §7 "hard parts" #1).  Padded node slots index a zero trash row
(``N``); padded edges carry weight 0.

Three collate modes mirror the reference:

- ``gas``  — full IB+OB one-hop graph (compute_subgraph, loader.py:172-192),
- ``ib``   — IB-only graph for Reverb/VR training (compute_subgraph_IB,
  loader.py:194-214; kernel relabel_cpu.cpp:112),
- ``ns``   — IB+OB with per-row neighbor sampling (compute_subgraph_NS,
  loader.py:217-246 — whose sampler this framework fixes, see graph/relabel).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from incagg_gnn_tpu.graph.csr import GraphData
from incagg_gnn_tpu.graph.relabel import (
    relabel_one_hop,
    relabel_one_hop_within_batch,
    sample_neighbors,
)
from incagg_gnn_tpu.ops.spmm import PaddedAdj, build_padded_adj


def _grow(new_kv, k, ovf):
    """Unpack an ``ell_buckets`` result and flag whether it grew."""
    nk, novf = new_kv
    return nk, novf, (nk, novf) != (k, ovf)


class SubgraphBatch(NamedTuple):
    """Device-side batch (a pytree of arrays; static shapes per bucket).

    ``n_id`` padding points at the trash row ``N``; ``push_idx[i]`` equals
    ``n_id[i]`` for IB rows and ``N`` otherwise, so scatters of per-row
    results into an ``[N+1, D]`` cache are always safe.
    """

    adj: PaddedAdj  # bipartite: rows=IB(padded), cols=IB+OB(padded)
    n_id: jnp.ndarray  # [C_pad] int32
    push_idx: jnp.ndarray  # [R_pad] int32
    batch_size: jnp.ndarray  # () int32 — true IB count
    num_nodes: jnp.ndarray  # () int32 — true IB+OB count


@dataclasses.dataclass
class HostBatch:
    """Host metadata + the device batch. Iterating a loader yields these."""

    device: SubgraphBatch
    n_id: np.ndarray  # true (unpadded) global ids, IB first
    batch_size: int
    offset: np.ndarray  # [num_clusters_in_batch] int64
    count: np.ndarray
    num_edges: int = 0  # true (unpadded) edge count, for throughput metrics

    @property
    def num_nodes(self) -> int:
        return int(self.n_id.shape[0])


@dataclasses.dataclass
class PadBuckets:
    rows: int  # R_pad  (IB)
    cols: int  # C_pad  (IB + OB)
    edges: int  # E_pad
    # hybrid-format buckets (set lazily on first hybrid collate)
    k: int = 0  # ELL width, forward
    k_t: int = 0  # ELL width, transpose
    ovf: int = 0  # COO overflow pad, forward
    ovf_t: int = 0  # COO overflow pad, transpose
    # block-tier buckets (block-fwd / block formats)
    nb: int = 0  # padded dense-tile count, forward
    nb_t: int = 0  # padded dense-tile count, transpose ('block' format)
    blk: int = 0  # per-block edge threshold: 0 undecided, -1 tier off
    rb: int = 128  # row-tile height ([rb, 128] tall tiles, chosen once)

    def fits(self, r: int, c: int, e: int) -> bool:
        return r <= self.rows and c <= self.cols and e <= self.edges


def _round_up(x: int, align: int) -> int:
    return max(align, ((x + align - 1) // align) * align)


class SubgraphLoader:
    """Builds per-step subgraph batches from a cluster-permuted graph.

    Args mirror the reference's ``SubgraphLoader`` (loader.py:119-149):
    ``ptr`` is the cluster slice pointer from :func:`partition_graph`;
    ``batch_size`` counts clusters per batch; ``mode`` selects the collate
    variant; ``num_neighbors`` caps sampled degree in ``ns`` mode.
    """

    def __init__(
        self,
        data: GraphData,
        ptr: np.ndarray,
        batch_size: int = 1,
        mode: str = "gas",
        num_neighbors: int = -1,
        shuffle: bool = False,
        seed: int = 0,
        bipartite: bool = True,
        trash_node: Optional[int] = None,
        align: int = 128,
        pad_slack: float = 1.1,
        adj_format: str = "coo",
        adj_perm: bool = False,
        device_cache: Optional[bool] = None,
        static_groups: bool = False,
        log: bool = False,
        block_dtype=None,
        block_d_hint: int = 256,
        block_force: bool = False,
        global_cols: bool = False,
    ):
        """``adj_format``: 'coo' (sorted edge list + segment ops; required for
        edge-level computations and edge dropout), 'hybrid' (scatter-free
        ELL+COO with a transpose pair for the training backward),
        'hybrid-fwd' (forward-only hybrid, for no-grad refresh sweeps), or
        'block-fwd' (hybrid-fwd plus the dense MXU tier of ops/block.py,
        auto-gated per graph by its cost model unless ``block_force``).
        Measured ~1.7x faster aggregation than 'coo' on v5e (hybrid) and a
        further 1.5x at products/reddit degrees (block tier).

        ``block_dtype``/``block_d_hint``: dense-tile dtype (defaults f32)
        and the feature width the cost model assumes.

        ``static_groups``: with ``shuffle``, keep the cluster->batch GROUPING
        fixed across epochs and shuffle only the batch order.  The reference
        reshuffles cluster composition every epoch (slightly more SGD noise);
        static grouping collates once, replays the device-cached batches,
        and admits the dense tile tier for multi-cluster batches — the
        per-epoch host collate + restage otherwise dominates wall clock on
        slow host<->device links (docs/RESULTS.md)."""
        assert mode in ("gas", "ib", "ns")
        assert adj_format in ("coo", "hybrid", "hybrid-fwd", "block-fwd",
                              "block")
        self.adj_format = adj_format
        # global-column eval collate: hybrid ELL/COO column ids are mapped
        # into the GLOBAL node-table row space (pad slots -> trash row N or
        # a zero-weight row), so the refresh sweep gathers neighbor
        # features straight from the [N+1, D] cache tables instead of
        # first materializing the ~whole-graph [C_pad, D] x_in per
        # (batch, layer) — the dominant cost of the products-scale sweep
        # (docs/RESULTS.md r3 trace: C_pad ~= 0.8N at 30 parts / deg 50).
        # Only engaged when the built adjacency is plain hybrid (the dense
        # block tier needs the compact batch-local column space).
        self.global_cols = bool(global_cols)
        self.uses_global_cols = False  # set by the first hybrid collate
        self.static_groups = static_groups and mode != "ns"  # NS resamples
        self.block_dtype = np.float32 if block_dtype is None else block_dtype
        self.block_d_hint = block_d_hint
        self.block_force = block_force
        self.adj_perm = adj_perm  # build the transpose-slot permutation
        # (t2f) for scatter-free trainable attention (models/gat.py)
        self.device_cache = device_cache
        self.data = data
        self.adj = data.adj_t
        self.ptr = np.asarray(ptr, dtype=np.int64)
        self.batch_size = batch_size
        self.mode = mode
        self.num_neighbors = num_neighbors
        self.shuffle = shuffle
        self.seed = seed
        self.bipartite = bipartite
        self.align = align
        self.pad_slack = pad_slack
        self.trash_node = data.num_nodes if trash_node is None else trash_node
        self.num_clusters = len(self.ptr) - 1
        self._epoch = 0
        self._cache: Optional[List[HostBatch]] = None
        self.recompile_count = 0  # bumped whenever buckets grow

        # Establish initial pad buckets from the deterministic grouping.
        groups = self._groups(shuffled=False)
        maxima = self._measure(groups)
        # static grouping => batch composition is deterministic: exact buckets
        slack = 1.0 if (not shuffle or self.static_groups
                        or (batch_size == 1 and mode != "ns")) else pad_slack
        self.buckets = PadBuckets(
            rows=_round_up(int(maxima[0] * slack), align),
            cols=_round_up(int(maxima[1] * slack), align),
            edges=_round_up(int(maxima[2] * slack), align),
        )
        if log:
            print(
                f"SubgraphLoader[{mode}]: {self.num_clusters} clusters, "
                f"{len(groups)} batches, buckets=(R={self.buckets.rows}, "
                f"C={self.buckets.cols}, E={self.buckets.edges})"
            )

    # ---------------- grouping ----------------
    def _groups(self, shuffled: bool, epoch: int = 0) -> List[np.ndarray]:
        """Group cluster ids into batches of ``batch_size`` clusters."""
        order = np.arange(self.num_clusters)
        if shuffled:
            rng = np.random.default_rng((self.seed, epoch))
            order = rng.permutation(order)
        return [
            order[i : i + self.batch_size]
            for i in range(0, self.num_clusters, self.batch_size)
        ]

    def _group_nodes(self, cluster_ids: np.ndarray):
        """IB node ids (concatenated cluster ranges) + offset/count metadata."""
        offs = self.ptr[cluster_ids]
        cnts = self.ptr[cluster_ids + 1] - offs
        idx = np.concatenate(
            [np.arange(o, o + c, dtype=np.int64) for o, c in zip(offs, cnts)]
        ) if len(cluster_ids) else np.empty(0, np.int64)
        return idx, offs, cnts

    # ---------------- measurement (for bucket sizing) ----------------
    def _measure(self, groups: Sequence[np.ndarray]):
        """Upper-bound (rows, cols, edges) per batch without relabeling:
        rows = IB count; edges <= sum of IB degrees; cols <= rows + edges."""
        max_r = max_c = max_e = 1
        deg = np.diff(self.adj.rowptr)
        for g in groups:
            offs = self.ptr[g]
            cnts = self.ptr[g + 1] - offs
            r = int(cnts.sum())
            e = int(
                sum(
                    deg[o : o + c].sum() for o, c in zip(offs, cnts)
                )
            )
            if self.mode == "ns" and self.num_neighbors >= 0:
                e = min(e, r * self.num_neighbors)
            c = r if self.mode == "ib" else min(self.data.num_nodes, r + e)
            max_r, max_c, max_e = max(max_r, r), max(max_c, c), max(max_e, e)
        return max_r, max_c, max_e

    # ---------------- collate ----------------
    def _collate(self, cluster_ids: np.ndarray, epoch: int, step: int) -> HostBatch:
        from incagg_gnn_tpu.utils.heartbeat import beat

        beat()  # liveness for the supervisor's stall watchdog
        idx, offs, cnts = self._group_nodes(cluster_ids)
        bs = int(idx.shape[0])
        if self.mode == "ib":
            rowptr, col, value, n_id = relabel_one_hop_within_batch(
                self.adj, idx, self.bipartite
            )
        else:
            rowptr, col, value, n_id = relabel_one_hop(self.adj, idx, self.bipartite)
            if self.mode == "ns" and self.num_neighbors >= 0:
                rowptr, col, value = sample_neighbors(
                    rowptr, col, value, self.num_neighbors,
                    seed=hash((self.seed, epoch, step)) & 0x7FFFFFFF,
                )
        tot = int(n_id.shape[0])
        r, e = bs, int(col.shape[0])
        if not self.buckets.fits(r, tot, e):
            self.buckets = PadBuckets(
                rows=max(self.buckets.rows, _round_up(int(r * self.pad_slack), self.align)),
                cols=max(self.buckets.cols, _round_up(int(tot * self.pad_slack), self.align)),
                edges=max(self.buckets.edges, _round_up(int(e * self.pad_slack), self.align)),
            )
            self.recompile_count += 1

        b = self.buckets
        adj = self._build_adj(rowptr, col, value, bs)

        n_id_pad = np.full(b.cols, self.trash_node, dtype=np.int32)
        n_id_pad[:tot] = n_id
        push_idx = np.full(b.rows, self.trash_node, dtype=np.int32)
        push_idx[:bs] = n_id[:bs]

        if self.global_cols:
            from incagg_gnn_tpu.ops.ell import HybridAdj

            if isinstance(adj, HybridAdj):
                # map batch-local columns into global table rows; padded
                # slots land on the trash row or carry zero weight either way
                assert not adj.ext and adj.ovf_inc is None, (
                    "global-cols remap rewrites only ell/ovf columns; a "
                    "bucketed or incidence-bearing adj would gather from "
                    "wrong table rows — loader builds must stay single-K")
                adj = adj._replace(
                    ell_cols=n_id_pad[np.asarray(adj.ell_cols)],
                    ovf_cols=n_id_pad[np.asarray(adj.ovf_cols)],
                )
                self.uses_global_cols = True

        device = SubgraphBatch(
            adj=jax.tree.map(np.asarray, adj),
            n_id=n_id_pad,
            push_idx=push_idx,
            batch_size=np.asarray(bs, dtype=np.int32),
            num_nodes=np.asarray(tot, dtype=np.int32),
        )
        return HostBatch(device=device, n_id=n_id, batch_size=bs, offset=offs,
                         count=cnts, num_edges=e)

    def _build_adj(self, rowptr, col, value, batch_size: int):
        """Build the device adjacency in the configured format, maintaining
        static hybrid buckets (ELL width / overflow size) across batches."""
        from incagg_gnn_tpu.ops.ell import (
            build_bi_hybrid_adj, build_hybrid_adj, ell_buckets)

        b = self.buckets
        if self.adj_format == "coo":
            return build_padded_adj(rowptr, col, value, b.rows, b.cols, b.edges)

        if self.adj_format in ("block-fwd", "block"):
            blk = self._build_block_adj(rowptr, col, value,
                                        bi=self.adj_format == "block")
            if blk is not None:
                return blk
            # tier rejected for this graph -> plain hybrid below

        deg = np.diff(rowptr)
        # transpose degrees: counts of each col
        tdeg = np.bincount(col, minlength=b.cols) if col.size else np.zeros(1, np.int64)
        k, ovf = ell_buckets([deg], k=b.k, ovf=b.ovf)
        k_t, ovf_t = ell_buckets([tdeg], k=b.k_t, ovf=b.ovf_t)
        if (k, ovf, k_t, ovf_t) != (b.k, b.ovf, b.k_t, b.ovf_t):
            b.k, b.ovf, b.k_t, b.ovf_t = k, ovf, k_t, ovf_t
            self.recompile_count += 1

        if self.adj_format in ("hybrid-fwd", "block-fwd"):
            return build_hybrid_adj(rowptr, col, value, b.rows, b.cols,
                                    k=b.k, ovf_pad=b.ovf)
        return build_bi_hybrid_adj(rowptr, col, value, b.rows, b.cols,
                                   k=b.k, k_t=b.k_t, ovf_pad=b.ovf,
                                   ovf_pad_t=b.ovf_t,
                                   with_perm=self.adj_perm)

    def _build_block_adj(self, rowptr, col, value, bi: bool = False):
        """Dense-tier build for 'block-fwd' (forward-only) / 'block'
        (forward + exact-transpose pair for training).  Decides once (first
        collate) whether the tier pays — cost model plus 'tiles must fit the
        device cache' (streaming inflated tiles would be a net loss) — then
        keeps static tile buckets across batches.  Returns None when the
        tier is off (caller falls back to the hybrid formats)."""
        from incagg_gnn_tpu.ops.block import (
            B as BLK, build_bi_block_hybrid, build_block_hybrid,
            marginal_thresh, measure_block_tier, plan_block_tier_rb,
            transpose_csr_host)
        from incagg_gnn_tpu.ops.ell import choose_k, ell_buckets

        b = self.buckets
        a_itemsize = np.dtype(self.block_dtype).itemsize
        measured = None  # (thresh, total, rem_deg) of the last measure pass
        if b.blk == 0:  # decide on the first collated batch
            # the tier only pays when batches are collated once and replayed
            # (device cache); shuffled multi-cluster / NS loaders re-collate
            # every epoch, which would rebuild + restage the 30-200x
            # inflated tiles each time — reject unless explicitly forced
            replayable = (not self.shuffle or self.static_groups
                          or (self.batch_size == 1 and self.mode != "ns"))
            if not replayable and not self.block_force:
                b.blk = -1
                return None
            plan = plan_block_tier_rb(
                rowptr, col, b.cols,
                x_itemsize=a_itemsize, a_itemsize=a_itemsize,
                d_hint=self.block_d_hint,
            )
            th = None
            if plan is not None:
                th, b.rb = plan
            elif self.block_force:
                th = marginal_thresh(a_itemsize, a_itemsize,
                                     self.block_d_hint)
            why = "cost model: hybrid within min_gain"
            if th is not None:
                # admission requires the WHOLE batch — tiles plus the hybrid
                # remainder and index arrays — to fit the device cache: the
                # tier only pays device-resident (_use_device_cache uses the
                # same accounting once buckets are final).  Tall tiles
                # inflate adjacency bytes ~rb/128 x, so on a residency miss
                # fall back to SHORTER tiles before giving the tier up
                # (r5: products-mid picked rb=512 whose tiles blew the
                # budget 8x while the classic rb=128 tier fits and wins)
                budget = (self.hbm_budget if self.hbm_budget is not None
                          else 1_500_000_000)
                for rb_try in [r for r in (b.rb, 256, 128) if r <= b.rb]:
                    plan_try = (th, rb_try) if rb_try == b.rb else \
                        plan_block_tier_rb(
                            rowptr, col, b.cols, x_itemsize=a_itemsize,
                            a_itemsize=a_itemsize,
                            d_hint=self.block_d_hint,
                            rb_candidates=(rb_try,))
                    if plan_try is None:
                        continue
                    th_try, rb_try = plan_try
                    total, rem_deg = measure_block_tier(
                        rowptr, col, b.rows, b.cols, th_try,
                        rb_rows=rb_try)
                    k_est = choose_k(rem_deg)
                    per = (total * rb_try * BLK * a_itemsize
                           + b.rows * k_est * 8 + (b.rows + b.cols) * 4
                           + int(np.maximum(rem_deg - k_est, 0).sum()) * 12)
                    if bi:  # the transpose pair roughly doubles the bytes
                        per *= 2
                    if self.block_force or per * len(self) <= budget:
                        th, b.rb = th_try, rb_try
                        measured = (th, total, rem_deg)
                        break
                    why = (f"residency budget: ~{per * len(self) >> 20} MB"
                           f" of tiles+batch over {budget >> 20} MB "
                           f"(rb={rb_try})")
                    th = None
                else:
                    th = None
            b.blk = th if th is not None else -1
            import logging

            logging.getLogger(__name__).info(
                "block tier %s (%s)",
                "ON" if b.blk > 0 else "off",
                f"thresh={b.blk}" if b.blk > 0 else why)
        if b.blk < 0:
            return None

        if measured is not None and measured[0] == b.blk:
            total, rem_deg = measured[1], measured[2]
        else:
            total, rem_deg = measure_block_tier(rowptr, col, b.rows, b.cols,
                                                b.blk, rb_rows=b.rb)
        # forward-only (eval) remainders use the overflow-locality kink;
        # bi (train fwd+bwd) chains measured the opposite optimum
        # (ops/ell.choose_k docstring)
        b.k, b.ovf, grew = _grow(ell_buckets([rem_deg], k=b.k, ovf=b.ovf,
                                             locality_kink=not bi),
                                 b.k, b.ovf)
        if total > b.nb:
            b.nb, grew = total, True
        if not bi:
            if grew:
                self.recompile_count += 1
            return build_block_hybrid(
                rowptr, col, value, b.rows, b.cols, thresh=b.blk,
                a_dtype=self.block_dtype, k=b.k, ovf_pad=b.ovf, nb_pad=b.nb,
                rb_rows=b.rb,
            )

        # transpose buckets (measured on the actual transpose: its row-block
        # run padding differs from the forward's even though the dense block
        # SET is the exact transpose)
        transpose = transpose_csr_host(rowptr, col, value, b.cols)
        total_t, rem_deg_t = measure_block_tier(transpose[0], transpose[1],
                                                b.cols, b.rows, b.blk,
                                                rb_rows=b.rb)
        b.k_t, b.ovf_t, grew_t = _grow(
            ell_buckets([rem_deg_t], k=b.k_t, ovf=b.ovf_t,
                        locality_kink=False), b.k_t, b.ovf_t)
        grew = grew or grew_t
        if total_t > b.nb_t:
            b.nb_t, grew = total_t, True
        if grew:
            self.recompile_count += 1
        return build_bi_block_hybrid(
            rowptr, col, value, b.rows, b.cols, thresh=b.blk,
            a_dtype=self.block_dtype, k=b.k, k_t=b.k_t, ovf_pad=b.ovf,
            ovf_pad_t=b.ovf_t, nb_pad=b.nb, nb_pad_t=b.nb_t,
            transpose=transpose, rb_rows=b.rb,
        )

    # ---------------- iteration ----------------
    def __len__(self) -> int:
        return -(-self.num_clusters // self.batch_size)

    def _to_device(self, hb: HostBatch) -> HostBatch:
        from incagg_gnn_tpu.utils.heartbeat import beat

        beat()  # between host->device stagings (the wedge-prone step)
        if isinstance(hb.device.n_id, jnp.ndarray):
            return hb
        return dataclasses.replace(
            hb, device=jax.tree.map(jnp.asarray, hb.device)
        )

    #: externally supplied HBM headroom (bytes) for batch caching — the
    #: trainer sets it to (device limit − caches − tables); None = the
    #: conservative 1.5 GB default.  Matters on slow host↔device links:
    #: a streamed refresh restages every batch once per LAYER (measured
    #: tunnel-bound at products scale, docs/RESULTS.md).
    hbm_budget: Optional[int] = None

    def _use_device_cache(self) -> bool:
        # Keep precomputed batches on device only while they fit comfortably
        # in HBM; large-graph eval sweeps stream from host instead (the
        # reference's streaming behavior, main.py:61-64).
        if self.device_cache is not None:
            return self.device_cache
        b = self.buckets
        per = (b.rows + b.cols) * 4 + b.edges * 12 + b.rows * (b.k + b.k_t) * 8
        if b.blk > 0:  # dense-tier tiles ride along with each batch
            per += ((b.nb + b.nb_t) * b.rb * 128
                    * np.dtype(self.block_dtype).itemsize)
        budget = self.hbm_budget if self.hbm_budget is not None else 1_500_000_000
        return per * len(self) < budget

    def _materialize_cache(self):
        """Collate the deterministic groups once; if any pad bucket grew
        mid-pass (ELL width / overflow / tile count), earlier batches carry
        stale (smaller) shapes — re-collate the whole set under the final
        buckets so every cached batch shares one static shape (required by
        the fused-epoch scan and by stacked multi-chip formats).  Bucket
        growth is monotone, so the second pass is stable."""
        groups = self._groups(shuffled=False)
        before = self.recompile_count
        self._cache = [self._collate(g, 0, i) for i, g in enumerate(groups)]
        if self.recompile_count != before:
            self._cache = [self._collate(g, 0, i)
                           for i, g in enumerate(groups)]
        if self._use_device_cache():
            self._cache = [self._to_device(hb) for hb in self._cache]

    def __iter__(self) -> Iterator[HostBatch]:
        if not self.shuffle:
            if self._cache is None:
                self._materialize_cache()
            for hb in self._cache:
                yield self._to_device(hb)
            return
        epoch = self._epoch
        self._epoch += 1
        # single-cluster batches with no resampling: shuffling only permutes
        # the batch ORDER, never the contents — collate once, cache (on
        # device when it fits), and replay in the epoch's shuffled order.
        # Kills the per-epoch collate + host->device restaging that
        # dominates training time on slow links (docs/RESULTS.md), exactly
        # for the headline batch_size=1 configs (products GCN/GCNII/APPNP).
        # ``static_groups`` opts multi-cluster batches into the same replay
        # (fixed grouping, shuffled order).
        if ((self.batch_size == 1 or self.static_groups)
                and self.mode != "ns"):
            if self._cache is None:
                self._materialize_cache()
            order = np.random.default_rng((self.seed, epoch)).permutation(
                len(self._cache)
            )
            for k in order:
                yield self._to_device(self._cache[k])
            return
        groups = self._groups(shuffled=True, epoch=epoch)
        for i, g in enumerate(groups):
            yield self._to_device(self._collate(g, epoch, i))


class EvalSubgraphLoader(SubgraphLoader):
    """Deterministic, precomputed loader for layer-wise inference / cache
    refresh (reference: loader.py:266-284): coarsens ``ptr`` by ``batch_size``
    clusters per batch, then iterates each coarse batch once."""

    def __init__(
        self,
        data: GraphData,
        ptr: np.ndarray,
        batch_size: int = 1,
        bipartite: bool = True,
        **kwargs,
    ):
        ptr = np.asarray(ptr, dtype=np.int64)
        coarse = ptr[::batch_size]
        if coarse[-1] != data.num_nodes:
            coarse = np.concatenate([coarse, [data.num_nodes]])
        super().__init__(
            data,
            coarse,
            batch_size=1,
            mode="gas",
            shuffle=False,
            bipartite=bipartite,
            **kwargs,
        )
