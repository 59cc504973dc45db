"""ScalableGNN — the abstract model runtime.

TPU-native counterpart of the reference's ``ScalableGNN`` (models/base.py:26):
per-layer history caches, the GAS forward (``__call__``, base.py:126-240), the
Reverb/VR forward (``VR_call``, base.py:242-378), ``push_and_pull``
(base.py:380-456), and the layer-wise refresh sweeps ``mini_inference``
(base.py:509-603) / ``mini_inference_vr`` (per model in the reference, e.g.
gcn.py:335-410 — here implemented once, generically).

Design deltas vs. the reference (all SURVEY §7):

- Models are pure functions over parameter/state pytrees; histories are a
  :class:`HistoryState` argument threaded through jitted steps and updated by
  XLA scatters into donated buffers — there is no AsyncIOPool because HBM
  residency + XLA dataflow subsumes it.
- Each refresh layer-pass is one jitted program per (layer kind, bucket
  shape); asynchrony across batches comes from JAX async dispatch.
- The GAS/VR/refresh step semantics (what is pushed/pulled where, in which
  space, at which layer index) follow the reference's "index change"
  convention exactly: ``emb[l]`` = input of layer ``l``; ``emb_ag[l]`` =
  aggregation of ``emb[l]`` over the full neighborhood.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from incagg_gnn_tpu.history import HistoryState, init_history, tup_set
from incagg_gnn_tpu.loader import SubgraphBatch
from incagg_gnn_tpu.models.nn import pad_cols, pad_rows
from incagg_gnn_tpu.ops.agg import spmm, spmm_reduce
from incagg_gnn_tpu.utils.heartbeat import beat as _heartbeat
from incagg_gnn_tpu.ops.spmm import PaddedAdj

Params = Any
State = Any


class StreamedPulls(NamedTuple):
    """Pre-staged per-batch cache rows from the host-spill tier: stacked
    ``[num_layers, R_pad, hist_dim]`` M_in and M_ag (IB-aligned, padded rows
    zero).  Passed to ``forward_vr`` in place of :class:`HistoryState` when
    the caches live in host DRAM (history_spill.SpilledHistory)."""

    m_in: jnp.ndarray
    m_ag: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class BaseConfig:
    """Shared architecture knobs (reference: conf/model/*.yaml
    ``params.<dataset>.architecture``)."""

    num_nodes: int
    in_channels: int
    hidden_channels: int
    out_channels: int
    num_layers: int
    dropout: float = 0.0


class ScalableGNN:
    """Abstract scalable GNN. Subclasses implement the per-model forwards."""

    #: whether forward_layer needs the initial-residual x0 (GCNII / APPNP)
    needs_x0 = False
    #: aggregator used for the M_ag caches and the VR correction term:
    #: "sum" = weighted sum with adjacency values (GCN/GCNII/APPNP);
    #: "mean" = mean over binarized adjacency (GraphSAGE, graphsage.py:628)
    vr_reduce = "sum"

    def __init__(self, cfg: BaseConfig):
        self.cfg = cfg
        self._refresh_fns: Dict[Tuple, Any] = {}

    # ---------------- abstract API ----------------
    def init(self, rng) -> Tuple[Params, State]:
        raise NotImplementedError

    def forward_gas(
        self,
        params: Params,
        state: State,
        x: jnp.ndarray,
        batch: SubgraphBatch,
        hist_emb: jnp.ndarray,
        rng: Optional[jax.Array],
        training: bool,
        aggregate_combined: bool = True,
        use_aggregation: bool = True,
    ) -> Tuple[jnp.ndarray, State, jnp.ndarray, Dict]:
        """GAS training-step forward: per layer, compute, push IB rows into
        ``emb[l+1]`` and pull OB rows from it (reference base.py:126-240 +
        per-model forward).  Returns (logits[R_pad], state, emb, metrics)."""
        raise NotImplementedError

    def forward_vr(
        self,
        params: Params,
        state: State,
        x: jnp.ndarray,
        batch: SubgraphBatch,
        hist: HistoryState,
        rng: Optional[jax.Array],
        training: bool,
        drift_norm: int = 2,
    ) -> Tuple[jnp.ndarray, State, Dict]:
        """Reverb/VR forward on an IB-only batch: per layer,
        ``h = A_ib @ (x - M_in[l]) + M_ag[l]`` (reference base.py:242-378 +
        per-model VR_forward).  No history writes during training."""
        raise NotImplementedError

    def forward_layer(
        self,
        params: Params,
        state: State,
        layer: int,
        x: jnp.ndarray,
        x0_ib: Optional[jnp.ndarray],
        adj: PaddedAdj,
        use_aggregation: bool = True,
        pre_agg: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """One layer for the layer-wise refresh sweep (eval mode, no dropout;
        reference per-model ``forward_layer``).  ``pre_agg``, when given, is
        this layer's neighborhood aggregation of ``x`` (already computed for
        the M_ag cache) — models reuse it instead of re-aggregating."""
        raise NotImplementedError

    def layer0_cache_input(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """The model-space vector cached as ``M_in[0]`` (reference: e.g.
        gcn.py:355 raw x; gcn2.py:451 ``lin0(x).relu()``; appnp.py:249-251
        the MLP output)."""
        return x

    def layer_input_dim(self, layer: int) -> int:
        """Feature width of layer ``layer``'s input (for slicing the cache)."""
        raise NotImplementedError

    def reg_mask(self, params: Params):
        """Pytree of bools: True leaves get ``reg_weight_decay``, False get
        ``nonreg_weight_decay`` (reference: main.py:196-201 param groups)."""
        raise NotImplementedError

    # ---------------- shared machinery ----------------
    @property
    def hist_dim(self) -> int:
        return self.cfg.hidden_channels

    def init_history(self, dtype=jnp.float32) -> HistoryState:
        return init_history(
            self.cfg.num_layers, self.cfg.num_nodes, self.hist_dim, dtype
        )

    #: when set (by the sharded GAS trainer during tracing), push_and_pull
    #: pulls OB rows from other devices' slabs via the static halo exchange
    #: instead of a same-table gather: (exchange_fn) with
    #: exchange_fn: [slab, D] -> [C_pad, D]
    _shard_halo = None

    #: slab row count (incl. trash row) for the sharded-GAS-SPILL fresh-push
    #: exchange (set together with _shard_halo + _stream_pulled)
    _spill_slab_rows = None

    #: when set (by the spill GAS trainer during tracing), push_and_pull
    #: reads pulled OB rows from this pre-staged ``[L, C_pad, hist_dim]``
    #: stack (host tables gathered before the step, the reference's
    #: prefetch-all-pulls, base.py:203-204) and ``hist_emb`` is a per-batch
    #: ``[L, R_pad, hist_dim]`` accumulator of pushed IB rows that the
    #: trainer writes back to the host tables after the step
    _stream_pulled = None
    #: trace-time record of which slots GAS pushes touch (for host write-back)
    _stream_pushed_slots = None

    def push_and_pull(
        self,
        hist_emb: jnp.ndarray,
        slot: int,
        h: jnp.ndarray,
        batch: SubgraphBatch,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Push IB rows of ``h`` into ``emb[slot]`` and splice pulled OB rows
        after them (reference base.py:380-456).  ``h: [R_pad, D] ->
        x: [C_pad, D]``; the updated stacked emb is returned for threading."""
        d = h.shape[1]
        c_pad = batch.n_id.shape[0]
        valid = (jnp.arange(h.shape[0]) < batch.batch_size)[:, None]
        pushed = jax.lax.stop_gradient(
            jnp.where(valid, pad_cols(h, self.hist_dim), 0.0)
        )
        if self._stream_pulled is not None:
            # spill tier: accumulate IB pushes row-aligned (host writes them
            # back chunk-contiguously) and splice the pre-staged OB pulls
            if self._stream_pushed_slots is not None:
                self._stream_pushed_slots.add(slot)
            hist_emb = tup_set(
                hist_emb, slot, pushed.astype(hist_emb[slot].dtype))
            pulled = self._stream_pulled[slot][:, :d].astype(h.dtype)
            if self._shard_halo is not None:
                # sharded GAS spill (r4): the pre-staged host rows are one
                # round stale for OB rows whose OWNER pushed them THIS round
                # over on its own shard.  Exact HBM parity: scatter this
                # device's fresh pushes (+ a validity flag column) into a
                # slab-shaped buffer, halo-exchange it, and splice fresh
                # rows over the staged ones where the flag says the owner
                # pushed.  (The HBM path's exchange reads its slab AFTER
                # the lockstep push — this reproduces it bit-for-bit.)
                slab_rows = self._spill_slab_rows  # slab+1 (set by trainer)
                src = jnp.zeros((slab_rows, d + 1), h.dtype)
                payload = jax.lax.stop_gradient(jnp.concatenate(
                    [jnp.where(valid, h[:, :d], 0.0),
                     valid.astype(h.dtype)], axis=1))
                src = src.at[batch.push_idx].set(payload)
                ex = self._shard_halo(src)
                fresh, flag = ex[:, :d], ex[:, d:] != 0
                pulled = jnp.where(flag, fresh, pulled)
            ib = (jnp.arange(c_pad) < batch.batch_size)[:, None]
            x = jnp.where(ib, pad_rows(h, c_pad), pulled)
            return x, hist_emb
        hist_emb = tup_set(
            hist_emb, slot,
            hist_emb[slot].at[batch.push_idx].set(
                pushed.astype(hist_emb[slot].dtype)),
        )
        if self._shard_halo is not None:
            # multi-chip: OB rows live on other slabs; exchange the halo
            # (all devices pushed this layer in lockstep before pulling)
            pulled = self._shard_halo(hist_emb[slot])[:, :d].astype(h.dtype)
        else:
            pulled = jnp.take(hist_emb[slot], batch.n_id, axis=0)[:, :d].astype(
                h.dtype
            )
        ib = (jnp.arange(c_pad) < batch.batch_size)[:, None]
        x = jnp.where(ib, pad_rows(h, c_pad), pulled)
        return x, hist_emb

    def vr_pull(
        self, hist, layer: int, batch: SubgraphBatch, dim: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Gather the IB rows of ``M_in[layer]`` / ``M_ag[layer]`` (reference
        base.py:318-323 chunked pulls + per-model ``synchronize_pull`` crops
        ``[:batch_size, :x.shape[1]]``).

        ``hist`` is either the HBM-resident :class:`HistoryState` (gathered
        here by row index) or a :class:`StreamedPulls` of pre-staged rows from
        the host-spill tier (already IB-aligned)."""
        if isinstance(hist, StreamedPulls):
            m_in = hist.m_in[layer][:, :dim]
            m_ag = hist.m_ag[layer][:, :dim]
        else:
            m_in = jnp.take(hist.emb[layer], batch.push_idx, axis=0)[:, :dim]
            m_ag = jnp.take(hist.emb_ag[layer], batch.push_idx, axis=0)[:, :dim]
        return (
            jax.lax.stop_gradient(m_in.astype(jnp.float32)),
            jax.lax.stop_gradient(m_ag.astype(jnp.float32)),
        )

    def drift_term(self, d: jnp.ndarray, batch: SubgraphBatch,
                   drift_norm: int = 2) -> jnp.ndarray:
        """Per-layer embedding-drift metric ``Σ_ib ||x − M_in|| / |IB|``
        (reference per-model drift accumulators, e.g. gcn.py:72-75), masked to
        valid IB rows — padded rows carry arbitrary activations (layer biases)
        and must not count."""
        valid = (jnp.arange(d.shape[0]) < batch.batch_size)[:, None]
        d = jnp.where(valid, d, 0.0)
        num = (
            jnp.abs(d).sum() if drift_norm == 1
            else jnp.sqrt((d * d).sum(-1) + 1e-12).sum()
        )
        return num / jnp.maximum(batch.batch_size, 1)

    def vr_aggregate(self, adj: PaddedAdj, x: jnp.ndarray) -> jnp.ndarray:
        """The aggregation used for both the VR correction term and the M_ag
        refresh: weighted-sum for normalized adjacencies, binary mean for
        SAGE (reference graphsage.py:896-898 ``spmm(adj_none, x, conv.aggr)``)."""
        if self.vr_reduce == "sum":
            return spmm(adj, x)
        return spmm_reduce(adj.binarized(), x, self.vr_reduce)

    #: True when vr_cache_value is the plain neighborhood aggregation —
    #: lets the refresh reuse the cached value as forward_layer's pre_agg
    vr_cache_is_agg = True

    def vr_cache_value(self, params: Params, layer: int, adj: PaddedAdj,
                       x: jnp.ndarray) -> jnp.ndarray:
        """The value written into ``emb_ag[layer]`` by the VR refresh
        (default: ``M_ag = aggregate(A_full, x)``).  Models with composite VR
        caches override this — PNA true-VR packs one full-neighborhood
        aggregate per linear (aggregator, scaler) branch plus the full degree
        — and set ``vr_cache_is_agg = False``."""
        return self.vr_aggregate(adj, x)

    # ---------------- layer-wise refresh (mini_inference[_vr]) ----------------
    def _refresh_batch_step(self, layer: int, vr: bool, use_aggregation: bool):
        """The per-batch body of one refresh layer pass (shared between the
        per-batch jit and the scanned whole-layer jit)."""
        L = self.cfg.num_layers
        D = self.hist_dim

        def fn(params, state, hist: HistoryState, x_table, out_table, batch: SubgraphBatch):
            adj = batch.adj
            r_pad = adj.num_rows
            # padded rows scatter into the trash row N; zero them so the trash
            # row stays zero (models with biases / degree scalers otherwise
            # push garbage there, which pad pulls would read back)
            valid = (jnp.arange(r_pad) < batch.batch_size)[:, None]
            emb, emb_ag = hist.emb, hist.emb_ag
            pre_agg = None  # VR refresh reuses the M_ag aggregation in the
            # layer forward (they are the same A @ x; halves refresh cost)
            if layer == 0:
                x_in = jnp.take(x_table, batch.n_id, axis=0).astype(jnp.float32)
                if vr or self.needs_x0:
                    m0 = self.layer0_cache_input(params, x_in)
                    emb = tup_set(emb, 0, emb[0].at[batch.push_idx].set(
                        jnp.where(valid, pad_cols(m0[:r_pad], D), 0.0
                                  ).astype(emb[0].dtype)))
                    if vr:
                        ag0 = self.vr_cache_value(params, 0, adj, m0)
                        emb_ag = tup_set(
                            emb_ag, 0, emb_ag[0].at[batch.push_idx].set(
                                jnp.where(valid, pad_cols(ag0, D), 0.0
                                          ).astype(emb_ag[0].dtype)))
                        pre_agg = ag0 if self.vr_cache_is_agg else None
            else:
                dim = self.layer_input_dim(layer)
                x_in = jnp.take(emb[layer], batch.n_id, axis=0)[:, :dim].astype(
                    jnp.float32
                )
                if vr:
                    ag = self.vr_cache_value(params, layer, adj, x_in)
                    emb_ag = tup_set(
                        emb_ag, layer, emb_ag[layer].at[batch.push_idx].set(
                            jnp.where(valid, pad_cols(ag, D), 0.0
                                      ).astype(emb_ag[layer].dtype)))
                    pre_agg = ag if self.vr_cache_is_agg else None
            x0_ib = None
            if self.needs_x0 and layer > 0:
                # layer 0 computes x0 inline in forward_layer; later layers
                # read it back from the emb[0] cache written at layer 0
                x0_ib = jnp.take(emb[0], batch.push_idx, axis=0)[
                    :, : self.x0_dim
                ].astype(jnp.float32)
            out = self.forward_layer(
                params, state, layer, x_in, x0_ib, adj, use_aggregation,
                pre_agg=pre_agg if use_aggregation else None,
            )
            if layer < L - 1:
                emb = tup_set(
                    emb, layer + 1, emb[layer + 1].at[batch.push_idx].set(
                        jnp.where(valid, pad_cols(out[:r_pad], D), 0.0
                                  ).astype(emb[layer + 1].dtype)))
            else:
                out_table = out_table.at[batch.push_idx].set(
                    jnp.where(valid, out[:r_pad], 0.0)
                )
            return HistoryState(emb, emb_ag), out_table

        return fn

    def _m0_table(self, params, x_table):
        """Once-per-sweep layer-0 cache table: ``layer0_cache_input`` applied
        to the WHOLE feature table (a single [N, F] x [F, D] MXU pass),
        padded to the cache width with a zero trash row.  Replaces the
        per-batch recomputation of m0 over every batch's ~whole-graph
        neighborhood in the global-column sweep."""
        D = self.hist_dim
        m0 = self.layer0_cache_input(params, x_table[:-1])
        m0 = pad_cols(m0.astype(jnp.float32), D)
        return jnp.concatenate([m0, jnp.zeros((1, D), m0.dtype)])

    def _refresh_batch_step_global(self, layer: int, vr: bool,
                                   push_m0: bool = False):
        """Per-batch refresh body over GLOBAL-column hybrid batches
        (loader ``global_cols``): aggregation slots gather straight from the
        [N+1, D] cache tables in their storage dtype — no per-batch
        [C_pad, D] x_in materialization, no f32 upcast of the gathered
        neighborhood (the two dominant costs of the products-scale sweep,
        docs/RESULTS.md r3 trace).  ``emb[0]`` is written wholesale by the
        caller (the m0 table IS M_in[0] for every node), so layer 0 here
        only writes M_ag[0]/out pushes."""
        L = self.cfg.num_layers
        D = self.hist_dim

        def fn(params, state, hist, x_table, out_table,
               batch: SubgraphBatch, m0_table):
            adj = batch.adj
            r_pad = adj.num_rows
            valid = (jnp.arange(r_pad) < batch.batch_size)[:, None]
            emb, emb_ag = hist.emb, hist.emb_ag
            src = m0_table if layer == 0 else emb[layer]
            # uniform-dtype aggregation over the table (cols beyond the
            # layer's true width are zero in the cache, so aggregating the
            # full width and slicing after is exact)
            adjc = adj
            if adj.ell_vals.dtype != src.dtype:
                # cast_values is ext/incidence-aware — a bucketed adj keeps
                # every value-carrying level in the uniform dtype
                adjc = adj.cast_values(src.dtype)
            ag = self.vr_aggregate(adjc, src).astype(jnp.float32)  # [R_pad, D]
            dim = self.layer_input_dim(layer)
            if push_m0 and layer == 0 and (vr or self.needs_x0):
                # partial-refresh (subset) mode: keep the (M_in, M_ag) pair
                # consistent per cluster — per-batch emb[0] rows instead of
                # the wholesale table write
                m0_rows = jnp.take(m0_table, batch.push_idx, axis=0)
                emb = tup_set(emb, 0, emb[0].at[batch.push_idx].set(
                    jnp.where(valid, m0_rows, 0.0).astype(emb[0].dtype)))
            if vr:
                emb_ag = tup_set(
                    emb_ag, layer, emb_ag[layer].at[batch.push_idx].set(
                        jnp.where(valid, ag, 0.0
                                  ).astype(emb_ag[layer].dtype)))
            # self rows (raw x at layer 0 — forward_layer applies the
            # layer-0 transform itself; cached inputs above)
            if layer == 0:
                x_self = jnp.take(x_table, batch.push_idx, axis=0).astype(
                    jnp.float32)
            else:
                x_self = jnp.take(emb[layer], batch.push_idx, axis=0)[
                    :, :dim].astype(jnp.float32)
            x0_ib = None
            if self.needs_x0 and layer > 0:
                x0_ib = jnp.take(emb[0], batch.push_idx, axis=0)[
                    :, : self.x0_dim].astype(jnp.float32)
            out = self.forward_layer(params, state, layer, x_self, x0_ib,
                                     adj, True, pre_agg=ag[:, :dim])
            if layer < L - 1:
                emb = tup_set(
                    emb, layer + 1, emb[layer + 1].at[batch.push_idx].set(
                        jnp.where(valid, pad_cols(out[:r_pad], D), 0.0
                                  ).astype(emb[layer + 1].dtype)))
            else:
                out_table = out_table.at[batch.push_idx].set(
                    jnp.where(valid, out[:r_pad], 0.0))
            return HistoryState(emb, emb_ag), out_table

        return fn

    def _refresh_all_scan_global_fn(self, vr: bool, nchunks: int,
                                    push_m0: bool = False):
        """The ENTIRE global-column refresh sweep as one jitted program:
        m0 table computed once, ``emb[0]`` set wholesale (or pushed
        per-batch under partial refresh), then an unrolled layer loop
        scanning every resident batch chunk."""
        key = (vr, nchunks, push_m0, "all-global")
        if key in self._refresh_fns:
            return self._refresh_fns[key]
        L = self.cfg.num_layers
        steps = [self._refresh_batch_step_global(layer, vr, push_m0)
                 for layer in range(L)]

        def fn(params, state, hist, x_table, out_table, chunks):
            m0 = self._m0_table(params, x_table)
            if not push_m0 and (vr or self.needs_x0):
                hist = hist._replace(emb=tup_set(
                    hist.emb, 0, m0.astype(hist.emb[0].dtype)))
            for layer in range(L):
                def body(carry, batch, _step=steps[layer]):
                    h, o = _step(params, state, carry[0], x_table, carry[1],
                                 batch, m0)
                    return (h, o), None

                for stack in chunks:
                    (hist, out_table), _ = jax.lax.scan(
                        body, (hist, out_table), stack)
            return hist, out_table

        jfn = jax.jit(fn, donate_argnums=(2, 4))
        self._refresh_fns[key] = jfn
        return jfn

    def _m0_set_fn(self, vr: bool, wholesale: bool):
        """Jitted (m0 table, optionally emb[0]-updated hist) builder for the
        non-resident global-column refresh paths."""
        key = (vr, wholesale, "m0set")
        if key in self._refresh_fns:
            return self._refresh_fns[key]

        def fn(params, x_table, hist):
            m0 = self._m0_table(params, x_table)
            if wholesale and (vr or self.needs_x0):
                hist = hist._replace(emb=tup_set(
                    hist.emb, 0, m0.astype(hist.emb[0].dtype)))
            return m0, hist

        jfn = jax.jit(fn, donate_argnums=(2,))
        self._refresh_fns[key] = jfn
        return jfn

    def _refresh_layer_scan_global_fn(self, layer: int, vr: bool,
                                      push_m0: bool):
        """Whole-layer global-column refresh scanning the stacked batches."""
        key = (layer, vr, push_m0, "scan-global")
        if key in self._refresh_fns:
            return self._refresh_fns[key]
        step = self._refresh_batch_step_global(layer, vr, push_m0)

        def fn(params, state, hist, x_table, out_table, batch_stack, m0):
            def body(carry, batch):
                h, o = step(params, state, carry[0], x_table, carry[1],
                            batch, m0)
                return (h, o), None

            (hist, out_table), _ = jax.lax.scan(
                body, (hist, out_table), batch_stack)
            return hist, out_table

        jfn = jax.jit(fn, donate_argnums=(2, 4))
        self._refresh_fns[key] = jfn
        return jfn

    def _refresh_layer_fn_global(self, layer: int, vr: bool, push_m0: bool):
        """Jitted single-batch global-column refresh pass."""
        key = (layer, vr, push_m0, "global")
        if key in self._refresh_fns:
            return self._refresh_fns[key]
        jfn = jax.jit(self._refresh_batch_step_global(layer, vr, push_m0),
                      donate_argnums=(2, 4))
        self._refresh_fns[key] = jfn
        return jfn

    def _refresh_layer_fn(self, layer: int, vr: bool, use_aggregation: bool):
        """Jitted single-batch refresh pass (used by subclass overrides and
        heterogeneous-shape loaders)."""
        key = (layer, vr, use_aggregation)
        if key in self._refresh_fns:
            return self._refresh_fns[key]
        jfn = jax.jit(self._refresh_batch_step(layer, vr, use_aggregation),
                      donate_argnums=(2, 4))
        self._refresh_fns[key] = jfn
        return jfn

    def _refresh_layer_scan_fn(self, layer: int, vr: bool, use_aggregation: bool):
        """Whole-layer refresh as ONE jitted program scanning over the stacked
        eval batches — collapses per-batch dispatches (significant when the
        host-device link has latency, e.g. hundreds of dispatches per epoch
        through a remote tunnel)."""
        key = (layer, vr, use_aggregation, "scan")
        if key in self._refresh_fns:
            return self._refresh_fns[key]
        step = self._refresh_batch_step(layer, vr, use_aggregation)

        def fn(params, state, hist, x_table, out_table, batch_stack):
            def body(carry, batch):
                h, o = step(params, state, carry[0], x_table, carry[1], batch)
                return (h, o), None

            (hist, out_table), _ = jax.lax.scan(
                body, (hist, out_table), batch_stack
            )
            return hist, out_table

        jfn = jax.jit(fn, donate_argnums=(2, 4))
        self._refresh_fns[key] = jfn
        return jfn

    def _refresh_all_scan_fn(self, vr: bool, use_aggregation: bool,
                             nchunks: int):
        """The ENTIRE refresh sweep as one jitted program: an unrolled layer
        loop, each layer scanning over every resident batch chunk.  The
        layer barrier stays (layer l+1 reads OB rows layer l wrote for
        *other* batches), but all L x nchunks dispatches collapse to one —
        the per-dispatch latency of a remote-tunnel link otherwise
        dominates the sweep (VERDICT r1 #5)."""
        key = (vr, use_aggregation, nchunks, "all")
        if key in self._refresh_fns:
            return self._refresh_fns[key]
        L = self.cfg.num_layers
        steps = [self._refresh_batch_step(layer, vr, use_aggregation)
                 for layer in range(L)]

        def fn(params, state, hist, x_table, out_table, chunks):
            for layer in range(L):
                def body(carry, batch, _step=steps[layer]):
                    h, o = _step(params, state, carry[0], x_table, carry[1],
                                 batch)
                    return (h, o), None

                for stack in chunks:
                    (hist, out_table), _ = jax.lax.scan(
                        body, (hist, out_table), stack)
            return hist, out_table

        jfn = jax.jit(fn, donate_argnums=(2, 4))
        self._refresh_fns[key] = jfn
        return jfn

    #: feature width of the x0 cache (overridden where needs_x0)
    x0_dim = 0

    def refresh(
        self,
        params: Params,
        state: State,
        x_table: jnp.ndarray,
        loader,
        hist: HistoryState,
        out_table: Optional[jnp.ndarray] = None,
        vr: bool = False,
        use_aggregation: bool = True,
        scan: bool = True,
        subset=None,
        host_logits: bool = True,
    ) -> Tuple[Optional[np.ndarray], HistoryState, jnp.ndarray]:
        """Layer-wise sweep over all eval batches: recompute every layer's
        history (and, with ``vr=True``, the M_in/M_ag caches) and return the
        full-graph logits.

        ``host_logits=False`` skips the host readback of the [N, C] logits
        (returns ``None`` in its place) — callers computing metrics on
        device (utils.metrics.split_metrics_device) only need the returned
        ``out_table``; at products scale the readback dominated eval wall
        clock through a slow link (docs/RESULTS.md).

        ``subset`` (optional batch indices) refreshes only those batches —
        the partial-refresh path (Trainer ``refresh_frac``): skipped
        clusters keep their previous caches and out_table logits, the
        bounded-staleness contract GAS already lives with.

        Reference: ``mini_inference`` (base.py:509-603) /
        ``mini_inference_vr`` (e.g. gcn.py:335-410); called once before
        training to fill the caches and after every training epoch
        (main.py:210-215, 231-236).
        """
        n = loader.data.num_nodes  # may differ from cfg for inductive eval
        if out_table is None:
            out_table = jnp.zeros((n + 1, self.cfg.out_channels), jnp.float32)
        batches = list(loader)
        if subset is not None:
            batches = [batches[i] for i in subset]
        # scanned path needs homogeneous batch shapes (loader buckets
        # guarantee this unless a bucket grew mid-materialization) and no
        # subclass refresh override (PNA_JK customizes the final layer)
        ref_leaves, ref_def = jax.tree_util.tree_flatten(batches[0].device)
        homogeneous = True
        for b in batches[1:]:
            leaves, tdef = jax.tree_util.tree_flatten(b.device)
            if tdef != ref_def or any(
                l.shape != r.shape for l, r in zip(leaves, ref_leaves)
            ):
                homogeneous = False
                break
        per_batch_bytes = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize for l in ref_leaves
        )
        total_bytes = per_batch_bytes * len(batches)
        # trainers size this from measured HBM headroom (the fixed default
        # silently demoted bytes-heavy stacks to per-batch dispatch)
        budget = getattr(self, "_refresh_hbm_budget", 1_500_000_000)
        # batches already living on the device (loader device cache) make
        # chunk (re)stacking a pure HBM copy — scanning then costs no host
        # transfers, only ~L*total_bytes of on-chip copies, and saves
        # len(batches)*L dispatches (90 ms each through a remote tunnel:
        # the 72 s products-scale eval sweep, docs/RESULTS.md)
        on_device = all(isinstance(l, jax.Array) for l in ref_leaves)
        # non-resident chunked scanning of HOST batches restages every chunk
        # once per LAYER (L x transfers); the per-batch path transfers each
        # batch once per refresh.  Only scan host batches when the stacks
        # stay resident or the batch count is small enough that restaging
        # is cheap.
        use_scan = (
            scan and homogeneous and len(batches) > 1
            and (on_device or total_bytes <= budget or len(batches) <= 64)
            and type(self)._refresh_layer_fn == ScalableGNN._refresh_layer_fn
        )
        # global-column batches (loader global_cols) MUST go through the
        # global steps — their adjacency columns index the node table, not
        # the batch-local x_in space.  The loader only engages the format
        # for the sum/mean family with plain-hybrid eval adjacencies.
        global_mode = bool(getattr(loader, "uses_global_cols", False))
        if global_mode:
            assert use_aggregation, (
                "global-column eval batches require aggregation; build the "
                "eval loader with global_cols=False for no-agg ablations")
        # subset (partial refresh) keeps per-cluster (M_in, M_ag) pairs
        # consistent by pushing emb[0] rows per batch instead of wholesale
        push_m0 = subset is not None
        # introspection for probes/tests (scripts/probes, test_trainer_features)
        self._last_refresh_plan = {
            "use_scan": use_scan, "on_device": on_device,
            "homogeneous": homogeneous, "n_batches": len(batches),
            "per_batch_mb": round(per_batch_bytes / 1e6, 2),
            "budget_mb": round(budget / 1e6, 1),
            "global_cols": global_mode,
        }
        if use_scan:
            # chunk the scan so the staged batch stack stays within the HBM
            # budget; the tail chunk is padded by repeating the last batch
            # (refresh pushes are idempotent, so repeats are harmless)
            chunk = max(1, min(len(batches), budget // max(per_batch_bytes, 1)))
            # balance chunk sizes (150 batches at cap 93 -> 2x75, not 93+57
            # padded to 93+93: padding repeats are idempotent but not free)
            n_chunks = -(-len(batches) // chunk)
            chunk = -(-len(batches) // n_chunks)
            devs = [b.device for b in batches]
            while len(devs) % chunk:
                devs.append(devs[-1])
            resident = len(devs) * per_batch_bytes <= budget
            self._last_refresh_plan.update(chunk=chunk, resident=resident)

            def make_chunk(i):
                return jax.tree.map(
                    lambda *xs: jnp.stack(xs), *devs[i : i + chunk]
                )

            chunk_starts = list(range(0, len(devs), chunk))
            cached = [make_chunk(i) for i in chunk_starts] if resident else None
            from incagg_gnn_tpu.utils.prefetch import prefetch

            if resident and global_mode:
                _heartbeat()
                jfn = self._refresh_all_scan_global_fn(vr, len(cached),
                                                       push_m0)
                hist, out_table = jfn(
                    params, state, hist, x_table, out_table, cached
                )
            elif resident:
                # whole sweep in ONE dispatch (layer loop unrolled inside)
                _heartbeat()
                jfn = self._refresh_all_scan_fn(vr, use_aggregation,
                                                len(cached))
                hist, out_table = jfn(
                    params, state, hist, x_table, out_table, cached
                )
            elif global_mode:
                m0, hist = self._m0_set_fn(vr, not push_m0)(
                    params, x_table, hist)
                for layer in range(self.cfg.num_layers):
                    _heartbeat()
                    jfn = self._refresh_layer_scan_global_fn(
                        layer, vr, push_m0)
                    stacks = prefetch(
                        (make_chunk(i) for i in chunk_starts), depth=1
                    )
                    for stack in stacks:
                        hist, out_table = jfn(
                            params, state, hist, x_table, out_table, stack,
                            m0)
            else:
                for layer in range(self.cfg.num_layers):
                    _heartbeat()
                    jfn = self._refresh_layer_scan_fn(
                        layer, vr, use_aggregation)
                    # stage the next chunk on a background thread while the
                    # device works on the current one
                    stacks = prefetch(
                        (make_chunk(i) for i in chunk_starts), depth=1
                    )
                    for stack in stacks:
                        hist, out_table = jfn(
                            params, state, hist, x_table, out_table, stack
                        )
        elif global_mode:
            m0, hist = self._m0_set_fn(vr, not push_m0)(params, x_table, hist)
            for layer in range(self.cfg.num_layers):
                jfn = self._refresh_layer_fn_global(layer, vr, push_m0)
                for hb in batches:
                    _heartbeat()
                    hist, out_table = jfn(
                        params, state, hist, x_table, out_table, hb.device, m0
                    )
        else:
            for layer in range(self.cfg.num_layers):
                jfn = self._refresh_layer_fn(layer, vr, use_aggregation)
                for hb in batches:
                    _heartbeat()
                    hist, out_table = jfn(
                        params, state, hist, x_table, out_table, hb.device
                    )
        logits = np.asarray(out_table[:n]) if host_logits else None
        return logits, hist, out_table
