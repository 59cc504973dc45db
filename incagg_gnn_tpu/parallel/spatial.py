"""Multi-chip spatially-sharded Reverb/VR training.

The reference trains all clusters sequentially on one GPU (SURVEY §2.1).
Here the cluster set is bin-packed over a device mesh (``parallel/layout``):

- histories, features, labels and masks live in slab layout
  ``[n_dev * slab, ...]`` sharded ``P('data')`` over the node axis — each
  device holds exactly its clusters' rows in HBM;
- Reverb/VR training batches are IB-only (loader mode 'ib'), so every pull a
  device makes (``M_in``/``M_ag`` of its own in-batch rows) is **local to its
  shard** — the training step needs zero cross-device data movement except a
  gradient ``psum`` over ICI;
- the periodic layer-wise refresh needs out-of-batch neighbors, which may
  live on other devices: the dynamic OB index sets are compiled into a
  **static all_to_all halo schedule** per refresh round (HaloPlan — SURVEY
  §5.7/§7 step 9: the graph analogue of ring attention's KV rotation), so
  each layer pass exchanges only halo rows over ICI, computes the batch, and
  scatters results into the local slab;
- parameters, optimizer state and BN state are replicated; gradients and BN
  running-stat updates are ``psum``/``pmean``-ed.

Everything runs under ``shard_map`` so each device executes the single-chip
model code on its local slab — the single-chip and multi-chip compute paths
are literally the same functions.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from incagg_gnn_tpu.graph.csr import GraphData, gcn_norm, permute
from incagg_gnn_tpu.graph.partition import partition_graph
from incagg_gnn_tpu.graph.relabel import relabel_one_hop, relabel_one_hop_within_batch
from incagg_gnn_tpu.history import HistoryState, tup_set
from incagg_gnn_tpu.loader import SubgraphBatch
from incagg_gnn_tpu.models.base import ScalableGNN
from incagg_gnn_tpu.models.nn import pad_cols
from incagg_gnn_tpu.ops.spmm import build_padded_adj
from incagg_gnn_tpu.parallel.layout import (
    build_shard_layout,
    build_shard_layout_hierarchical,
    scatter_table,
)
from incagg_gnn_tpu.parallel.mesh import make_mesh
from incagg_gnn_tpu.train.optim import make_optimizer
from incagg_gnn_tpu.train.steps import masked_loss
from incagg_gnn_tpu.train.trainer import TrainerConfig
from incagg_gnn_tpu.utils.metrics import compute_micro_f1


def _round_up(x: int, a: int) -> int:
    return max(a, ((x + a - 1) // a) * a)


def _halo_collect(halo, axis, src_local, wire: str = "dense"):
    """The collective half of a halo exchange: gather this device's send
    rows and move them over the mesh axis; returns the flattened
    ``[nd*H, D]`` receive buffer ``remote_pos`` indexes into.

    ``wire`` selects the on-the-wire packing (identical receive layout):

    - ``dense``: plain ``all_to_all`` — every (src, dst) pair moves the
      global-max ``H`` rows, so wire bytes are padded ~2.5x beyond the
      payload (VERDICT r2 item 4).  Runs on every backend.
    - ``ragged``: ``lax.ragged_all_to_all`` over the SAME staging layout —
      chunk j starts at ``j*H`` but only ``send_sizes[j]`` rows travel, so
      wire bytes == true payload.  The receive buffer is still ``[nd*H, D]``
      with src o's rows at ``o*H`` (``output_offsets = my_index*H`` on every
      peer), so assembly is unchanged.  TPU-only (XLA:CPU has no
      ragged-all-to-all thunk) and forward-only (no transpose rule), hence
      refresh/eval default on TPU meshes while training halos stay dense.
    """
    nd, h = halo.send_idx.shape
    send = jnp.take(src_local, halo.send_idx.reshape(-1), axis=0)
    if wire == "loopback":
        # comm-off control for scaling decomposition (scripts/scaling_bench):
        # keep the full staging gather + assembly memory traffic but skip
        # the wire — isolates the collective's wall-time contribution.
        # NUMERICALLY WRONG across >1 device (remote rows read the local
        # send staging); benchmark-only.
        return send
    if wire == "ragged":
        offs = jnp.arange(nd, dtype=jnp.int32) * h
        out = jnp.zeros_like(send)
        me = jax.lax.axis_index(axis)
        recv_flat = jax.lax.ragged_all_to_all(
            send, out, offs, halo.send_sizes,
            jnp.full((nd,), me * h, jnp.int32), halo.recv_sizes,
            axis_name=axis)
    else:
        send = send.reshape(nd, h, src_local.shape[1])
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
        recv_flat = recv.reshape(nd * h, src_local.shape[1])
    return recv_flat


def _halo_assemble(halo, src_local, recv_flat):
    """The local half: assemble the batch's [C_pad, D] input rows from the
    local slab (``local_pos``) or the receive buffer (``remote_pos``)."""
    local = jnp.take(src_local, halo.local_pos, axis=0)
    remote = jnp.take(recv_flat, halo.remote_pos, axis=0)
    return jnp.where(halo.is_local[:, None], local, remote)


def _make_exchange(halo, axis, wire: str = "dense"):
    """[slab, D] -> [C_pad, D] halo exchange for one device's HaloPlan
    (collect + assemble in one step; the refresh scan instead pipelines
    the two halves across rounds)."""

    def exchange(src_local):
        return _halo_assemble(
            halo, src_local, _halo_collect(halo, axis, src_local, wire))

    return exchange


def _make_exchange_vjp(halo, axis, wire: str = "dense"):
    """Differentiable halo exchange whose backward is the TRANSPOSED
    exchange over the same wire (VERDICT r3 #7).

    In GAS training no gradient actually flows through the halo (history
    pulls are stop_gradient, models/base.py push_and_pull — the reference's
    no_grad semantics, base.py:433), so the forward wire choice is free.
    This wrapper nevertheless defines the exact VJP so any future
    fresh-activation halo differentiates correctly on either wire:

    - cotangents on assembled OB rows scatter back into the [nd*H, D]
      receive layout (``remote_pos`` transpose),
    - travel back to their owners over the transposed collective — plain
      ``all_to_all`` is its own transpose in this symmetric chunk layout;
      ``ragged_all_to_all`` transposes by swapping send/recv sizes (the
      padding slots stay zero, so the trailing scatter adds nothing),
    - and scatter-add into the local slab rows (``send_idx`` + ``local_pos``
      transposes).

    The transpose math is grad-checked against XLA autodiff of the dense
    forward on the virtual CPU mesh (tests/test_multichip.py); the ragged
    backward is the same code path with swapped metadata.
    """
    nd, h = halo.send_idx.shape

    @jax.custom_vjp
    def exchange(src_local):
        return _halo_assemble(
            halo, src_local, _halo_collect(halo, axis, src_local, wire))

    def fwd(src_local):
        # residuals must be JAX types: shape as ints; dtype comes from g
        return exchange(src_local), src_local.shape

    def bwd(shape, g):
        dtype = g.dtype
        g_local = jnp.where(halo.is_local[:, None], g, 0)
        d_src = jnp.zeros(shape, dtype).at[halo.local_pos].add(g_local)
        g_remote = jnp.where(halo.is_local[:, None], 0, g)
        d_recv = jnp.zeros((nd * h, shape[1]), dtype).at[
            halo.remote_pos].add(g_remote)
        if wire == "ragged":
            me = jax.lax.axis_index(axis)
            offs = jnp.arange(nd, dtype=jnp.int32) * h
            d_send = jax.lax.ragged_all_to_all(
                d_recv, jnp.zeros_like(d_recv), offs, halo.recv_sizes,
                jnp.full((nd,), me * h, jnp.int32), halo.send_sizes,
                axis_name=axis)
        elif wire == "loopback":
            d_send = d_recv
        else:
            d_send = jax.lax.all_to_all(
                d_recv.reshape(nd, h, shape[1]), axis,
                split_axis=0, concat_axis=0).reshape(nd * h, shape[1])
        d_src = d_src.at[halo.send_idx.reshape(-1)].add(d_send)
        return (d_src,)

    exchange.defvjp(fwd, bwd)
    return exchange


@dataclasses.dataclass
class _DevBatch:
    """Host-side per-device batch in slab row space."""

    adj_args: tuple  # (rowptr, col, value)
    n_id_rows: np.ndarray  # node rows (global row space for refresh, local for train)
    push_idx_local: np.ndarray
    batch_size: int
    num_nodes: int


class HaloPlan(NamedTuple):
    """Static halo-exchange schedule for one refresh round (SURVEY §7 step 9:
    'turning dynamic OB index sets into static all-to-all schedules').

    Per device: ``send_idx[j]`` lists the local slab rows this device must
    send to device ``j`` (padded with the local trash row); the batch's
    ``n_id`` positions are then assembled from either the local slab
    (``is_local``/``local_pos``) or the flattened all_to_all receive buffer
    (``remote_pos`` = owner*H + slot).  Replaces the mesh-wide ``all_gather``
    (N·D traffic) with halo·D traffic over ICI.
    """

    send_idx: jnp.ndarray  # [n_dev(dst), H] int32 local rows to send
    is_local: jnp.ndarray  # [C_pad] bool
    local_pos: jnp.ndarray  # [C_pad] int32 into the local slab
    remote_pos: jnp.ndarray  # [C_pad] int32 into recv.reshape(n_dev*H, D)
    send_sizes: jnp.ndarray  # [n_dev(dst)] int32 true (unpadded) send rows
    recv_sizes: jnp.ndarray  # [n_dev(src)] int32 true rows received


class ShardedVRTrainer:
    """Data+spatial-parallel trainer over a 1-D device mesh.

    Reverb mode (cfg.vr_update=True): IB-only batches, fully shard-local
    pulls, zero cross-device data movement except the gradient psum.
    GAS mode (cfg.vr_update=False): IB+OB batches per device; layer outputs
    push into the local slab and OB rows are pulled from other slabs through
    the static halo all_to_all (batch-parallel GAS — the reference's GAS rule
    generalized to a pod slice)."""

    #: subclasses keeping the caches off-device (parallel/spill_sharded)
    #: set this False so __init__ never allocates the HBM tables at all
    _alloc_device_hist = True

    def __init__(self, model: ScalableGNN, data: GraphData, cfg: TrainerConfig,
                 mesh: Optional[Mesh] = None, n_devices: Optional[int] = None,
                 log: bool = False):
        self.vr = cfg.vr_update
        self.model = model
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        self.n_dev = self.mesh.devices.size
        # 2-D (hosts × chips) meshes: every node-axis sharding and collective
        # names the axis *tuple* — tuple-axis psum/all_to_all use host-major
        # device order, matching the hierarchical layout's dev numbering
        self.axis = (
            self.mesh.axis_names[0]
            if len(self.mesh.axis_names) == 1
            else tuple(self.mesh.axis_names)
        )
        self.chips_per_host = (
            int(self.mesh.devices.shape[1])
            if self.mesh.devices.ndim == 2 else self.n_dev
        )
        # refresh-halo wire packing: exact-payload ragged_all_to_all where
        # it lowers (TPU, single named axis), padded dense all_to_all
        # elsewhere (XLA:CPU virtual meshes, tuple-axis 2-D meshes)
        if cfg.halo_wire == "auto":
            on_tpu = all(d.platform == "tpu" for d in self.mesh.devices.flat)
            self.halo_wire = (
                "ragged" if on_tpu and isinstance(self.axis, str) else "dense"
            )
        else:
            self.halo_wire = cfg.halo_wire
        # hybrid ELL is the fast default; "coo" forced when edge dropout
        # needs edge-level values.  GAT: the VR train batches go through the
        # "bi" pack, which plumbs the t2f transpose permutation for
        # gat_conv_bi's scatter-free backward; GAS-mode GAT stays on COO
        # (the GAS stacks are forward-only hybrid, which cannot train
        # attention)
        is_gat = model.__class__.__name__ == "GAT"
        self.adj_format = (
            "coo" if (cfg.adj_format == "coo" or cfg.edge_dropout > 0.0
                      or (is_gat and not cfg.vr_update))
            else "hybrid"
        )
        self._adj_perm = is_gat and self.adj_format == "hybrid"
        # dense MXU tier for the EVAL/refresh stacks (ops/block.py): the
        # refresh runs inside shard_map, where the Pallas kernel executes
        # per-device (no GSPMD propagation issue); sum/mean models only
        _blockable = model.__class__.__name__ in (
            "GCN", "GCN2", "APPNP", "GraphSAGE")
        self._eval_block = (_blockable and self.adj_format == "hybrid"
                            and cfg.adj_format in ("auto", "block"))
        self._eval_block_force = _blockable and cfg.adj_format == "block"
        # dense tier for the VR TRAIN stacks too: forward + exact-transpose
        # tile pair (ops/block.BiBlockHybridAdj); the custom-VJP backward is
        # another per-device tile matmul inside the same shard_map.  VR
        # batches are collated once and live device-resident across epochs,
        # so the tile-inflation admission is the resident-budget check in
        # _block_buckets.  (GAS-mode sharded training keeps the hybrid/COO
        # halo path.)
        self._train_block = (self._eval_block and cfg.vr_update
                             and cfg.aggregate_combined)
        self._train_block_force = (self._eval_block_force and cfg.vr_update
                                   and cfg.aggregate_combined)

        # ---- partition / permute / transforms (as single-chip) ----
        perm, ptr = partition_graph(data.adj_t, cfg.num_parts, seed=cfg.seed,
                                    method=cfg.partition_method)
        self.perm = perm
        data = permute(data, perm)
        if cfg.loop:
            data.adj_t = data.adj_t.set_diag()
        if cfg.norm:
            data.adj_t = gcn_norm(data.adj_t, add_self_loops=False)
        self.data = data
        self.ptr = ptr
        self.multilabel = data.multilabel

        # ---- slab layout ----
        if self.mesh.devices.ndim == 2 and self.mesh.devices.shape[0] > 1:
            # hierarchy-aware placement: minimize cross-host (DCN) halo edges
            self.layout = build_shard_layout_hierarchical(
                ptr, data.adj_t.rowptr, data.adj_t.col,
                int(self.mesh.devices.shape[0]), self.chips_per_host)
        elif self.n_dev > 1:
            # flat meshes get the affinity packer too (one "host" per
            # device, count-capped): cross-DEVICE halo edges are the
            # sharded-GAS staging + wire cost, and size-only greedy packing
            # ignores them entirely (SCALING_r03: sharding overhead, not
            # communication, was the binding 21.6% term)
            self.layout = build_shard_layout_hierarchical(
                ptr, data.adj_t.rowptr, data.adj_t.col, self.n_dev, 1)
        else:
            self.layout = build_shard_layout(ptr, self.n_dev)
        lay = self.layout

        # ---- sharded tables ----
        row_x = scatter_table(lay, data.x.astype(np.float32))
        if data.y.ndim == 1:
            row_y = scatter_table(lay, data.y.astype(np.int32))
        else:
            row_y = scatter_table(lay, data.y.astype(np.float32))
        row_tm = scatter_table(lay, data.train_mask.astype(bool), fill=False)
        row_vm = scatter_table(lay, data.val_mask.astype(bool), fill=False)
        row_em = scatter_table(lay, data.test_mask.astype(bool), fill=False)

        node_sh = NamedSharding(self.mesh, P(self.axis))
        node_sh2 = NamedSharding(self.mesh, P(self.axis, None))
        self.x_tab = jax.device_put(row_x, node_sh2)
        self.y_tab = jax.device_put(row_y, node_sh if row_y.ndim == 1 else node_sh2)
        self.tm_tab = jax.device_put(row_tm, node_sh)
        self.vm_tab = jax.device_put(row_vm, node_sh)
        self.em_tab = jax.device_put(row_em, node_sh)

        # ---- sharded history ----
        from incagg_gnn_tpu.history import resolve_dtype

        hist_dtype = resolve_dtype(cfg.hist_dtype)
        L, D = model.cfg.num_layers, model.hist_dim
        hist_sh = NamedSharding(self.mesh, P(self.axis, None))
        self._hist_sh = hist_sh
        if self._alloc_device_hist:
            self.hist = HistoryState(
                emb=tuple(
                    jax.device_put(jnp.zeros((lay.num_rows, D), hist_dtype),
                                   hist_sh) for _ in range(L)),
                emb_ag=tuple(
                    jax.device_put(jnp.zeros((lay.num_rows, D), hist_dtype),
                                   hist_sh) for _ in range(L)),
            )
        else:  # spill subclass keeps the caches in host DRAM
            self.hist = None
        self.out_tab = jax.device_put(
            jnp.zeros((lay.num_rows, model.cfg.out_channels), jnp.float32), node_sh2
        )

        # ---- params / optimizer (replicated) ----
        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_key = jax.random.split(rng)
        self.rng = rng
        self.params, self.state = model.init(init_key)
        self.tx = make_optimizer(model.reg_mask(self.params), cfg.lr,
                                 cfg.reg_weight_decay, cfg.nonreg_weight_decay,
                                 cfg.grad_norm)
        self.opt_state = self.tx.init(self.params)

        # ---- batches ----
        self._build_train_batches()
        self._build_eval_batches()
        self._step_fn = None
        self._gas_step_fn = None
        self._refresh_fns: Dict = {}
        self._train_mask_host = row_tm
        if log:
            print(f"ShardedVRTrainer: {self.n_dev} devices, slab={lay.slab}, "
                  f"{self._train_rounds} train rounds, {self._eval_rounds} eval rounds")

    # ------------------------------------------------------------------
    def _clusters_of_dev(self) -> List[np.ndarray]:
        return [np.nonzero(self.layout.dev_of_cluster == d)[0]
                for d in range(self.n_dev)]

    def _group(self, clusters: np.ndarray, k: int) -> List[np.ndarray]:
        return [clusters[i : i + k] for i in range(0, len(clusters), k)] or [
            np.empty(0, np.int64)
        ]

    def _cluster_nodes(self, cids: np.ndarray) -> np.ndarray:
        if len(cids) == 0:
            return np.empty(0, np.int64)
        return np.concatenate([
            np.arange(self.ptr[c], self.ptr[c + 1], dtype=np.int64) for c in cids
        ])

    def _build_train_batches(self):
        """Per-device train batches: IB-only with slab-local indices for
        Reverb (fully shard-local pulls), or IB+OB with halo plans for GAS
        (push local, pull OB via all_to_all)."""
        if not self.vr:
            stacks, plans, rounds = self._build_gas_stacks(self.cfg.batch_size)
            self._train_stacks = stacks
            self._train_halos = plans
            self._train_rounds = rounds
            return
        lay = self.layout
        per_dev = [self._group(c, self.cfg.batch_size) for c in self._clusters_of_dev()]
        rounds = max(len(g) for g in per_dev)
        self._train_rounds = rounds
        # measure buckets
        max_r = max_e = 1
        raw: List[List[_DevBatch]] = []
        for d in range(self.n_dev):
            lst = []
            for g in per_dev[d]:
                idx = self._cluster_nodes(g)
                rowptr, col, value, n_id = relabel_one_hop_within_batch(
                    self.data.adj_t, idx)
                rows_local = lay.node_to_row[idx] - d * lay.slab
                lst.append(_DevBatch((rowptr, col, value), rows_local,
                                     rows_local, len(idx), len(idx)))
                max_r = max(max_r, len(idx))
                max_e = max(max_e, len(col))
            raw.append(lst)
        trash = lay.local_trash()
        blk_args = None
        if self._train_block:
            rb_pad = _round_up(max_r, 128)  # tile format needs 128-aligned
            blk_args = self._block_buckets(raw, rb_pad, rb_pad, rounds,
                                           force=self._train_block_force,
                                           bi=True)
        if blk_args is not None:
            r_pad = rb_pad
            fmt, fmt_args = "bi-block", blk_args
        else:
            r_pad = _round_up(max_r, 8)
            fmt_args = self._hybrid_buckets(raw, r_pad, r_pad) if self.adj_format != "coo" else None
            if fmt_args and self._adj_perm:
                fmt_args = {**fmt_args, "with_perm": True}
            fmt = "bi" if fmt_args else "coo"
        e_pad = _round_up(max_e, 8)

        stacks = []
        self._train_round_edges = []
        for i in range(rounds):
            per_round = []
            edges = 0
            for d in range(self.n_dev):
                b = raw[d][i % len(raw[d])] if raw[d] else None
                if b is not None:
                    edges += len(b.adj_args[1])
                per_round.append(
                    self._pack(b, r_pad, r_pad, e_pad, trash,
                               fmt=fmt, fmt_args=fmt_args)
                )
            self._train_round_edges.append(edges)
            stacks.append(jax.tree.map(lambda *xs: np.stack(xs), *per_round))
        self._train_stacks = [
            jax.device_put(
                jax.tree.map(jnp.asarray, s),
                jax.tree.map(lambda _: NamedSharding(self.mesh, P(self.axis)), s),
            )
            for s in stacks
        ]

    def _build_eval_batches(self):
        stacks, plans, rounds = self._build_gas_stacks(
            self.cfg.eval_batch_size, try_block=True)
        self._eval_stacks = stacks
        self._halo_plans = plans
        self._eval_rounds = rounds

    def _block_buckets(self, raw, r_pad, c_pad, rounds, force=None,
                       bi=False):
        """Decide + size the dense tier for the sharded stacks: one
        thresh/k/ovf/nb bucket across every device's batches (the scans
        stack them), gated by the cost model on the largest batch and a
        per-device resident-tile budget (all rounds live in HBM).  With
        ``bi``, also sizes the exact-transpose direction (train stacks)."""
        import ml_dtypes

        from incagg_gnn_tpu.ops.block import (
            marginal_thresh, measure_block_tier, plan_block_tier_rb,
            transpose_csr_host)
        from incagg_gnn_tpu.ops.ell import ell_buckets

        force = self._eval_block_force if force is None else force
        a_dtype = (ml_dtypes.bfloat16 if self.cfg.hist_dtype == "bfloat16"
                   else np.float32)
        ai = np.dtype(a_dtype).itemsize
        d_hint = int(self.model.hist_dim)
        batches = [b for lst in raw for b in lst]
        if not batches:
            return None
        big = max(batches, key=lambda b: b.adj_args[1].size)
        plan = plan_block_tier_rb(big.adj_args[0], big.adj_args[1], c_pad,
                                  x_itemsize=ai, a_itemsize=ai,
                                  d_hint=d_hint)
        if plan is not None:
            th, rb = plan
        elif force:
            th, rb = marginal_thresh(ai, ai, d_hint), 128
        else:
            return None

        def size_dir(mk_csr, rp, cp):
            nb, rem_degs = 0, []
            for b in batches:
                rowptr, col = mk_csr(b)
                total, rem_deg = measure_block_tier(rowptr, col, rp, cp, th,
                                                    rb_rows=rb)
                nb = max(nb, total)
                rem_degs.append(rem_deg)
            nb = max(nb, -(-rp // rb) * 4)  # empty-device batches: all filler
            # eval (fwd-only) sizing uses the overflow-locality kink; bi
            # train chains measured the opposite (ops/ell.choose_k)
            k, ovf = ell_buckets(rem_degs, locality_kink=not bi)
            return nb, k, ovf

        nb, k, ovf = size_dir(lambda b: b.adj_args[:2], r_pad, c_pad)
        args = {"thresh": th, "k": k, "ovf_pad": ovf, "nb_pad": nb,
                "a_dtype": a_dtype, "rb_rows": rb}
        tiles = nb
        if bi:
            nb_t, k_t, ovf_t = size_dir(
                lambda b: transpose_csr_host(*b.adj_args, c_pad)[:2],
                c_pad, r_pad)
            args.update({"k_t": k_t, "ovf_pad_t": ovf_t, "nb_pad_t": nb_t})
            tiles += nb_t
        budget = int(os.environ.get("INCAGG_SHARD_TILE_BUDGET_MB",
                                    "4096")) << 20
        if not force and tiles * rb * 128 * ai * rounds > budget:
            return None
        return args

    def _build_gas_stacks(self, group_size: int, try_block: bool = False):
        """Per-device GAS (IB+OB) batches with n_id in *global row* space
        (OB rows may belong to other slabs) + their halo plans."""
        lay = self.layout
        per_dev = [self._group(c, group_size)
                   for c in self._clusters_of_dev()]
        rounds = max(len(g) for g in per_dev)
        max_r = max_c = max_e = 1
        raw: List[List[_DevBatch]] = []
        for d in range(self.n_dev):
            lst = []
            for g in per_dev[d]:
                idx = self._cluster_nodes(g)
                rowptr, col, value, n_id = relabel_one_hop(self.data.adj_t, idx)
                n_rows = lay.node_to_row[n_id]  # global rows incl. OB
                push_local = lay.node_to_row[idx] - d * lay.slab
                lst.append(_DevBatch((rowptr, col, value), n_rows, push_local,
                                     len(idx), len(n_id)))
                max_r = max(max_r, len(idx))
                max_c = max(max_c, len(n_id))
                max_e = max(max_e, len(col))
            raw.append(lst)
        blk_args = None
        if try_block and self._eval_block:
            # 128-aligned row/col spaces are a tile-format requirement
            rb_pad = _round_up(max_r, 128)
            cb_pad = _round_up(max_c, 128)
            blk_args = self._block_buckets(raw, rb_pad, cb_pad, rounds)
        if blk_args is not None:
            r_pad, c_pad = rb_pad, cb_pad
            fmt, fmt_args = "block", blk_args
        else:
            r_pad = _round_up(max_r, 8)
            c_pad = _round_up(max_c, 8)
            fmt_args = self._hybrid_buckets(raw, r_pad, c_pad) if self.adj_format != "coo" else None
            fmt = "fwd" if fmt_args else "coo"
        e_pad = _round_up(max_e, 8)

        stacks = []
        packed_rounds = []
        for i in range(rounds):
            per_round = []
            for d in range(self.n_dev):
                b = raw[d][i % len(raw[d])] if raw[d] else None
                # global trash row for this device's slab
                gtrash = d * lay.slab + lay.local_trash()
                per_round.append(
                    self._pack(b, r_pad, c_pad, e_pad, lay.local_trash(),
                               n_id_fill=gtrash, fmt=fmt, fmt_args=fmt_args)
                )
            packed_rounds.append(per_round)
            stacks.append(jax.tree.map(lambda *xs: np.stack(xs), *per_round))
        dev_stacks = [
            jax.device_put(
                jax.tree.map(jnp.asarray, s),
                jax.tree.map(lambda _: NamedSharding(self.mesh, P(self.axis)), s),
            )
            for s in stacks
        ]
        plans = self._build_halo_plans(packed_rounds)
        return dev_stacks, plans, rounds

    def _build_halo_plans(self, packed_rounds):
        """Derive the static all-to-all halo schedule for every eval round
        from the packed batches' global-row n_id arrays."""
        lay = self.layout
        nd, slab, trash = self.n_dev, lay.slab, lay.local_trash()
        # first pass: per-round send lists + global max halo width H
        round_sends = []  # [round][src][dst] -> np.ndarray of global rows
        h_max = 1
        for per_round in packed_rounds:
            sends = [[None] * nd for _ in range(nd)]
            for d in range(nd):
                rows = per_round[d].n_id  # [C_pad] global rows (pad -> own trash)
                owner = rows // slab
                for o in range(nd):
                    if o == d:
                        continue
                    req = rows[owner == o]
                    sends[o][d] = np.unique(req)  # sorted unique
                    h_max = max(h_max, len(sends[o][d]))
            round_sends.append(sends)
        h = _round_up(h_max, 8)

        plans = []
        for per_round, sends in zip(packed_rounds, round_sends):
            per_dev_plans = []
            for d in range(nd):
                rows = per_round[d].n_id
                owner = rows // slab
                is_local = owner == d
                local_pos = np.where(is_local, rows - d * slab, trash).astype(np.int32)
                remote_pos = np.zeros(len(rows), np.int32)
                for o in range(nd):
                    if o == d:
                        continue
                    m = owner == o
                    if not m.any():
                        continue
                    # slot of each requested row within o's (sorted) send list
                    slot = np.searchsorted(sends[o][d], rows[m])
                    remote_pos[m] = o * h + slot
                send_idx = np.full((nd, h), trash, np.int32)
                send_sizes = np.zeros(nd, np.int32)
                recv_sizes = np.zeros(nd, np.int32)
                for j in range(nd):
                    if j != d and sends[d][j] is not None:
                        lst = sends[d][j]
                        send_idx[j, : len(lst)] = (lst - d * slab).astype(np.int32)
                        send_sizes[j] = len(lst)
                    if j != d and sends[j][d] is not None:
                        recv_sizes[j] = len(sends[j][d])
                per_dev_plans.append(HaloPlan(
                    send_idx=send_idx, is_local=is_local,
                    local_pos=local_pos, remote_pos=remote_pos,
                    send_sizes=send_sizes, recv_sizes=recv_sizes,
                ))
            stacked = jax.tree.map(lambda *xs: np.stack(xs), *per_dev_plans)
            plans.append(jax.device_put(
                jax.tree.map(jnp.asarray, stacked),
                jax.tree.map(lambda _: NamedSharding(self.mesh, P(self.axis)), stacked),
            ))
        return plans

    def _hybrid_buckets(self, raw, r_pad, c_pad):
        """Common ELL/overflow bucket sizes across all devices' batches."""
        from incagg_gnn_tpu.ops.ell import ell_buckets

        degs, tdegs = [], []
        for lst in raw:
            for b in lst:
                rowptr, col, _ = b.adj_args
                degs.append(np.diff(rowptr))
                tdegs.append(np.bincount(col, minlength=c_pad) if col.size
                             else np.zeros(1, np.int64))
        k, ovf = ell_buckets(degs)
        k_t, ovf_t = ell_buckets(tdegs)
        return {"k": k, "k_t": k_t, "ovf_pad": ovf, "ovf_pad_t": ovf_t}

    def _pack(self, b: Optional[_DevBatch], r_pad, c_pad, e_pad, trash_local,
              n_id_fill: Optional[int] = None, fmt: str = "coo",
              fmt_args=None) -> SubgraphBatch:
        """Pad one host batch to the bucket as numpy SubgraphBatch leaves."""
        from incagg_gnn_tpu.ops.ell import build_bi_hybrid_adj, build_hybrid_adj

        fill = trash_local if n_id_fill is None else n_id_fill
        if b is None:
            b = _DevBatch((np.zeros(1, np.int64), np.empty(0, np.int32), None),
                          np.empty(0, np.int64), np.empty(0, np.int64), 0, 0)
        rowptr, col, value = b.adj_args
        if fmt == "block":
            from incagg_gnn_tpu.ops.block import build_block_hybrid

            adj = build_block_hybrid(
                rowptr, col, value, r_pad, c_pad, thresh=fmt_args["thresh"],
                a_dtype=fmt_args["a_dtype"], k=fmt_args["k"],
                ovf_pad=fmt_args["ovf_pad"], nb_pad=fmt_args["nb_pad"],
                rb_rows=fmt_args.get("rb_rows", 128))
        elif fmt == "bi-block":
            from incagg_gnn_tpu.ops.block import build_bi_block_hybrid

            adj = build_bi_block_hybrid(
                rowptr, col, value, r_pad, c_pad, thresh=fmt_args["thresh"],
                a_dtype=fmt_args["a_dtype"], k=fmt_args["k"],
                k_t=fmt_args["k_t"], ovf_pad=fmt_args["ovf_pad"],
                ovf_pad_t=fmt_args["ovf_pad_t"], nb_pad=fmt_args["nb_pad"],
                nb_pad_t=fmt_args["nb_pad_t"],
                rb_rows=fmt_args.get("rb_rows", 128))
        elif fmt == "bi":
            adj = build_bi_hybrid_adj(rowptr, col, value, r_pad, c_pad, **fmt_args)
        elif fmt == "fwd":
            adj = build_hybrid_adj(rowptr, col, value, r_pad, c_pad,
                                   k=fmt_args["k"], ovf_pad=fmt_args["ovf_pad"])
        else:
            adj = build_padded_adj(rowptr, col, value, r_pad, c_pad, e_pad)
        adj = jax.tree.map(np.asarray, adj)
        n_id = np.full(c_pad, fill, dtype=np.int32)
        n_id[: b.num_nodes] = b.n_id_rows
        push = np.full(r_pad, trash_local, dtype=np.int32)
        push[: b.batch_size] = b.push_idx_local
        return SubgraphBatch(
            adj=adj,
            n_id=n_id,
            push_idx=push,
            batch_size=np.asarray(b.batch_size, np.int32),
            num_nodes=np.asarray(b.num_nodes, np.int32),
        )

    # ------------------------------------------------------------------
    def _vr_step_core(self, params, opt_state, state, hist, batch, x_tab,
                      y_tab, tm_tab, rng):
        """One shard-local Reverb step (inside shard_map)."""
        model, cfg, axis = self.model, self.cfg, self.axis
        x = jnp.take(x_tab, batch.n_id, axis=0)
        y = jnp.take(y_tab, batch.push_idx, axis=0)
        mask = jnp.take(tm_tab, batch.push_idx, axis=0)
        mask = mask & (jnp.arange(batch.push_idx.shape[0]) < batch.batch_size)

        def loss_fn(p):
            out, new_state, aux = model.forward_vr(
                p, state, x, batch, hist, rng, True, cfg.drift_norm)
            loss, n = masked_loss(out, y, mask, self.multilabel)
            return loss, (new_state, n)

        (loss, (new_state, n)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # weight each device's grads by its train-node count, then
        # normalize — equivalent to a global mean over train nodes
        grads = jax.tree.map(lambda g: g * n, grads)
        n_tot = jax.lax.psum(n, axis)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, axis) / jnp.maximum(n_tot, 1.0), grads)
        loss_tot = jax.lax.psum(loss * n, axis) / jnp.maximum(n_tot, 1.0)
        new_state = jax.tree.map(
            lambda a, b: jax.lax.pmean(b, axis), state, new_state)
        import optax
        updates, new_opt = self.tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, new_state, loss_tot, n_tot

    def _make_step(self):
        axis = self.axis
        P_ = P

        def local_step(params, opt_state, state, hist, batch, x_tab, y_tab,
                       tm_tab, rng):
            batch = jax.tree.map(lambda a: a[0] if a.ndim > 0 else a, batch)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            return self._vr_step_core(params, opt_state, state, hist, batch,
                                      x_tab, y_tab, tm_tab, rng)

        rep = P_()
        node = P_(axis)
        node2 = P_(axis, None)
        L_ = self.model.cfg.num_layers
        hist_spec = HistoryState(tuple(P_(axis, None) for _ in range(L_)),
                                 tuple(P_(axis, None) for _ in range(L_)))
        batch_spec = jax.tree.map(lambda _: P_(axis), self._train_stacks[0])
        y_spec = node if self.y_tab.ndim == 1 else node2

        smapped = shard_map(
            local_step, mesh=self.mesh,
            in_specs=(rep, rep, rep, hist_spec, batch_spec, node2, y_spec, node, rep),
            out_specs=(rep, rep, rep, rep, rep),
        )
        return jax.jit(smapped, donate_argnums=(0, 1, 2))

    def _make_fused_epoch(self, num_rounds: int):
        """Whole sharded Reverb epoch as one jit: lax.scan over the round
        axis inside shard_map (per-step psum collectives run inside the scan
        body), carrying params/opt/BN state."""
        axis = self.axis
        P_ = P

        def local_epoch(params, opt_state, state, hist, batch_rounds, x_tab,
                        y_tab, tm_tab, rng):
            # leading device dim 1 -> squeeze; keeps the round axis
            batch_rounds = jax.tree.map(lambda a: a[0], batch_rounds)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

            def body(carry, batch):
                params, opt_state, state, rng = carry
                rng, key = jax.random.split(rng)
                params, opt_state, state, loss, n = self._vr_step_core(
                    params, opt_state, state, hist, batch, x_tab, y_tab,
                    tm_tab, key)
                return (params, opt_state, state, rng), (loss, n)

            (params, opt_state, state, _), (losses, ns) = jax.lax.scan(
                body, (params, opt_state, state, rng), batch_rounds)
            total_n = jnp.maximum(ns.sum(), 1.0)
            return params, opt_state, state, (losses * ns).sum() / total_n, ns.sum()

        rep = P_()
        node = P_(axis)
        node2 = P_(axis, None)
        L_ = self.model.cfg.num_layers
        hist_spec = HistoryState(tuple(P_(axis, None) for _ in range(L_)),
                                 tuple(P_(axis, None) for _ in range(L_)))
        # stacked rounds: leaves [n_dev, R, ...] sharded on the device dim
        batch_spec = jax.tree.map(lambda _: P_(axis), self._train_stacks[0])
        y_spec = node if self.y_tab.ndim == 1 else node2
        smapped = shard_map(
            local_epoch, mesh=self.mesh,
            in_specs=(rep, rep, rep, hist_spec, batch_spec, node2, y_spec, node, rep),
            out_specs=(rep, rep, rep, rep, rep),
        )
        return jax.jit(smapped, donate_argnums=(0, 1, 2))

    def _make_gas_step(self):
        """Batch-parallel sharded GAS step: each device trains its own IB+OB
        batch; layer outputs are pushed into the local slab and OB rows pulled
        from other slabs via the static halo all_to_all (push_and_pull's
        _shard_halo hook); gradients are psum'd."""
        model, cfg, axis = self.model, self.cfg, self.axis

        def local_step(params, opt_state, state, hist, batch, halo, x_tab,
                       y_tab, tm_tab, rng):
            batch = jax.tree.map(lambda a: a[0] if a.ndim > 0 else a, batch)
            halo = jax.tree.map(lambda a: a[0], halo)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            # r4: train halos use the SAME wire policy as refresh (ragged
            # exact-payload on TPU meshes).  No gradient flows through the
            # exchange (history pulls are stop_gradient), and the
            # _make_exchange_vjp transpose covers any future path that does
            # differentiate through it — the old "no transpose rule" dense
            # pin was unnecessary (VERDICT r3 #7).
            exchange = _make_exchange_vjp(halo, axis, self.halo_wire)
            x = exchange(x_tab)
            y = jnp.take(y_tab, batch.push_idx, axis=0)
            mask = jnp.take(tm_tab, batch.push_idx, axis=0)
            mask = mask & (jnp.arange(batch.push_idx.shape[0]) < batch.batch_size)

            def loss_fn(p):
                model._shard_halo = exchange
                try:
                    out, new_state, new_emb, aux = model.forward_gas(
                        p, state, x, batch, hist.emb, rng, True,
                        cfg.aggregate_combined, cfg.use_aggregation)
                finally:
                    model._shard_halo = None
                loss, n = masked_loss(out, y, mask, self.multilabel)
                return loss, (new_state, new_emb, n)

            (loss, (new_state, new_emb, n)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = jax.tree.map(lambda g: g * n, grads)
            n_tot = jax.lax.psum(n, axis)
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g, axis) / jnp.maximum(n_tot, 1.0), grads)
            loss_tot = jax.lax.psum(loss * n, axis) / jnp.maximum(n_tot, 1.0)
            new_state = jax.tree.map(
                lambda a, b: jax.lax.pmean(b, axis), state, new_state)
            import optax
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_hist = HistoryState(new_emb, hist.emb_ag)
            return new_params, new_opt, new_state, new_hist, loss_tot, n_tot

        P_ = P
        rep = P_()
        node = P_(axis)
        node2 = P_(axis, None)
        L_ = self.model.cfg.num_layers
        hist_spec = HistoryState(tuple(P_(axis, None) for _ in range(L_)),
                                 tuple(P_(axis, None) for _ in range(L_)))
        batch_spec = jax.tree.map(lambda _: P_(axis), self._train_stacks[0])
        halo_spec = jax.tree.map(lambda _: P_(axis), self._train_halos[0])
        y_spec = node if self.y_tab.ndim == 1 else node2
        smapped = shard_map(
            local_step, mesh=self.mesh,
            in_specs=(rep, rep, rep, hist_spec, batch_spec, halo_spec, node2,
                      y_spec, node, rep),
            out_specs=(rep, rep, rep, hist_spec, rep, rep),
        )
        return jax.jit(smapped, donate_argnums=(0, 1, 2, 3))

    def _make_refresh_layer(self, layer: int):
        """One sharded refresh layer pass over ALL eval rounds, scanned
        inside the shard_map — one dispatch per layer instead of one per
        round × layer.  The source table rows a device needs from other
        slabs move via the **static halo all_to_all** schedule (HaloPlan) —
        halo·D traffic over ICI instead of the mesh-wide all_gather's N·D.
        Rounds write disjoint push rows and only read tables written by the
        *previous* layer, so the scan is exactly the per-round loop.

        The halo exchange is software-pipelined across rounds (VERDICT r2
        item 4 / SURVEY §7 step 9 "overlap local SpMM with boundary
        exchange"): the exchange's source table (``x_tab`` at layer 0,
        ``emb[layer]`` above — written only by the *previous* layer pass,
        never by this one) is hoisted out of the scan, so round r+1's
        collective depends only on its HaloPlan, not on round r's compute;
        the body issues collect(r+1) alongside compute(r) with the
        prefetched receive buffer carried between iterations, letting the
        TPU latency-hiding scheduler run the all_to_all under the local
        aggregation (the reference's pull-ahead discipline, pool.py:64-99,
        rebuilt over ICI)."""
        model, axis, wire = self.model, self.axis, self.halo_wire
        L, D = model.cfg.num_layers, model.hist_dim

        def local_fn(params, state, hist, x_tab, out_tab, batches, halos):
            batches = jax.tree.map(lambda a: a[0], batches)  # [R, ...] local
            halos = jax.tree.map(lambda a: a[0], halos)
            # exchange source table: constant for the whole layer pass
            if layer == 0:
                src_tab = x_tab
            else:
                src_tab = hist.emb[layer]
            # prologue: collect round 0's halo; body r computes round r from
            # the carried receive buffer while collecting round r+1's
            halo0 = jax.tree.map(lambda a: a[0], halos)
            recv0 = _halo_collect(halo0, axis, src_tab, wire)
            halos_next = jax.tree.map(
                lambda a: jnp.roll(a, -1, axis=0), halos)

            def body(carry, bh):
                hist, out_tab, recv = carry
                batch, halo, halo_next = bh
                emb, emb_ag = hist.emb, hist.emb_ag  # local slabs [L, slab, D]
                r_pad = batch.adj.num_rows
                valid = (jnp.arange(r_pad) < batch.batch_size)[:, None]
                recv_next = _halo_collect(halo_next, axis, src_tab, wire)

                def exchange(_src):
                    return _halo_assemble(halo, _src, recv)

                if layer == 0:
                    x_in = exchange(x_tab)
                    m0 = model.layer0_cache_input(params, x_in)
                    emb = tup_set(emb, 0, emb[0].at[batch.push_idx].set(
                        jnp.where(valid, pad_cols(m0[:r_pad], D), 0.0
                                  ).astype(emb[0].dtype)))
                    ag0 = model.vr_cache_value(params, 0, batch.adj, m0)
                    emb_ag = tup_set(emb_ag, 0, emb_ag[0].at[batch.push_idx].set(
                        jnp.where(valid, pad_cols(ag0, D), 0.0
                                  ).astype(emb_ag[0].dtype)))
                else:
                    dim = model.layer_input_dim(layer)
                    x_in = exchange(emb[layer])[:, :dim].astype(jnp.float32)
                    ag = model.vr_cache_value(params, layer, batch.adj, x_in)
                    emb_ag = tup_set(
                        emb_ag, layer, emb_ag[layer].at[batch.push_idx].set(
                            jnp.where(valid, pad_cols(ag, D), 0.0
                                      ).astype(emb_ag[layer].dtype)))
                x0_ib = None
                if model.needs_x0 and layer > 0:
                    x0_ib = jnp.take(emb[0], batch.push_idx, axis=0)[
                        :, : model.x0_dim].astype(jnp.float32)
                out = model.forward_layer(params, state, layer, x_in, x0_ib,
                                          batch.adj)
                if layer < L - 1:
                    emb = tup_set(
                        emb, layer + 1, emb[layer + 1].at[batch.push_idx].set(
                            jnp.where(valid, pad_cols(out[:r_pad], D), 0.0
                                      ).astype(emb[layer + 1].dtype)))
                else:
                    out_tab = out_tab.at[batch.push_idx].set(
                        jnp.where(valid, out[:r_pad], 0.0))
                return (HistoryState(emb, emb_ag), out_tab, recv_next), None

            (hist, out_tab, _), _ = jax.lax.scan(
                body, (hist, out_tab, recv0), (batches, halos, halos_next))
            return hist, out_tab

        P_ = P
        rep = P_()
        node2 = P_(axis, None)
        L_ = self.model.cfg.num_layers
        hist_spec = HistoryState(tuple(P_(axis, None) for _ in range(L_)),
                                 tuple(P_(axis, None) for _ in range(L_)))
        batch_spec = jax.tree.map(lambda _: P_(axis), self._eval_stacks[0])
        halo_spec = jax.tree.map(lambda _: P_(axis), self._halo_plans[0])
        smapped = shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(rep, rep, hist_spec, node2, node2, batch_spec, halo_spec),
            out_specs=(hist_spec, node2),
        )
        return jax.jit(smapped, donate_argnums=(2, 4))

    def _stack_eval_rounds(self):
        """Stack the per-round eval batches/halo plans along a new round
        axis (leaves [n_dev, R, ...]) so the refresh scan consumes them."""
        sh = NamedSharding(self.mesh, P(self.axis))
        self._eval_rounds_stacked = jax.device_put(
            jax.tree.map(lambda *xs: jnp.stack(xs, axis=1),
                         *self._eval_stacks),
            jax.tree.map(lambda _: sh, self._eval_stacks[0]),
        )
        self._halo_plans_stacked = jax.device_put(
            jax.tree.map(lambda *xs: jnp.stack(xs, axis=1),
                         *self._halo_plans),
            jax.tree.map(lambda _: sh, self._halo_plans[0]),
        )

    # ------------------------------------------------------------------
    def refresh(self, host_logits: bool = True) -> Optional[np.ndarray]:
        self._steps_since_refresh = 0
        if getattr(self, "_eval_rounds_stacked", None) is None:
            self._stack_eval_rounds()
        for layer in range(self.model.cfg.num_layers):
            if layer not in self._refresh_fns:
                self._refresh_fns[layer] = self._make_refresh_layer(layer)
            self.hist, self.out_tab = self._refresh_fns[layer](
                self.params, self.state, self.hist, self.x_tab,
                self.out_tab, self._eval_rounds_stacked,
                self._halo_plans_stacked)
        if not host_logits:
            return None
        out_rows = np.asarray(self.out_tab)
        valid = self.layout.row_to_node >= 0
        logits = np.zeros((self.data.num_nodes, out_rows.shape[1]), np.float32)
        logits[self.layout.row_to_node[valid]] = out_rows[valid]
        return logits

    fill_history = refresh

    def full_forward(self, data: GraphData) -> np.ndarray:
        """Inductive eval on a separate graph (reference full_test,
        main.py:99-102); the throwaway sweep runs single-device — eval
        graphs are small by construction."""
        from incagg_gnn_tpu.train.trainer import full_graph_forward

        return full_graph_forward(
            self.model, self.params, self.state, data,
            loop=self.cfg.loop, norm=self.cfg.norm,
            use_aggregation=self.cfg.use_aggregation,
        )

    def train_epoch(self) -> Dict[str, float]:
        if not self.vr:
            return self._train_epoch_gas()
        # fused path: scan over rounds in one jit when no max_steps cap
        if not (0 < self.cfg.max_steps < self._train_rounds):
            t0 = time.perf_counter()
            if getattr(self, "_fused_epoch_fn", None) is None:
                self._fused_epoch_fn = self._make_fused_epoch(self._train_rounds)
                # stack the round list once: leaves [n_dev, R, ...]
                self._train_rounds_stacked = jax.tree.map(
                    lambda *xs: jnp.stack(xs, axis=1), *self._train_stacks)
            self.rng, key = jax.random.split(self.rng)
            (self.params, self.opt_state, self.state, loss, n) = (
                self._fused_epoch_fn(
                    self.params, self.opt_state, self.state, self.hist,
                    self._train_rounds_stacked, self.x_tab, self.y_tab,
                    self.tm_tab, key))
            loss = float(loss)
            dt = time.perf_counter() - t0
            self._steps_since_refresh = getattr(
                self, "_steps_since_refresh", 0) + self._train_rounds
            return {"loss": loss, "steps": self._train_rounds, "epoch_s": dt,
                    "edges_per_s": sum(
                        getattr(self, "_train_round_edges", [])) / max(dt, 1e-9),
                    "staleness_steps": self._steps_since_refresh}
        if self._step_fn is None:
            self._step_fn = self._make_step()
        total_loss = total_n = 0.0
        total_edges = 0
        t0 = time.perf_counter()
        steps = 0
        # shuffle round order per epoch (cluster composition is static; the
        # reference shuffles batch order each epoch, main.py:158)
        order = np.random.default_rng(
            (self.cfg.seed, getattr(self, "_epoch", 0))
        ).permutation(len(self._train_stacks))
        self._epoch = getattr(self, "_epoch", 0) + 1
        for i in order:
            self.rng, key = jax.random.split(self.rng)
            (self.params, self.opt_state, self.state, loss, n) = self._step_fn(
                self.params, self.opt_state, self.state, self.hist,
                self._train_stacks[i], self.x_tab, self.y_tab, self.tm_tab, key)
            total_loss += float(loss) * float(n)
            total_n += float(n)
            total_edges += getattr(self, "_train_round_edges", [0] * (i + 1))[i]
            steps += 1
            self._steps_since_refresh = getattr(
                self, "_steps_since_refresh", 0) + 1
            if steps >= self.cfg.max_steps > 0:
                break
        dt = time.perf_counter() - t0
        return {"loss": total_loss / max(total_n, 1.0), "steps": steps,
                "epoch_s": dt, "edges_per_s": total_edges / max(dt, 1e-9),
                "staleness_steps": getattr(self, "_steps_since_refresh", 0)}

    def _train_epoch_gas(self) -> Dict[str, float]:
        if self._gas_step_fn is None:
            self._gas_step_fn = self._make_gas_step()
        total_loss = total_n = 0.0
        t0 = time.perf_counter()
        steps = 0
        order = np.random.default_rng(
            (self.cfg.seed, getattr(self, "_epoch", 0))
        ).permutation(len(self._train_stacks))
        self._epoch = getattr(self, "_epoch", 0) + 1
        for i in order:
            self.rng, key = jax.random.split(self.rng)
            (self.params, self.opt_state, self.state, self.hist, loss, n) = (
                self._gas_step_fn(
                    self.params, self.opt_state, self.state, self.hist,
                    self._train_stacks[i], self._train_halos[i],
                    self.x_tab, self.y_tab, self.tm_tab, key))
            total_loss += float(loss) * float(n)
            total_n += float(n)
            steps += 1
            if steps >= self.cfg.max_steps > 0:
                break
        return {"loss": total_loss / max(total_n, 1.0), "steps": steps,
                "epoch_s": time.perf_counter() - t0}

    def evaluate(self) -> Dict[str, float]:
        """Split metrics computed on device over the sharded logits slab —
        the host reads back three scalars, not the gathered [N, C] table
        (same rationale as Trainer.evaluate; trash/pad rows are excluded
        because their mask-table entries are False by scatter fill)."""
        self.refresh(host_logits=False)
        if not hasattr(self, "_split_metrics_fn"):
            from incagg_gnn_tpu.utils.metrics import split_metrics_device

            self._split_metrics_fn = jax.jit(split_metrics_device)
        tr, va, te = self._split_metrics_fn(
            self.out_tab, self.y_tab, self.tm_tab, self.vm_tab, self.em_tab)
        return {"train_acc": float(tr), "val_acc": float(va),
                "test_acc": float(te)}

    def metrics_from_logits(self, logits: np.ndarray) -> Dict[str, float]:
        d = self.data
        return {
            "train_acc": compute_micro_f1(logits, d.y, d.train_mask),
            "val_acc": compute_micro_f1(logits, d.y, d.val_mask),
            "test_acc": compute_micro_f1(logits, d.y, d.test_mask),
        }

    # -- checkpoint protocol (CheckpointManager) -----------------------
    def checkpoint_state(self):
        """Sharded history stacks are gathered to the host on save and
        re-sharded onto the mesh on restore (params/opt are replicated)."""
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "state": self.state,
            "hist_emb": self.hist.emb,
            "hist_emb_ag": self.hist.emb_ag,
            "rng": self.rng,
        }

    def restore_checkpoint(self, restored):
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.state = restored["state"]
        self.hist = HistoryState(
            emb=jax.device_put(restored["hist_emb"], self._hist_sh),
            emb_ag=jax.device_put(restored["hist_emb_ag"], self._hist_sh),
        )
        self.rng = restored["rng"]

    # -- per-process sharded checkpoint protocol (ShardedCheckpointManager):
    # multi-host saves must not gather the O(num_nodes) history stacks
    def replicated_checkpoint_state(self):
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "state": self.state,
            "rng": self.rng,
        }

    def restore_replicated(self, restored):
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.state = restored["state"]
        self.rng = restored["rng"]

    def hist_arrays(self):
        out = {}
        for l, t in enumerate(self.hist.emb):
            out[f"hist_emb_{l}"] = t
        for l, t in enumerate(self.hist.emb_ag):
            out[f"hist_emb_ag_{l}"] = t
        return out

    def set_hist_arrays(self, arrs):
        L = self.model.cfg.num_layers
        self.hist = HistoryState(
            emb=tuple(arrs[f"hist_emb_{l}"] for l in range(L)),
            emb_ag=tuple(arrs[f"hist_emb_ag_{l}"] for l in range(L)))

    def fit(self, epochs: Optional[int] = None) -> Dict[str, float]:
        epochs = self.cfg.epochs if epochs is None else epochs
        self.refresh()
        best_val = best_test = 0.0
        for _ in range(epochs):
            self.train_epoch()
            ev = self.evaluate()
            if ev["val_acc"] > best_val:
                best_val, best_test = ev["val_acc"], ev["test_acc"]
        return {"best_val": best_val, "best_test": best_test}
