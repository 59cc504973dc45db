"""High-level training driver (reference: main.py).

Orchestrates: partition → permute → normalize → loaders → model/optimizer →
history fill → epoch loop (train steps + periodic layer-wise refresh + eval),
mirroring main.py:112-264 while keeping every device-side step jitted and
donated.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from incagg_gnn_tpu.graph.csr import GraphData, gcn_norm, permute
from incagg_gnn_tpu.graph.partition import partition_graph
from incagg_gnn_tpu.loader import EvalSubgraphLoader, SubgraphLoader
from incagg_gnn_tpu.models.base import ScalableGNN
from incagg_gnn_tpu.train.optim import make_optimizer
from incagg_gnn_tpu.train.steps import make_gas_train_step, make_vr_train_step
from incagg_gnn_tpu.train.tables import make_tables
from incagg_gnn_tpu.utils.metrics import compute_micro_f1


@dataclasses.dataclass
class TrainerConfig:
    """Trainer knobs (reference: conf/model/*.yaml params + CLI ++overrides,
    SURVEY §5.6 — all flags declared here, unlike the reference)."""

    num_parts: int = 8
    # "greedy" (graph-growing + FM) or "multilevel" (METIS-style V-cycle —
    # lower cuts on locality-rich real graphs, the reference's partitioner
    # family, metis.py:14)
    partition_method: str = "greedy"
    batch_size: int = 1  # clusters per training batch
    vr_update: bool = False  # False = GAS, True = Reverb/VR (conf.VR_update)
    num_neighbors: int = -1  # per-row sampling cap for GAS train loader
    max_steps: int = -1  # abort epoch after N steps (staleness knob)
    lr: float = 0.01
    reg_weight_decay: float = 0.0
    nonreg_weight_decay: float = 0.0
    grad_norm: Optional[float] = None
    edge_dropout: float = 0.0
    epochs: int = 100
    seed: int = 42
    loop: bool = True  # add self-loops (conf.model.loop)
    norm: bool = True  # gcn-normalize (conf.model.norm)
    aggregate_combined: bool = True
    use_aggregation: bool = True
    drift_norm: int = 2
    log_every: int = 1
    eval_batch_size: int = 1  # clusters per eval batch (conf.batch_size reuse)
    # cache dtype: "bfloat16" halves, "float8_e4m3"/"float8_e5m2" quarter
    # the cache HBM vs float32 (quantization error behaves like staleness
    # drift — absorbed by the VR correction, re-zeroed each refresh)
    hist_dtype: str = "float32"
    x_dtype: str = "float32"  # or "bfloat16": halves feature-gather traffic
    # (aggregations upcast to f32; layer math unchanged)
    metrics_path: Optional[str] = None  # JSONL metrics sink (SURVEY §5.5)
    # VR staleness control: extra cache refreshes inside one epoch
    # (reference: conf.period_updates_in_one_epoch, main.py:54-55)
    period_updates_in_one_epoch: int = 0
    # Adaptive staleness control (beyond the reference's fixed knobs): refresh
    # the caches mid-epoch whenever the measured per-step embedding drift
    # ||x - M_in|| / |IB| exceeds this.  Spends refresh sweeps exactly when
    # the VR approximation degrades instead of on a blind schedule.  0 = off.
    refresh_drift_threshold: float = 0.0
    # EMA blending of refreshed caches (reference:
    # update_period_hist_momentum, graphsage.py:963-976); 0 = hard overwrite
    hist_momentum: float = 0.0
    # Partial refresh: each periodic refresh sweeps only this fraction of
    # the eval batches, rotating stalest-first (round-robin), so every
    # cluster is refreshed at least once per ceil(1/frac) epochs.  Cuts the
    # refresh sweep — the post-fill wall-clock bottleneck at products scale
    # (docs/RESULTS.md) — at the cost of bounded extra staleness for the
    # skipped clusters (their caches/logits keep the previous sweep's
    # values, the same contract GAS already has).  The initial fill is
    # always complete.  1.0 = full refresh (reference behavior).
    refresh_frac: float = 1.0
    # adjacency format: "auto" picks the scatter-free hybrid ELL+COO path
    # (1.7x faster on v5e) except where COO is required (GAT attention,
    # edge dropout); or force "coo" / "hybrid"
    adj_format: str = "auto"
    # Run the whole epoch as one scanned jit (eliminates per-step dispatch;
    # needs all epoch batches staged on device).  Works in both Reverb and
    # GAS modes (GAS carries the cache through the scan).  "auto" enables it
    # when the stacked batches fit a ~1.5GB budget and neither mid-epoch
    # refresh, edge dropout, max_steps, nor NS resampling is in play.
    fused_epoch: str = "auto"  # "auto" | "on" | "off"
    # Keep the cluster->batch grouping fixed across epochs, shuffling only
    # the batch order (the reference regroups every epoch).  Lets
    # multi-cluster train batches collate once and replay device-resident —
    # kills the per-epoch host collate + restage and admits the dense tile
    # tier (loader static_groups; slightly less SGD noise than regrouping)
    static_groups: bool = False
    # Sharded-refresh halo wire packing (parallel/spatial.py::_halo_collect):
    # "dense" all_to_all pads every (src,dst) pair to the global-max halo
    # width (~2.5x payload on the wire); "ragged" moves exactly the payload
    # via lax.ragged_all_to_all (TPU-only lowering, forward-only).  "auto" =
    # ragged on TPU meshes with a single named axis, dense elsewhere.
    halo_wire: str = "auto"
    # Fail-fast watchdog around device round trips: raise DeviceTimeoutError
    # (with stall diagnostics) when a step/refresh blocks longer than this —
    # the opposite of the reference's print-and-continue on transfer errors
    # (async_cuda.cu:86-89, SURVEY §5.3).  0 disables.
    device_timeout_s: float = 0.0


class Trainer:
    """Single-stream trainer (one batch at a time).

    With ``mesh`` given, the history caches and node tables are sharded over
    the mesh's first axis (node-row sharding) and the jitted steps run under
    GSPMD, which inserts the cross-shard gather/scatter collectives for
    history pulls and pushes automatically — memory-scaling for GAS mode on
    multiple chips.  (The fully-parallel Reverb path with per-device batches
    lives in parallel/spatial.py.)
    """

    def __init__(self, model: ScalableGNN, data: GraphData, cfg: TrainerConfig,
                 mesh=None, log: bool = False):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        self.log = log
        t = time.perf_counter()

        # --- partition & permute (main.py:144-145) ---
        perm, ptr = partition_graph(data.adj_t, cfg.num_parts, seed=cfg.seed,
                                    method=cfg.partition_method)
        data = permute(data, perm)
        self.perm = perm
        self.ptr = ptr

        # --- graph transforms (main.py:147-151) ---
        if cfg.loop:
            data.adj_t = data.adj_t.set_diag()
        if cfg.norm:
            data.adj_t = gcn_norm(data.adj_t, add_self_loops=False)
        self.data = data
        self.weighted_adj = data.adj_t.value is not None
        self.multilabel = data.multilabel

        # --- loaders (main.py:158-164) ---
        train_mode = "ib" if cfg.vr_update else (
            "ns" if cfg.num_neighbors >= 0 else "gas"
        )
        # edge dropout needs COO (value-level masking).  Attention trains
        # scatter-free over the hybrid pair: gat_conv_bi's custom VJP rides
        # the transpose via the static t2f slot permutation (adj_perm)
        is_gat = model.__class__.__name__ == "GAT"
        needs_coo_train = cfg.edge_dropout > 0.0
        # dense MXU tier (ops/block.py): sum/mean refresh aggregations only —
        # GAT (edge attention) and PNA (max/min aggregators) keep hybrid.
        # Also off under a GSPMD mesh: XLA cannot shard-propagate through
        # the Pallas custom call (it would replicate the batch arrays).
        # aggregate_combined=False (IB-only ablation) masks edges per step;
        # BiBlockHybridAdj.mask_in_batch undercounts degrees on duplicate
        # (row,col) entries merged into one dense cell, so route the
        # ablation to the slot-exact hybrid/COO formats
        blockable = (model.__class__.__name__ in (
            "GCN", "GCN2", "APPNP", "GraphSAGE") and mesh is None
            and cfg.aggregate_combined)
        if cfg.adj_format == "auto":
            # hybrid's scatter-free win is bandwidth-bound and needs batch
            # rows in the tens of thousands; at tiny single-cluster batches
            # it buys nothing AND the full hybrid train step was measured
            # UNSTABLE on the v5e worker (intermittent worker crash at
            # ~1.4K rows; the COO step ran 300+ dispatches clean, and the
            # bare hybrid fwd+bwd kernel alone is also clean — see
            # docs/RESULTS.md "train-step worker-crash bisection").  Gate
            # hybrid by the largest expected train-batch row count; eval
            # sweeps (forward-only hybrid) showed no instability.
            sizes = np.sort(np.diff(ptr))
            est_rows = int(sizes[-min(cfg.batch_size, len(sizes)):].sum())
            # training rides the MXU tier too ('block' = forward + exact
            # transpose pair, ops/block.py BiBlockHybridAdj); its cost model
            # + device-cache budget still auto-reject per graph, falling
            # back to the bi-hybrid pair inside the loader
            train_fmt = ("coo" if needs_coo_train or est_rows < 4096
                         else ("block" if blockable and not is_gat
                               else "hybrid"))
            # the tier's own cost model + device-cache budget still gate it
            eval_fmt = "block-fwd" if blockable else "hybrid-fwd"
        else:
            train_fmt = eval_fmt = cfg.adj_format
            if cfg.adj_format == "hybrid":
                eval_fmt = "hybrid-fwd"
            elif cfg.adj_format == "block":
                train_fmt, eval_fmt = "block", "block-fwd"
                if needs_coo_train:
                    raise ValueError(
                        "adj_format=block is incompatible with edge_dropout"
                        " (value-level masking needs COO)")
                if not blockable:
                    raise ValueError(
                        f"adj_format=block unsupported here: model "
                        f"{model.__class__.__name__} must use sum/mean "
                        f"aggregation (GCN/GCN2/APPNP/GraphSAGE) and the "
                        f"trainer must not run under a GSPMD mesh")
        import ml_dtypes

        blk_kwargs = dict(
            # tile dtype follows the user's stated cache-precision budget;
            # fp8 caches still get f32 tiles (fp8 matmul values would add
            # adjacency error on top of the cache quantization)
            block_dtype=(ml_dtypes.bfloat16 if cfg.hist_dtype == "bfloat16"
                         else np.float32),
            block_d_hint=int(getattr(model.cfg, "hidden_channels", 256)),
            block_force=cfg.adj_format == "block",
        )
        self.train_loader = SubgraphLoader(
            data, ptr, batch_size=cfg.batch_size, mode=train_mode,
            num_neighbors=cfg.num_neighbors, shuffle=True, seed=cfg.seed,
            adj_format=train_fmt,
            adj_perm=is_gat and train_fmt == "hybrid",
            static_groups=cfg.static_groups,
            **(blk_kwargs if train_fmt == "block" else {}),
        )
        # global-column eval collate (loader.global_cols): the refresh sweep
        # gathers aggregation slots straight from the [N+1, D] cache tables
        # instead of materializing each batch's ~whole-graph x_in — the
        # sum/mean family only (pre_agg-honoring forward_layer), and only
        # for single-device trainers (the sharded refresh has its own halo
        # path; the GSPMD-mesh Trainer keeps the gather pattern GSPMD
        # already partitions)
        global_ok = (
            blockable and cfg.use_aggregation and mesh is None
            and eval_fmt in ("hybrid-fwd", "block-fwd")
        )
        self.eval_loader = EvalSubgraphLoader(
            data, ptr, batch_size=cfg.eval_batch_size, adj_format=eval_fmt,
            global_cols=global_ok,
            **(blk_kwargs if eval_fmt == "block-fwd" else {}),
        )

        # --- model / optimizer / history ---
        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_key = jax.random.split(rng)
        self.rng = rng
        self.params, self.state = model.init(init_key)
        self.tx = make_optimizer(
            model.reg_mask(self.params), cfg.lr, cfg.reg_weight_decay,
            cfg.nonreg_weight_decay, cfg.grad_norm,
        )
        self.opt_state = self.tx.init(self.params)
        from incagg_gnn_tpu.history import resolve_dtype

        self.hist = model.init_history(dtype=resolve_dtype(cfg.hist_dtype))
        x_dtype = jnp.bfloat16 if cfg.x_dtype == "bfloat16" else jnp.float32
        self.tables = make_tables(data, dtype=x_dtype)
        self.out_table = jnp.zeros(
            (data.num_nodes + 1, model.cfg.out_channels), jnp.float32
        )
        # eval batches cached in HBM whenever the headroom beyond caches +
        # tables allows: a streamed refresh restages every batch once per
        # layer, which is the dominant cost on slow host<->device links
        # (measured tunnel-bound at products scale, docs/RESULTS.md)
        try:
            dev = jax.devices()[0]
            stats = dev.memory_stats() or {}
            limit = stats.get("bytes_limit", 0)
            if not limit and dev.platform == "tpu":
                kind = dev.device_kind.lower()
                for tag, gb in (("v5 lite", 16), ("v5e", 16), ("v5p", 95),
                                ("v4", 32), ("v6", 32)):
                    if tag in kind:
                        limit = gb * 10**9
                        break
        except Exception:
            limit = 0
        if limit:
            used = sum(
                int(np.prod(a.shape)) * a.dtype.itemsize
                for a in jax.tree_util.tree_leaves(
                    (self.hist, self.tables, self.out_table))
            )
            headroom = max(int(limit * 0.85) - used, 400_000_000)
            # split the headroom between the two batch caches (they coexist
            # in HBM): eval stacks are the bigger win (restaged once per
            # LAYER when streaming) but single-cluster train batches are
            # restaged once per EPOCH — both dominate wall clock on slow
            # host<->device links (docs/RESULTS.md products-scale analysis).
            # Train batches are only cacheable for single-cluster non-NS
            # loaders (loader.__iter__); otherwise eval keeps it all.
            train_cacheable = (
                (cfg.batch_size == 1 or cfg.static_groups)
                and self.train_loader.mode != "ns"
            )
            if train_cacheable:
                self.eval_loader.hbm_budget = int(headroom * 0.6)
                self.train_loader.hbm_budget = int(headroom * 0.4)
            else:
                self.eval_loader.hbm_budget = headroom
            # the fused-epoch stacked copy coexists with the batch caches;
            # size its budget from real headroom instead of the fixed
            # default (tile-tier batches are bytes-heavy: a fixed 1.5 GB
            # silently demoted them to per-step dispatch, which costs ~60 ms
            # a step through a remote tunnel, docs/RESULTS.md)
            self._fused_budget = max(1_500_000_000, int(headroom * 0.25))
            # the refresh sweep's chunked-scan stack shares the same
            # headroom pool (models/base.py refresh budget)
            model._refresh_hbm_budget = self._fused_budget
        if mesh is not None:
            # node-row sharding of all [N+1, ...] state; GSPMD handles the
            # cross-shard pulls/pushes in the jitted steps.  Row counts are
            # padded to a mesh multiple (extra zero rows beyond the trash row
            # at index N are never addressed).
            from jax.sharding import NamedSharding, PartitionSpec as P

            nd = mesh.devices.size
            rows_pad = -(-(data.num_nodes + 1) // nd) * nd

            def pad_to(a):
                extra = rows_pad - a.shape[0]
                if extra == 0:
                    return a
                return jnp.concatenate(
                    [a, jnp.zeros((extra,) + a.shape[1:], a.dtype)]
                )

            ax = mesh.axis_names[0]
            row = NamedSharding(mesh, P(ax))
            row2 = NamedSharding(mesh, P(ax, None))
            hist_sh = NamedSharding(mesh, P(ax, None))
            hist_pad = rows_pad - self.hist.emb[0].shape[0]
            if hist_pad:
                z = jnp.zeros((hist_pad, self.hist.emb[0].shape[1]),
                              self.hist.emb[0].dtype)
                self.hist = self.hist._replace(
                    emb=tuple(jnp.concatenate([t, z]) for t in self.hist.emb),
                    emb_ag=tuple(jnp.concatenate([t, z])
                                 for t in self.hist.emb_ag),
                )
            self.hist = self.hist._replace(
                emb=tuple(jax.device_put(t, hist_sh) for t in self.hist.emb),
                emb_ag=tuple(jax.device_put(t, hist_sh)
                             for t in self.hist.emb_ag),
            )
            self.tables = self.tables._replace(
                x=jax.device_put(pad_to(self.tables.x), row2),
                y=jax.device_put(
                    pad_to(self.tables.y),
                    row if self.tables.y.ndim == 1 else row2,
                ),
                train_mask=jax.device_put(pad_to(self.tables.train_mask), row),
                val_mask=jax.device_put(pad_to(self.tables.val_mask), row),
                test_mask=jax.device_put(pad_to(self.tables.test_mask), row),
            )
            self.out_table = jax.device_put(pad_to(self.out_table), row2)

        step_kwargs = dict(
            multilabel=self.multilabel,
            edge_dropout_p=cfg.edge_dropout,
            weighted_adj=self.weighted_adj,
        )
        if cfg.vr_update:
            self._step = make_vr_train_step(
                model, self.tx, drift_norm=cfg.drift_norm, **step_kwargs
            )
        else:
            self._step = make_gas_train_step(
                model, self.tx,
                aggregate_combined=cfg.aggregate_combined,
                use_aggregation=cfg.use_aggregation,
                **step_kwargs,
            )

        # train-node counts per batch are needed host-side to skip empty
        # batches (main.py:65-66)
        self._train_mask_host = np.concatenate([data.train_mask, [False]])

        self.max_steps = (
            cfg.max_steps if cfg.max_steps != -1
            else max(1, cfg.num_parts // cfg.batch_size)
        )
        from incagg_gnn_tpu.utils.logging import MetricsLogger

        self.metrics = MetricsLogger(cfg.metrics_path)
        self._edges_trained = 0
        from incagg_gnn_tpu.utils.watchdog import Watchdog

        self.watchdog = Watchdog(cfg.device_timeout_s)
        if log:
            print(f"Trainer ready [{time.perf_counter() - t:.2f}s]")

    # ---------------- phases ----------------
    def _refresh(self, host_logits: bool = True) -> Optional[np.ndarray]:
        """Layer-wise cache refresh, optionally EMA-blended
        (update_period_hist_momentum, graphsage.py:963-976) and optionally
        partial (refresh_frac: rotating stalest-first window)."""
        self._steps_since_refresh = 0
        mom = self.cfg.hist_momentum
        # the refresh donates the live cache buffers, so the EMA base must be
        # a copy, not an alias
        old = (
            jax.tree.map(jnp.copy, self.hist) if 0.0 < mom < 1.0 else None
        )
        subset = None
        frac = self.cfg.refresh_frac
        nb = len(self.eval_loader)
        if 0.0 < frac < 1.0 and nb > 1:
            # fixed window size keeps the scanned-refresh shapes static
            w = max(1, int(np.ceil(nb * frac)))
            cur = getattr(self, "_refresh_cursor", 0)
            subset = [(cur + j) % nb for j in range(w)]
            self._refresh_cursor = (cur + w) % nb
        logits, self.hist, self.out_table = self.model.refresh(
            self.params, self.state, self.tables.x, self.eval_loader, self.hist,
            self.out_table, vr=self.cfg.vr_update,
            use_aggregation=self.cfg.use_aggregation, subset=subset,
            host_logits=host_logits,
        )
        if old is not None:
            self.hist = jax.tree.map(
                lambda o, n: ((1.0 - mom) * o.astype(jnp.float32)
                              + mom * n.astype(jnp.float32)).astype(n.dtype),
                old, self.hist,
            )
        return logits

    def fill_history(self) -> np.ndarray:
        """Initial cache fill via the layer-wise sweep (main.py:210-215);
        always a hard fill (caches start at zero)."""
        logits, self.hist, self.out_table = self.model.refresh(
            self.params, self.state, self.tables.x, self.eval_loader, self.hist,
            self.out_table, vr=self.cfg.vr_update,
            use_aggregation=self.cfg.use_aggregation,
        )
        return logits

    def _fused_epoch_ok(self, batches) -> bool:
        cfg = self.cfg
        if cfg.fused_epoch == "off":
            return False
        if (cfg.period_updates_in_one_epoch > 0 or cfg.edge_dropout > 0.0
                or cfg.refresh_drift_threshold > 0.0
                or 0 < cfg.max_steps < len(batches) or len(batches) < 2):
            return False
        # NS mode re-draws the sampled subgraphs every epoch — shapes can
        # shift between epochs and recompile the fused program each time
        if not cfg.vr_update and cfg.num_neighbors >= 0:
            return False
        # shuffled batches must be re-staged every epoch; past ~64 batches the
        # staging cost can exceed the dispatch savings (measured at 1M nodes /
        # 150 single-cluster batches: fused 155-226 s vs loop 84 s through the
        # remote-chip tunnel).  Exception: single-cluster batches held in the
        # loader's device cache are never restaged (stacking them is a
        # device-side op), so fusion always pays there.  Force with
        # fused_epoch="on".
        device_resident = (
            (cfg.batch_size == 1 or cfg.static_groups)
            and self.train_loader.mode != "ns"
            and self.train_loader._use_device_cache()
        )
        if (cfg.fused_epoch == "auto" and len(batches) > 64
                and not device_resident):
            return False
        leaves = jax.tree_util.tree_leaves(batches[0].device)
        for hb in batches[1:]:
            ls = jax.tree_util.tree_leaves(hb.device)
            if len(ls) != len(leaves) or any(
                a.shape != b.shape for a, b in zip(ls, leaves)
            ):
                return False  # a pad bucket grew mid-materialization
        per = sum(int(np.prod(l.shape)) * l.dtype.itemsize for l in leaves)
        return per * len(batches) < getattr(self, "_fused_budget",
                                            1_500_000_000)

    def _train_epoch_fused(self, batches) -> Dict[str, float]:
        """Whole epoch as one scanned jit (make_vr_epoch_scan /
        make_gas_epoch_scan)."""
        if getattr(self, "_fused_fn", None) is None:
            from incagg_gnn_tpu.train.steps import (
                make_gas_epoch_scan,
                make_vr_epoch_scan,
            )

            if self.cfg.vr_update:
                self._fused_fn = make_vr_epoch_scan(
                    self.model, self.tx, multilabel=self.multilabel,
                    drift_norm=self.cfg.drift_norm,
                )
            else:
                self._fused_fn = make_gas_epoch_scan(
                    self.model, self.tx, multilabel=self.multilabel,
                    aggregate_combined=self.cfg.aggregate_combined,
                    use_aggregation=self.cfg.use_aggregation,
                )
        stack = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[hb.device for hb in batches]
        )
        self.rng, key = jax.random.split(self.rng)
        t0 = time.perf_counter()
        if self.cfg.vr_update:
            (self.params, self.opt_state, self.state, loss, n) = self._fused_fn(
                self.params, self.opt_state, self.state, self.hist, stack,
                self.tables, key,
            )
        else:
            (self.params, self.opt_state, self.state, emb, loss, n) = (
                self._fused_fn(
                    self.params, self.opt_state, self.state, self.hist.emb,
                    stack, self.tables, key,
                )
            )
            self.hist = self.hist._replace(emb=emb)
        if self.cfg.device_timeout_s > 0:
            loss = self.watchdog.wait(loss, "fused epoch")
        loss = float(loss)  # force async dispatch BEFORE timing the epoch
        from incagg_gnn_tpu.utils.heartbeat import beat

        beat()
        dt = time.perf_counter() - t0
        self._steps_since_refresh = getattr(
            self, "_steps_since_refresh", 0) + len(batches)
        out = {"loss": float(loss), "steps": len(batches), "drift": 0.0,
               "epoch_s": dt,
               "edges_per_s": sum(hb.num_edges for hb in batches) / max(dt, 1e-9),
               "staleness_steps": self._steps_since_refresh}
        self.metrics.log("train_epoch", **out)
        return out

    def train_epoch(self) -> Dict[str, float]:
        """One training epoch (mini_train, main.py:47-96)."""
        if self.cfg.fused_epoch != "off":
            batches = list(self.train_loader)
            if self._fused_epoch_ok(batches):
                return self._train_epoch_fused(batches)
            return self._train_epoch_loop(iter(batches))
        return self._train_epoch_loop(None)

    def _train_epoch_loop(self, prebuilt) -> Dict[str, float]:
        total_loss = total_n = total_drift = 0.0
        total_edges = 0
        steps = drift_refreshes = 0
        t0 = time.perf_counter()
        # VR staleness knob: refresh caches every `period` steps inside the
        # epoch (conf.period_updates_in_one_epoch, main.py:54-55)
        period = 0
        if self.cfg.period_updates_in_one_epoch > 0:
            # period against the EFFECTIVE epoch length: with max_steps <
            # len(loader) a loader-length period would never fire at all
            # (caught by the r4 staleness stress suite — the period3 row
            # was bit-identical to the unrecovered stress row)
            eff = min(len(self.train_loader), self.max_steps)
            period = max(1, eff // self.cfg.period_updates_in_one_epoch)
        from incagg_gnn_tpu.utils.prefetch import prefetch

        from incagg_gnn_tpu.utils.heartbeat import beat

        source = prebuilt if prebuilt is not None else iter(self.train_loader)
        for hb in prefetch(source, depth=2):
            beat()
            if period and steps > 0 and steps % period == 0:
                self._refresh()
            if not self._train_mask_host[hb.n_id[: hb.batch_size]].any():
                continue
            self.rng, key = jax.random.split(self.rng)
            if self.cfg.vr_update:
                self.params, self.opt_state, self.state, metrics = self._step(
                    self.params, self.opt_state, self.state, self.hist,
                    hb.device, self.tables, key,
                )
            else:
                self.params, self.opt_state, self.state, emb, metrics = self._step(
                    self.params, self.opt_state, self.state, self.hist.emb,
                    hb.device, self.tables, key,
                )
                self.hist = self.hist._replace(emb=emb)
            if self.cfg.device_timeout_s > 0:
                metrics = self.watchdog.wait(metrics, f"train step {steps}")
            n = float(metrics["num_train"])
            total_loss += float(metrics["loss"]) * n
            total_n += n
            step_drift = float(metrics.get("drift", 0.0))
            total_drift += step_drift
            total_edges += hb.num_edges
            steps += 1
            self._steps_since_refresh = getattr(
                self, "_steps_since_refresh", 0) + 1
            # adaptive staleness control: refresh the moment drift crosses
            # the threshold instead of on a blind schedule
            if (self.cfg.refresh_drift_threshold > 0.0
                    and step_drift > self.cfg.refresh_drift_threshold):
                self._refresh()
                drift_refreshes += 1
            if steps >= self.max_steps:
                break
        dt = time.perf_counter() - t0
        out = {
            "loss": total_loss / max(total_n, 1.0),
            "steps": steps,
            "drift": total_drift / max(steps, 1),
            "drift_refreshes": drift_refreshes,
            "epoch_s": dt,
            # single-layer-equivalent aggregation throughput (true batch
            # edges, not padded slots) — SURVEY §5.5 observability targets
            "edges_per_s": total_edges / max(dt, 1e-9),
            # staleness age: train steps absorbed since the last cache
            # refresh (the VR approximation error grows with this)
            "staleness_steps": getattr(self, "_steps_since_refresh", 0),
        }
        self.metrics.log("train_epoch", **out)
        return out

    def evaluate(self) -> Dict[str, float]:
        """Layer-wise inference + cache refresh, then micro-F1 on all splits
        (main.py:231-249).  Metrics are computed ON DEVICE from the logits
        table — only three scalars come back to the host (the full [N, C]
        readback dominated eval wall clock at products scale through a
        slow link, docs/RESULTS.md)."""
        t0 = time.perf_counter()
        self._refresh(host_logits=False)
        if not hasattr(self, "_split_metrics_fn"):
            from incagg_gnn_tpu.utils.metrics import split_metrics_device

            self._split_metrics_fn = jax.jit(split_metrics_device)
        tb = self.tables
        rows = self.out_table.shape[0]
        tr, va, te = self._split_metrics_fn(
            self.out_table, tb.y[:rows], tb.train_mask[:rows],
            tb.val_mask[:rows], tb.test_mask[:rows])
        out = {"train_acc": float(tr), "val_acc": float(va),
               "test_acc": float(te)}
        self._last_eval_s = time.perf_counter() - t0  # refresh incl. sync
        self.metrics.log("eval", **out, eval_s=self._last_eval_s)
        return out

    def metrics_from_logits(self, logits: np.ndarray) -> Dict[str, float]:
        """Split accuracies from already-computed full-graph logits (in the
        trainer's permuted node order) — lets callers holding fresh
        fill_history/refresh output skip a redundant second sweep."""
        d = self.data
        out = {
            "train_acc": compute_micro_f1(logits, d.y, d.train_mask),
            "val_acc": compute_micro_f1(logits, d.y, d.val_mask),
            "test_acc": compute_micro_f1(logits, d.y, d.test_mask),
        }
        eval_s = getattr(self, "_last_eval_s", None)
        self.metrics.log(
            "eval", **out, **({"eval_s": eval_s} if eval_s is not None else {}))
        return out

    def full_forward(self, data: GraphData) -> np.ndarray:
        """Full-graph inference on a *different* graph — the inductive eval
        path (reference ``full_test``, main.py:99-102, used for PPI val/test
        graphs, main.py:244-249).  Applies the same loop/norm transforms and
        runs the layer-wise sweep with a throwaway cache."""
        return full_graph_forward(
            self.model, self.params, self.state, data,
            loop=self.cfg.loop, norm=self.cfg.norm,
            use_aggregation=self.cfg.use_aggregation,
        )

    # -- checkpoint protocol (CheckpointManager) -----------------------
    def checkpoint_state(self):
        """Complete training state: params, optimizer, BN, both history
        stacks, RNG (reference has none of this — SURVEY §5.4)."""
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "state": self.state,
            "hist_emb": self.hist.emb,
            "hist_emb_ag": self.hist.emb_ag,
            "rng": self.rng,
        }

    def restore_checkpoint(self, restored):
        from incagg_gnn_tpu.history import HistoryState

        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.state = restored["state"]
        self.hist = HistoryState(restored["hist_emb"], restored["hist_emb_ag"])
        self.rng = restored["rng"]

    def fit(self, epochs: Optional[int] = None) -> Dict[str, float]:
        """Full loop: fill → (train, refresh+eval)×epochs (main.py:226-264)."""
        epochs = self.cfg.epochs if epochs is None else epochs
        self.fill_history()
        best_val = best_test = 0.0
        history = []
        for epoch in range(epochs):
            tr = self.train_epoch()
            ev = self.evaluate()
            if ev["val_acc"] > best_val:
                best_val, best_test = ev["val_acc"], ev["test_acc"]
            history.append({**tr, **ev})
            if self.log and epoch % self.cfg.log_every == 0:
                print(
                    f"Epoch {epoch:04d} loss {tr['loss']:.4f} "
                    f"train {ev['train_acc']:.4f} val {ev['val_acc']:.4f} "
                    f"test {ev['test_acc']:.4f} (best {best_test:.4f})"
                )
        return {"best_val": best_val, "best_test": best_test, "history": history}


def full_graph_forward(
    model: ScalableGNN,
    params,
    state,
    data: GraphData,
    *,
    loop: bool = True,
    norm: bool = True,
    use_aggregation: bool = True,
) -> np.ndarray:
    """Full-graph inference on an arbitrary graph with trained parameters —
    the inductive eval primitive (reference ``full_test``, main.py:99-102:
    one whole-graph forward on PPI's separate val/test graphs).

    Works with any trainer that exposes ``model/params/state`` (HBM, spill,
    sharded); the sweep runs single-device with a throwaway cache, which is
    ample for inductive eval graphs (they are small by construction)."""
    from incagg_gnn_tpu.history import HistoryState

    if loop:
        data = dataclasses.replace(data, adj_t=data.adj_t.set_diag())
    if norm:
        data = dataclasses.replace(data, adj_t=gcn_norm(data.adj_t))
    n = data.num_nodes
    ptr = np.array([0, n], dtype=np.int64)
    loader = EvalSubgraphLoader(data, ptr, batch_size=1)
    # model sized for the training graph; build a cache sized for this one
    L, D = model.cfg.num_layers, model.hist_dim
    hist = HistoryState(
        emb=tuple(jnp.zeros((n + 1, D), jnp.float32) for _ in range(L)),
        emb_ag=tuple(jnp.zeros((n + 1, D), jnp.float32) for _ in range(L)),
    )
    tables = make_tables(data)
    # note: separate refresh-fn cache — shapes differ from training graph
    saved = model._refresh_fns
    model._refresh_fns = {}
    try:
        logits, _, _ = model.refresh(
            params, state, tables.x, loader, hist,
            vr=False, use_aggregation=use_aggregation,
        )
    finally:
        model._refresh_fns = saved
    return logits
