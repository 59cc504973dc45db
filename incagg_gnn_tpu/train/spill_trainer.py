"""Reverb training with host-offloaded (spilled) history caches.

For graphs whose caches exceed device HBM (``2·L·N·D`` beyond ~10 GB), the
M_in/M_ag stacks live in host DRAM as :class:`SpilledHistory` tables — the
direct counterpart of the reference's pinned-CPU histories + AsyncIOPool
(history.py:17-18, pool.py) with the CUDA copy engine replaced by the C++
staging worker (csrc/spill.cpp) and JAX's asynchronous host→HBM transfers.

Training step: per batch, the host gathers the IB rows of all ``L`` layers'
M_in/M_ag into staging buffers *asynchronously* (prefetched one batch ahead,
overlapping the previous device step — the reference's pipelined pull,
base.py:318-323), stages them to HBM, and the jitted VR step receives them as
a :class:`StreamedPulls` argument instead of gathering from an HBM cache.

Refresh sweep: layer-by-layer over eval batches — pull layer-l rows
(IB+OB) from the host table, run ``forward_layer`` + M_ag on device, fetch the
outputs, and push them back with the chunk-contiguous (offset, count)
fast path the loader's contiguity contract guarantees (history.py:60-65).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from incagg_gnn_tpu.graph.csr import GraphData
from incagg_gnn_tpu.history_spill import SpilledHistory
from incagg_gnn_tpu.loader import HostBatch
from incagg_gnn_tpu.models.base import ScalableGNN, StreamedPulls
from incagg_gnn_tpu.models.nn import pad_cols
from incagg_gnn_tpu.train.steps import masked_loss
from incagg_gnn_tpu.utils.heartbeat import beat as _heartbeat
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig


class SpillVRTrainer(Trainer):
    """Trainer whose caches live in host DRAM (reference's operating mode).

    Reuses the standard Trainer for partitioning, loaders, params, and
    optimizer; overrides the history machinery.
    """

    def __init__(self, model: ScalableGNN, data: GraphData, cfg: TrainerConfig,
                 pool_size: int = 3, log: bool = False):
        super().__init__(model, data, cfg, log=log)
        self.vr = cfg.vr_update
        # replace the HBM caches with host tables (free the device arrays)
        self.hist = None
        L, D = model.cfg.num_layers, model.hist_dim
        n = data.num_nodes
        buf = max(self.eval_loader.buckets.cols, self.train_loader.buckets.rows) + 8
        self.spill_in: List[SpilledHistory] = [
            SpilledHistory(n, D, pool_size=pool_size, buffer_size=buf)
            for _ in range(L)
        ]
        # M_ag tables exist only in Reverb mode; GAS keeps just the
        # layer-output histories (reference base.py:67-81 vs GAS upstream)
        self.spill_ag: List[SpilledHistory] = [
            SpilledHistory(n, D, pool_size=pool_size, buffer_size=buf)
            for _ in range(L)
        ] if self.vr else []
        self._vr_step_streamed = None
        self._gas_step_streamed = None
        self._gas_push_slots: Optional[List[int]] = None
        self._refresh_layer_jit: Dict[int, object] = {}

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def _make_streamed_step(self):
        model, tx, cfg = self.model, self.tx, self.cfg
        multilabel = self.multilabel

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, opt_state, state, pulls: StreamedPulls, batch,
                 tables, rng):
            x = jnp.take(tables.x, batch.n_id, axis=0).astype(jnp.float32)
            y = jnp.take(tables.y, batch.push_idx, axis=0)
            mask = jnp.take(tables.train_mask, batch.push_idx, axis=0)
            mask = mask & (jnp.arange(batch.push_idx.shape[0]) < batch.batch_size)

            def loss_fn(p):
                out, new_state, aux = model.forward_vr(
                    p, state, x, batch, pulls, rng, True, cfg.drift_norm)
                loss, nn = masked_loss(out, y, mask, multilabel)
                return loss, (new_state, aux, nn)

            (loss, (new_state, aux, nn)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt, new_state, {
                "loss": loss, "num_train": nn, **aux}

        return step

    def _make_streamed_gas_step(self):
        """GAS step with host-resident histories: OB pulls arrive pre-staged
        (``pulled [L, C_pad, D]``) and IB pushes leave in a row-aligned
        accumulator the host writes back — the reference's shipped operating
        mode (GAS training + pinned-CPU caches + async pool,
        base.py:126-240 / pool.py)."""
        model, tx, cfg = self.model, self.tx, self.cfg
        multilabel = self.multilabel
        L, D = model.cfg.num_layers, model.hist_dim
        pushed_slots: set = set()

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, opt_state, state, pulled, batch, tables, rng):
            x = jnp.take(tables.x, batch.n_id, axis=0).astype(jnp.float32)
            y = jnp.take(tables.y, batch.push_idx, axis=0)
            mask = jnp.take(tables.train_mask, batch.push_idx, axis=0)
            mask = mask & (jnp.arange(batch.push_idx.shape[0]) < batch.batch_size)
            acc0 = tuple(jnp.zeros((batch.push_idx.shape[0], D), jnp.float32)
                         for _ in range(L))

            def loss_fn(p):
                model._stream_pulled = pulled
                model._stream_pushed_slots = pushed_slots
                try:
                    out, new_state, acc, aux = model.forward_gas(
                        p, state, x, batch, acc0, rng, True,
                        cfg.aggregate_combined, cfg.use_aggregation)
                finally:
                    model._stream_pulled = None
                    model._stream_pushed_slots = None
                loss, nn = masked_loss(out, y, mask, multilabel)
                return loss, (new_state, acc, aux, nn)

            (loss, (new_state, acc, aux, nn)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt, new_state, acc, {
                "loss": loss, "num_train": nn, **aux}

        return step, pushed_slots

    def _stage_gas_pulls(self, hb: HostBatch) -> jnp.ndarray:
        """Gather the batch's OB rows of every layer's history from the host
        tables into a ``[L, C_pad, D]`` stack aligned with ``n_id`` (OB rows
        sit at positions ``batch_size:``) — the reference's prefetch-all
        (base.py:203-204: async_pull of ``n_id[batch_size:]`` per layer)."""
        L, D = self.model.cfg.num_layers, self.model.hist_dim
        c_pad = int(np.asarray(hb.device.n_id).shape[0])
        bs = hb.batch_size
        ob = hb.n_id[bs:]
        out = np.zeros((L, c_pad, D), np.float32)
        if len(ob):
            for l in range(1, L):
                self.spill_in[l].async_pull(ob)
            for l in range(1, L):
                out[l, bs : bs + len(ob)] = np.asarray(
                    self.spill_in[l].synchronize_pull())
                self.spill_in[l].free_pull()
        return jnp.asarray(out)

    def _stage_pulls(self, hb: HostBatch) -> StreamedPulls:
        """Gather the batch's IB rows of every layer from the host tables
        (C++ worker, FIFO slots) and stage them to HBM, padded to R_pad."""
        L, D = self.model.cfg.num_layers, self.model.hist_dim
        r_pad = int(np.asarray(hb.device.push_idx).shape[0])
        idx = hb.n_id[: hb.batch_size]
        m_in = np.zeros((L, r_pad, D), np.float32)
        m_ag = np.zeros((L, r_pad, D), np.float32)
        # pipeline: issue all pulls first (async on the worker thread),
        # then consume in FIFO order (pool discipline, pool.py:64-99)
        for l in range(L):
            self.spill_in[l].async_pull(idx)
            self.spill_ag[l].async_pull(idx)
        for l in range(L):
            m_in[l, : len(idx)] = np.asarray(self.spill_in[l].synchronize_pull())
            self.spill_in[l].free_pull()
            m_ag[l, : len(idx)] = np.asarray(self.spill_ag[l].synchronize_pull())
            self.spill_ag[l].free_pull()
        return StreamedPulls(m_in=jnp.asarray(m_in), m_ag=jnp.asarray(m_ag))

    def train_epoch(self) -> Dict[str, float]:
        if not self.vr:
            return self._train_epoch_gas()
        if self._vr_step_streamed is None:
            self._vr_step_streamed = self._make_streamed_step()
        from incagg_gnn_tpu.utils.prefetch import prefetch

        total_loss = total_n = 0.0
        total_edges = steps = 0
        t0 = time.perf_counter()

        def staged():
            for hb in self.train_loader:
                if not self._train_mask_host[hb.n_id[: hb.batch_size]].any():
                    continue
                yield hb, self._stage_pulls(hb)

        for hb, pulls in prefetch(staged(), depth=2):
            _heartbeat()
            self.rng, key = jax.random.split(self.rng)
            (self.params, self.opt_state, self.state, metrics) = (
                self._vr_step_streamed(
                    self.params, self.opt_state, self.state, pulls,
                    hb.device, self.tables, key))
            n = float(metrics["num_train"])
            total_loss += float(metrics["loss"]) * n
            total_n += n
            total_edges += hb.num_edges
            steps += 1
            self._steps_since_refresh = getattr(
                self, "_steps_since_refresh", 0) + 1
            if steps >= self.max_steps:
                break
        dt = time.perf_counter() - t0
        return {"loss": total_loss / max(total_n, 1.0), "steps": steps,
                "epoch_s": dt, "edges_per_s": total_edges / max(dt, 1e-9),
                "staleness_steps": getattr(self, "_steps_since_refresh", 0)}

    def _train_epoch_gas(self) -> Dict[str, float]:
        """GAS epoch over host tables: staged OB pulls in, chunked IB pushes
        out — the sequencing of reference mini_train + push_and_pull
        (main.py:58-92, base.py:380-456).  Note pushes land before the next
        batch's pulls are CONSUMED but after they were issued, matching the
        reference's prefetch-at-step-start semantics (base.py:203-204) —
        hence staging depth 1 here (deeper prefetch would serve stale rows
        the reference would have seen fresh)."""
        if self._gas_step_streamed is None:
            self._gas_step_streamed, self._gas_traced_slots = (
                self._make_streamed_gas_step())
        total_loss = total_n = 0.0
        steps = 0
        for hb in self.train_loader:
            _heartbeat()
            if not self._train_mask_host[hb.n_id[: hb.batch_size]].any():
                continue
            pulled = self._stage_gas_pulls(hb)
            self.rng, key = jax.random.split(self.rng)
            (self.params, self.opt_state, self.state, acc, metrics) = (
                self._gas_step_streamed(
                    self.params, self.opt_state, self.state, pulled,
                    hb.device, self.tables, key))
            if self._gas_push_slots is None:
                # populated at trace time by push_and_pull's streaming branch
                self._gas_push_slots = sorted(self._gas_traced_slots)
            bs = hb.batch_size
            acc_host = np.stack([np.asarray(a) for a in acc])
            for slot in self._gas_push_slots:
                self.spill_in[slot].async_push(
                    acc_host[slot][:bs], offset=hb.offset, count=hb.count)
            n = float(metrics["num_train"])
            total_loss += float(metrics["loss"]) * n
            total_n += n
            steps += 1
            if steps >= self.max_steps:
                break
        for t in self.spill_in:
            t.synchronize_push()
        return {"loss": total_loss / max(total_n, 1.0), "steps": steps}

    # ------------------------------------------------------------------
    # layer-wise refresh against the host tables (mini_inference_vr flow)
    # ------------------------------------------------------------------
    def _layer_jit(self, layer: int):
        if layer in self._refresh_layer_jit:
            return self._refresh_layer_jit[layer]
        model = self.model
        L, D = model.cfg.num_layers, model.hist_dim
        vr = self.vr

        @jax.jit
        def fn(params, state, x_in, x0_ib, batch):
            r_pad = batch.adj.num_rows
            outs = {}
            if layer == 0 and (vr or model.needs_x0):
                # GAS needs m_in[0] only as the x0 source (GCNII residual)
                m0 = model.layer0_cache_input(params, x_in)
                outs["m_in"] = pad_cols(m0[:r_pad], D)
                if vr:
                    outs["m_ag"] = pad_cols(
                        model.vr_cache_value(params, 0, batch.adj, m0), D)
            elif vr:
                outs["m_ag"] = pad_cols(
                    model.vr_cache_value(params, layer, batch.adj, x_in), D)
            out = model.forward_layer(params, state, layer, x_in, x0_ib,
                                      batch.adj, True)
            outs["out"] = out[:r_pad]
            return outs

        self._refresh_layer_jit[layer] = fn
        return fn

    def _refresh(self) -> np.ndarray:
        self._steps_since_refresh = 0
        model = self.model
        L, D = model.cfg.num_layers, model.hist_dim
        n = self.data.num_nodes
        logits = np.zeros((n, model.cfg.out_channels), np.float32)
        x0_host: Optional[np.ndarray] = None
        if model.needs_x0:
            x0_host = np.zeros((n, model.x0_dim), np.float32)

        batches = list(self.eval_loader)
        for layer in range(L):
            fn = self._layer_jit(layer)
            # pipelined pulls: issue batch i+1's host gather before waiting
            # on batch i's, so the C++ worker overlaps the device round trip
            # (pool_size >= 2 slots; FIFO discipline as in pool.py:64-99)
            depth = 0
            if layer > 0:
                # stage pulls pool_size-1 batches ahead: the C++ worker
                # overlaps multiple host gathers with the device round trips
                pull_idx = [np.minimum(hb.n_id, n) for hb in batches]
                depth = min(self.spill_in[layer].pool_size - 1, len(batches))
                for j in range(depth):
                    self.spill_in[layer].async_pull(pull_idx[j])
            for i, hb in enumerate(batches):
                _heartbeat()
                bs = hb.batch_size
                if layer == 0:
                    x_in = jnp.take(self.tables.x, hb.device.n_id, axis=0)
                else:
                    if i + depth < len(batches):
                        self.spill_in[layer].async_pull(pull_idx[i + depth])
                    x_rows = np.asarray(self.spill_in[layer].synchronize_pull())
                    self.spill_in[layer].free_pull()
                    dim = model.layer_input_dim(layer)
                    c_pad = int(np.asarray(hb.device.n_id).shape[0])
                    xb = np.zeros((c_pad, dim), np.float32)
                    xb[: len(pull_idx[i])] = x_rows[:, :dim]
                    x_in = jnp.asarray(xb)
                x0_ib = None
                if model.needs_x0 and layer > 0:
                    r_pad = int(np.asarray(hb.device.push_idx).shape[0])
                    xb0 = np.zeros((r_pad, model.x0_dim), np.float32)
                    xb0[:bs] = x0_host[hb.n_id[:bs]]
                    x0_ib = jnp.asarray(xb0)
                outs = fn(self.params, self.state, x_in, x0_ib, hb.device)
                # chunk-contiguous pushes (offset/count contract)
                if layer == 0 and "m_in" in outs:
                    m_in_host = np.asarray(outs["m_in"])[:bs]
                    if self.vr:
                        self.spill_in[0].async_push(
                            m_in_host, offset=hb.offset, count=hb.count)
                    if model.needs_x0:
                        x0_host[hb.n_id[:bs]] = m_in_host[:, : model.x0_dim]
                if "m_ag" in outs:
                    self.spill_ag[layer].async_push(
                        np.asarray(outs["m_ag"])[:bs], offset=hb.offset,
                        count=hb.count)
                out_host = np.asarray(outs["out"])[:bs]
                if layer < L - 1:
                    if out_host.shape[1] != D:
                        padded = np.zeros((bs, D), np.float32)
                        padded[:, : out_host.shape[1]] = out_host
                        out_host = padded
                    self.spill_in[layer + 1].async_push(
                        out_host, offset=hb.offset, count=hb.count)
                else:
                    logits[hb.n_id[:bs]] = out_host
            for sp in (self.spill_in, self.spill_ag):
                for t in sp:
                    t.synchronize_push()
        return logits

    fill_history = _refresh

    # ------------------------------------------------------------------
    # checkpoint protocol: host tables replace the HBM history stacks
    # ------------------------------------------------------------------
    def checkpoint_state(self):
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "state": self.state,
            "rng": self.rng,
            "spill_in": [t.table for t in self.spill_in],
            "spill_ag": [t.table for t in self.spill_ag],
        }

    def restore_checkpoint(self, restored):
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.state = restored["state"]
        self.rng = restored["rng"]
        # in-place so any live buffer references stay valid
        for t, arr in zip(self.spill_in, restored["spill_in"]):
            t.table[:] = arr
        for t, arr in zip(self.spill_ag, restored["spill_ag"]):
            t.table[:] = arr

    def evaluate(self) -> Dict[str, float]:
        return self.metrics_from_logits(self._refresh())
