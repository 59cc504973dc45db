"""Sharded Reverb training with host-DRAM (spilled) history caches.

Composes the two memory tiers (VERDICT r2 item 9): the spatial slab
sharding of :class:`~incagg_gnn_tpu.parallel.spatial.ShardedVRTrainer`
with the host-offload cache residency of
:class:`~incagg_gnn_tpu.train.spill_trainer.SpillVRTrainer` — for cache
footprints beyond a *shard's* HBM on small meshes (``2·L·N·D / n_dev``
bytes vs per-chip HBM).  Reference counterpart: the pinned-CPU histories +
AsyncIOPool that are the reference's only operating mode
(history.py:17-18, pool.py:15-123), here per mesh shard.

Residency model:

- the per-layer ``M_in``/``M_ag`` tables live in HOST memory in slab row
  layout (``[n_dev * slab, D]`` numpy, cache dtype);
- **VR training** needs only the batch rows of every layer's tables
  (IB-local pulls): each round stages ``[n_dev, L, R_pad, D]`` pull
  stacks (host gather → ``device_put`` sharded over the mesh axis) and
  feeds them to the shard-mapped step as :class:`StreamedPulls` — VR
  training never writes the caches, so nothing returns;
- **GAS training** (r4, VERDICT r3 #6): per round each device's IB+OB
  batch rows are staged ``[n_dev, L, C_pad, D]`` from the host tables;
  same-round cross-shard freshness (the HBM path's lockstep
  push-then-exchange) is reproduced EXACTLY by halo-exchanging this
  round's fresh pushes with a validity flag column and splicing them over
  the staged rows (models/base.py push_and_pull, combined
  ``_stream_pulled`` + ``_shard_halo`` branch); IB pushes return as
  row-aligned accumulators and are written back chunk-contiguously
  (reference pool.py:101-123 write-back semantics);
- **refresh** runs the STANDARD sharded halo refresh
  (``_make_refresh_layer`` — static all_to_all HaloPlans, pipelined
  exchange) one layer at a time over a *synthetic* HistoryState: only the
  tables that layer touches (``emb[0]``, ``emb[l]``, ``emb[l+1]``,
  ``emb_ag[l]``) are staged to HBM; every other layer slot is a
  one-row-per-device dummy.  Peak device cache residency is therefore
  ~4 tables instead of ``2·L`` (2.5x smaller at L=5), while the compute
  path is byte-identical to the HBM trainer.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from incagg_gnn_tpu.history import HistoryState
from incagg_gnn_tpu.models.base import StreamedPulls
from incagg_gnn_tpu.parallel.spatial import ShardedVRTrainer
from incagg_gnn_tpu.train.trainer import TrainerConfig


class ShardedSpillVRTrainer(ShardedVRTrainer):
    _alloc_device_hist = False

    def __init__(self, model, data, cfg: TrainerConfig, mesh=None,
                 n_devices: Optional[int] = None, log: bool = False):
        super().__init__(model, data, cfg, mesh=mesh, n_devices=n_devices,
                         log=log)
        from incagg_gnn_tpu.history import resolve_dtype
        import ml_dtypes  # noqa: F401  (np bf16 dtype support)

        self._np_dtype = np.dtype(resolve_dtype(cfg.hist_dtype))
        L, D = model.cfg.num_layers, model.hist_dim
        rows = self.layout.num_rows
        # host slab tables replace the device cache (freed here)
        self.host_emb: List[np.ndarray] = [
            np.zeros((rows, D), self._np_dtype) for _ in range(L)]
        self.host_emb_ag: List[np.ndarray] = [
            np.zeros((rows, D), self._np_dtype) for _ in range(L)]
        self.hist = None
        self._spill_step_fn = None
        self._dummy_dtype = resolve_dtype(cfg.hist_dtype)

    # ------------------------------------------------------------------
    # training: staged pulls
    # ------------------------------------------------------------------
    def _make_spill_step(self):
        axis = self.axis
        P_ = P
        rep, node = P_(), P_(axis)
        node2 = P_(axis, None)

        def local_step(params, opt_state, state, pulls, batch, x_tab, y_tab,
                       tm_tab, rng):
            batch = jax.tree.map(lambda a: a[0] if a.ndim > 0 else a, batch)
            pulls = StreamedPulls(m_in=pulls.m_in[0], m_ag=pulls.m_ag[0])
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            return self._vr_step_core(params, opt_state, state, pulls,
                                      batch, x_tab, y_tab, tm_tab, rng)

        from jax import shard_map

        batch_spec = jax.tree.map(lambda _: P_(axis), self._train_stacks[0])
        pulls_spec = StreamedPulls(m_in=P_(axis), m_ag=P_(axis))
        y_spec = node if self.y_tab.ndim == 1 else node2
        smapped = shard_map(
            local_step, mesh=self.mesh,
            in_specs=(rep, rep, rep, pulls_spec, batch_spec, node2, y_spec,
                      node, rep),
            out_specs=(rep, rep, rep, rep, rep),
        )
        return jax.jit(smapped, donate_argnums=(0, 1, 2))

    def _stage_round_pulls(self, round_idx: int) -> StreamedPulls:
        """Host-gather every device's batch rows across all layers:
        ``[n_dev, L, R_pad, D]`` f32, sharded over the mesh axis."""
        L = self.model.cfg.num_layers
        stack = self._train_stacks[round_idx]
        # push_idx is slab-LOCAL; global row = d*slab + local
        push = np.asarray(stack.push_idx)  # [nd, R_pad]
        rows = push + (np.arange(self.n_dev)[:, None] * self.layout.slab)
        m_in = np.stack([
            np.stack([self.host_emb[l][rows[d]] for l in range(L)])
            for d in range(self.n_dev)]).astype(np.float32)
        m_ag = np.stack([
            np.stack([self.host_emb_ag[l][rows[d]] for l in range(L)])
            for d in range(self.n_dev)]).astype(np.float32)
        sh = NamedSharding(self.mesh, P(self.axis))
        return StreamedPulls(m_in=jax.device_put(jnp.asarray(m_in), sh),
                             m_ag=jax.device_put(jnp.asarray(m_ag), sh))

    # ------------------------------------------------------------------
    # GAS mode (r4, VERDICT r3 #6 — the last {GAS,VR}x{HBM,spill}x
    # {1-chip,sharded} cube cell): host tables hold the caches; per round
    # each device's batch rows (IB+OB, global row space) are host-gathered
    # into a [n_dev, L, C_pad, D] pull stack, and EXACT HBM parity for
    # same-round cross-shard freshness comes from the fresh-push halo
    # exchange spliced inside push_and_pull (models/base.py: the
    # _stream_pulled + _shard_halo combined branch).  IB pushes return as
    # row-aligned accumulators and are written back chunk-contiguously
    # (reference pool.py:101-123 write_async semantics).
    # ------------------------------------------------------------------
    def _make_spill_gas_step(self):
        from incagg_gnn_tpu.parallel.spatial import _make_exchange_vjp
        from incagg_gnn_tpu.train.steps import masked_loss

        model, cfg, axis = self.model, self.cfg, self.axis
        L, D = model.cfg.num_layers, model.hist_dim
        slab_rows = self.layout.slab  # incl. the trailing trash row
        pushed_slots: set = set()

        def local_step(params, opt_state, state, pulled, batch, halo, x_tab,
                       y_tab, tm_tab, rng):
            batch = jax.tree.map(lambda a: a[0] if a.ndim > 0 else a, batch)
            halo = jax.tree.map(lambda a: a[0], halo)
            pulled = pulled[0]  # [L, C_pad, D]
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            exchange = _make_exchange_vjp(halo, axis, self.halo_wire)
            x = exchange(x_tab)
            y = jnp.take(y_tab, batch.push_idx, axis=0)
            mask = jnp.take(tm_tab, batch.push_idx, axis=0)
            mask = mask & (
                jnp.arange(batch.push_idx.shape[0]) < batch.batch_size)
            acc0 = tuple(
                jnp.zeros((batch.push_idx.shape[0], D), jnp.float32)
                for _ in range(L))

            def loss_fn(p):
                model._stream_pulled = pulled
                model._stream_pushed_slots = pushed_slots
                model._shard_halo = exchange
                model._spill_slab_rows = slab_rows
                try:
                    out, new_state, acc, aux = model.forward_gas(
                        p, state, x, batch, acc0, rng, True,
                        cfg.aggregate_combined, cfg.use_aggregation)
                finally:
                    model._stream_pulled = None
                    model._stream_pushed_slots = None
                    model._shard_halo = None
                    model._spill_slab_rows = None
                loss, n = masked_loss(out, y, mask, self.multilabel)
                return loss, (new_state, acc, n)

            (loss, (new_state, acc, n)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = jax.tree.map(lambda g: g * n, grads)
            n_tot = jax.lax.psum(n, axis)
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g, axis) / jnp.maximum(n_tot, 1.0),
                grads)
            loss_tot = jax.lax.psum(loss * n, axis) / jnp.maximum(n_tot, 1.0)
            new_state = jax.tree.map(
                lambda a, b: jax.lax.pmean(b, axis), state, new_state)
            import optax

            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # leading device axis so the stacked output is [nd, R_pad, D]
            acc = jax.tree.map(lambda t: t[None], acc)
            return new_params, new_opt, new_state, acc, loss_tot, n_tot

        from jax import shard_map

        P_ = P
        rep, node, node2 = P_(), P_(self.axis), P_(self.axis, None)
        batch_spec = jax.tree.map(lambda _: P_(axis), self._train_stacks[0])
        halo_spec = jax.tree.map(lambda _: P_(axis), self._train_halos[0])
        acc_spec = tuple(P_(axis) for _ in range(L))
        y_spec = node if self.y_tab.ndim == 1 else node2
        smapped = shard_map(
            local_step, mesh=self.mesh,
            in_specs=(rep, rep, rep, P_(axis), batch_spec, halo_spec, node2,
                      y_spec, node, rep),
            out_specs=(rep, rep, rep, acc_spec, rep, rep),
        )
        return jax.jit(smapped, donate_argnums=(0, 1, 2)), pushed_slots

    def _stage_gas_round_pulls(self, round_idx: int) -> jnp.ndarray:
        """[n_dev, L, C_pad, D] f32: each device's batch rows (global row
        space n_id, IB+OB) of layers 1..L-1 from the host tables (layer 0
        reads x_tab on device; slot 0 stays zero)."""
        L = self.model.cfg.num_layers
        stack = self._train_stacks[round_idx]
        n_id = np.asarray(stack.n_id)  # [nd, C_pad] global rows
        nd, c_pad = n_id.shape
        out = np.zeros((nd, L, c_pad, self.model.hist_dim), np.float32)
        for d in range(nd):
            for l in range(1, L):
                out[d, l] = self.host_emb[l][n_id[d]]
        sh = NamedSharding(self.mesh, P(self.axis))
        return jax.device_put(jnp.asarray(out), sh)

    def _train_epoch_gas_spill(self) -> Dict[str, float]:
        import time

        if self._spill_step_fn is None:
            self._spill_step_fn, self._gas_traced_slots = (
                self._make_spill_gas_step())
            self._gas_push_slots = None
        total_loss = total_n = 0.0
        t0 = time.perf_counter()
        lay = self.layout
        # identical round-order shuffle as the HBM GAS epoch (lockstep
        # equivalence requires the same permutation stream)
        order = np.random.default_rng(
            (self.cfg.seed, getattr(self, "_epoch", 0))
        ).permutation(len(self._train_stacks))
        self._epoch = getattr(self, "_epoch", 0) + 1
        for i in order:
            pulls = self._stage_gas_round_pulls(i)
            self.rng, key = jax.random.split(self.rng)
            (self.params, self.opt_state, self.state, acc, loss, n) = (
                self._spill_step_fn(
                    self.params, self.opt_state, self.state, pulls,
                    self._train_stacks[i], self._train_halos[i],
                    self.x_tab, self.y_tab, self.tm_tab, key))
            if self._gas_push_slots is None:
                self._gas_push_slots = sorted(self._gas_traced_slots)
            # write back each device's fresh IB rows chunk-contiguously
            stack = self._train_stacks[i]
            push = np.asarray(stack.push_idx)  # [nd, R_pad] slab-LOCAL
            bss = np.asarray(stack.batch_size).reshape(-1)
            for slot in self._gas_push_slots:
                a = np.asarray(acc[slot])  # [nd, R_pad, D]
                for d in range(self.n_dev):
                    bs = int(bss[d])
                    if bs:
                        rows = push[d, :bs] + d * lay.slab
                        self.host_emb[slot][rows] = a[d, :bs].astype(
                            self._np_dtype)
            total_loss += float(loss) * float(n)
            total_n += float(n)
        dt = time.perf_counter() - t0
        self._steps_since_refresh = getattr(
            self, "_steps_since_refresh", 0) + len(self._train_stacks)
        return {"loss": total_loss / max(total_n, 1.0),
                "steps": len(self._train_stacks), "epoch_s": dt,
                "edges_per_s": sum(getattr(self, "_train_round_edges", []))
                / max(dt, 1e-9),
                "staleness_steps": self._steps_since_refresh}

    def train_epoch(self) -> Dict[str, float]:
        import time

        if not self.vr:
            return self._train_epoch_gas_spill()
        if self._spill_step_fn is None:
            self._spill_step_fn = self._make_spill_step()
        total_loss = total_n = 0.0
        t0 = time.perf_counter()
        for i in range(len(self._train_stacks)):
            pulls = self._stage_round_pulls(i)
            self.rng, key = jax.random.split(self.rng)
            (self.params, self.opt_state, self.state, loss, n) = (
                self._spill_step_fn(
                    self.params, self.opt_state, self.state, pulls,
                    self._train_stacks[i], self.x_tab, self.y_tab,
                    self.tm_tab, key))
            total_loss += float(loss) * float(n)
            total_n += float(n)
        dt = time.perf_counter() - t0
        self._steps_since_refresh = getattr(
            self, "_steps_since_refresh", 0) + len(self._train_stacks)
        return {"loss": total_loss / max(total_n, 1.0),
                "steps": len(self._train_stacks), "epoch_s": dt,
                "edges_per_s": sum(getattr(self, "_train_round_edges", []))
                / max(dt, 1e-9),
                "staleness_steps": self._steps_since_refresh}

    # ------------------------------------------------------------------
    # refresh: per-layer staging through the standard halo refresh
    # ------------------------------------------------------------------
    def _stage_table(self, host: np.ndarray) -> jnp.ndarray:
        return jax.device_put(jnp.asarray(host), self._hist_sh)

    def refresh(self, host_logits: bool = True) -> Optional[np.ndarray]:
        self._steps_since_refresh = 0
        if getattr(self, "_eval_rounds_stacked", None) is None:
            self._stack_eval_rounds()
        L = self.model.cfg.num_layers
        emb0_dev = self._stage_table(self.host_emb[0])
        def mk_dummy():
            # distinct buffers: the refresh donates the hist pytree, and a
            # shared dummy would be donated twice in one call
            return jax.device_put(
                jnp.zeros((self.n_dev, self.model.hist_dim),
                          self._dummy_dtype), self._hist_sh)

        for layer in range(L):
            # synthetic per-layer history: only the tables this layer pass
            # touches are real (see module docstring)
            emb = [mk_dummy() for _ in range(L)]
            emb_ag = [mk_dummy() for _ in range(L)]
            emb[0] = emb0_dev
            if layer > 0:
                emb[layer] = self._stage_table(self.host_emb[layer])
            if layer < L - 1:
                emb[layer + 1] = self._stage_table(self.host_emb[layer + 1])
            emb_ag[layer] = self._stage_table(self.host_emb_ag[layer])
            hist = HistoryState(emb=tuple(emb), emb_ag=tuple(emb_ag))
            if layer not in self._refresh_fns:
                self._refresh_fns[layer] = self._make_refresh_layer(layer)
            hist, self.out_tab = self._refresh_fns[layer](
                self.params, self.state, hist, self.x_tab, self.out_tab,
                self._eval_rounds_stacked, self._halo_plans_stacked)
            # write back what the pass produced.  emb[0] stays resident for
            # the whole sweep (every layer's x0 reads it) — but the call
            # donated the previous buffer, so re-capture the returned one
            emb0_dev = hist.emb[0]
            if layer == 0:
                self.host_emb[0] = np.asarray(emb0_dev).astype(self._np_dtype)
            if layer < L - 1:
                self.host_emb[layer + 1] = np.asarray(
                    hist.emb[layer + 1]).astype(self._np_dtype)
            self.host_emb_ag[layer] = np.asarray(
                hist.emb_ag[layer]).astype(self._np_dtype)
            del hist
        if not host_logits:
            return None
        out_rows = np.asarray(self.out_tab)
        valid = self.layout.row_to_node >= 0
        logits = np.zeros((self.data.num_nodes, out_rows.shape[1]),
                          np.float32)
        logits[self.layout.row_to_node[valid]] = out_rows[valid]
        return logits

    fill_history = refresh

    # ------------------------------------------------------------------
    # checkpoint protocol: host tables are plain numpy
    # ------------------------------------------------------------------
    def checkpoint_state(self):
        st = {
            "params": self.params,
            "opt_state": self.opt_state,
            "state": self.state,
            "rng": self.rng,
        }
        for l in range(self.model.cfg.num_layers):
            st[f"hist_emb_{l}"] = self.host_emb[l].astype(np.float32)
            st[f"hist_emb_ag_{l}"] = self.host_emb_ag[l].astype(np.float32)
        return st

    def restore_checkpoint(self, restored):
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.state = restored["state"]
        self.rng = restored["rng"]
        for l in range(self.model.cfg.num_layers):
            self.host_emb[l] = np.asarray(
                restored[f"hist_emb_{l}"]).astype(self._np_dtype)
            self.host_emb_ag[l] = np.asarray(
                restored[f"hist_emb_ag_{l}"]).astype(self._np_dtype)
