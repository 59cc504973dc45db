"""Jitted training-step factories (GAS and Reverb/VR).

Reference counterpart: one ``mini_train`` iteration (main.py:58-92) around
``model(...)`` / ``model.VR_call(...)``.  Here each step is a single jitted
program: feature gather, edge dropout, forward, masked loss, backward, clip +
Adam update, and (GAS only) the history push — with params/opt-state/BN-state/
history buffers donated so every update is in-place in HBM.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax

from incagg_gnn_tpu.history import HistoryState
from incagg_gnn_tpu.loader import SubgraphBatch
from incagg_gnn_tpu.models.base import ScalableGNN
from incagg_gnn_tpu.models.nn import edge_dropout
from incagg_gnn_tpu.train.tables import DeviceTables


def masked_loss(out, y, mask, multilabel: bool):
    """Mean CE (single-label) / BCE-with-logits (multi-label) over masked
    rows (reference: main.py:153-156, 80)."""
    m = mask.astype(jnp.float32)
    count = jnp.maximum(m.sum(), 1.0)
    if multilabel:
        per = optax.sigmoid_binary_cross_entropy(out, y).mean(axis=-1)
    else:
        per = optax.softmax_cross_entropy_with_integer_labels(out, y)
    return (per * m).sum() / count, m.sum()


def make_gas_train_step(
    model: ScalableGNN,
    tx: optax.GradientTransformation,
    multilabel: bool = False,
    edge_dropout_p: float = 0.0,
    weighted_adj: bool = True,
    aggregate_combined: bool = True,
    use_aggregation: bool = True,
):
    """GAS step: forward pushes layer outputs into the history and pulls OB
    rows (reference base.py:126-240); history buffer is donated."""

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def step(
        params,
        opt_state,
        state,
        hist_emb: jnp.ndarray,
        batch: SubgraphBatch,
        tables: DeviceTables,
        rng: jax.Array,
    ):
        rng_edge, rng_model = jax.random.split(rng)
        if edge_dropout_p > 0.0:
            batch = batch._replace(
                adj=batch.adj.with_values(
                    edge_dropout(rng_edge, batch.adj.vals, edge_dropout_p, True, weighted_adj)
                )
            )
        x = jnp.take(tables.x, batch.n_id, axis=0).astype(jnp.float32)
        y = jnp.take(tables.y, batch.push_idx, axis=0)
        mask = jnp.take(tables.train_mask, batch.push_idx, axis=0)
        mask = mask & (jnp.arange(batch.push_idx.shape[0]) < batch.batch_size)

        def loss_fn(p):
            out, new_state, new_emb, aux = model.forward_gas(
                p, state, x, batch, hist_emb, rng_model, True,
                aggregate_combined, use_aggregation,
            )
            loss, n = masked_loss(out, y, mask, multilabel)
            return loss, (new_state, new_emb, aux, n)

        (loss, (new_state, new_emb, aux, n)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "num_train": n, **aux}
        return new_params, new_opt_state, new_state, new_emb, metrics

    return step


def make_vr_epoch_scan(
    model: ScalableGNN,
    tx: optax.GradientTransformation,
    multilabel: bool = False,
    drift_norm: int = 2,
):
    """A whole Reverb epoch as ONE jitted program: ``lax.scan`` over the
    stacked (identically-shaped) train batches, carrying params/opt/BN state.
    Collapses per-step dispatch+transfer overhead — measured to dominate the
    per-step cost at 1M-node scale (docs/RESULTS.md).  Batches whose train
    mask is empty contribute zero gradients and leave all state untouched
    (the reference skips them host-side, main.py:65-66)."""

    def step_core(params, opt_state, state, hist, batch, tables, rng):
        x = jnp.take(tables.x, batch.n_id, axis=0).astype(jnp.float32)
        y = jnp.take(tables.y, batch.push_idx, axis=0)
        mask = jnp.take(tables.train_mask, batch.push_idx, axis=0)
        mask = mask & (jnp.arange(batch.push_idx.shape[0]) < batch.batch_size)

        def loss_fn(p):
            out, new_state, aux = model.forward_vr(
                p, state, x, batch, hist, rng, True, drift_norm
            )
            loss, n = masked_loss(out, y, mask, multilabel)
            return loss, (new_state, n)

        (loss, (new_state, n)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = n > 0

        def sel(new, old):
            return jax.tree.map(lambda a, b: jnp.where(keep, a, b), new, old)

        return sel(new_params, params), sel(new_opt_state, opt_state), sel(
            new_state, state
        ), loss, n

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def run(params, opt_state, state, hist: HistoryState, batch_stack,
            tables: DeviceTables, rng: jax.Array):
        def body(carry, batch):
            params, opt_state, state, rng = carry
            rng, key = jax.random.split(rng)
            params, opt_state, state, loss, n = step_core(
                params, opt_state, state, hist, batch, tables, key
            )
            return (params, opt_state, state, rng), (loss, n)

        (params, opt_state, state, _), (losses, ns) = jax.lax.scan(
            body, (params, opt_state, state, rng), batch_stack
        )
        total_n = jnp.maximum(ns.sum(), 1.0)
        return params, opt_state, state, (losses * ns).sum() / total_n, ns.sum()

    return run


def make_gas_epoch_scan(
    model: ScalableGNN,
    tx: optax.GradientTransformation,
    multilabel: bool = False,
    aggregate_combined: bool = True,
    use_aggregation: bool = True,
):
    """A whole GAS epoch as ONE jitted program — the GAS-mode counterpart of
    ``make_vr_epoch_scan``.  The history cache rides the scan carry: each
    step's layer pushes update it in place (donated), exactly the sequencing
    of the reference's per-step ``push_and_pull`` (base.py:380-456) without
    per-step dispatch.  Empty-train-mask batches leave params *and* cache
    untouched (the reference skips the whole batch host-side, so no pushes
    happen either, main.py:65-66)."""

    def step_core(params, opt_state, state, hist_emb, batch, tables, rng):
        x = jnp.take(tables.x, batch.n_id, axis=0).astype(jnp.float32)
        y = jnp.take(tables.y, batch.push_idx, axis=0)
        mask = jnp.take(tables.train_mask, batch.push_idx, axis=0)
        mask = mask & (jnp.arange(batch.push_idx.shape[0]) < batch.batch_size)

        def loss_fn(p):
            out, new_state, new_emb, aux = model.forward_gas(
                p, state, x, batch, hist_emb, rng, True,
                aggregate_combined, use_aggregation,
            )
            loss, n = masked_loss(out, y, mask, multilabel)
            return loss, (new_state, new_emb, n)

        (loss, (new_state, new_emb, n)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = n > 0

        def sel(new, old):
            return jax.tree.map(lambda a, b: jnp.where(keep, a, b), new, old)

        return (sel(new_params, params), sel(new_opt_state, opt_state),
                sel(new_state, state), sel(new_emb, hist_emb), loss, n)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def run(params, opt_state, state, hist_emb: jnp.ndarray, batch_stack,
            tables: DeviceTables, rng: jax.Array):
        def body(carry, batch):
            params, opt_state, state, hist_emb, rng = carry
            rng, key = jax.random.split(rng)
            params, opt_state, state, hist_emb, loss, n = step_core(
                params, opt_state, state, hist_emb, batch, tables, key
            )
            return (params, opt_state, state, hist_emb, rng), (loss, n)

        (params, opt_state, state, hist_emb, _), (losses, ns) = jax.lax.scan(
            body, (params, opt_state, state, hist_emb, rng), batch_stack
        )
        total_n = jnp.maximum(ns.sum(), 1.0)
        return (params, opt_state, state, hist_emb,
                (losses * ns).sum() / total_n, ns.sum())

    return run


def make_vr_train_step(
    model: ScalableGNN,
    tx: optax.GradientTransformation,
    multilabel: bool = False,
    edge_dropout_p: float = 0.0,
    weighted_adj: bool = True,
    drift_norm: int = 2,
):
    """Reverb/VR step on an IB-only batch: ``h = A_ib @ (x − M_in) + M_ag``
    per layer; histories are read-only during training (reference
    base.py:242-378, updates happen only in the periodic refresh)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(
        params,
        opt_state,
        state,
        hist: HistoryState,
        batch: SubgraphBatch,
        tables: DeviceTables,
        rng: jax.Array,
    ):
        rng_edge, rng_model = jax.random.split(rng)
        if edge_dropout_p > 0.0:
            batch = batch._replace(
                adj=batch.adj.with_values(
                    edge_dropout(rng_edge, batch.adj.vals, edge_dropout_p, True, weighted_adj)
                )
            )
        x = jnp.take(tables.x, batch.n_id, axis=0).astype(jnp.float32)
        y = jnp.take(tables.y, batch.push_idx, axis=0)
        mask = jnp.take(tables.train_mask, batch.push_idx, axis=0)
        mask = mask & (jnp.arange(batch.push_idx.shape[0]) < batch.batch_size)

        def loss_fn(p):
            out, new_state, aux = model.forward_vr(
                p, state, x, batch, hist, rng_model, True, drift_norm
            )
            loss, n = masked_loss(out, y, mask, multilabel)
            return loss, (new_state, aux, n)

        (loss, (new_state, aux, n)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "num_train": n, **aux}
        return new_params, new_opt_state, new_state, metrics

    return step
