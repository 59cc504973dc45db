"""GCNII (GCN2) with GAS and Reverb/VR training (reference: models/gcn2.py).

Layer math (PyG ``GCN2Conv(normalize=False)``, the initial-residual +
identity-mapping model of Chen et al. 2020):

    x̂   = (1 − α) · (A @ x)           # propagate phase
    x̂0  = α · x_0
    shared_weights:   out = (1−β_l)(x̂ + x̂0) + β_l (x̂ + x̂0) W₁
    unshared:         out = (1−β_l) x̂ + β_l x̂ W₁ + (1−β_l) x̂0 + β_l x̂0 W₂
    β_l = log(θ/l + 1)

The reference relies on a *locally patched* PyG that splits GCN2Conv into
``propagate`` / ``forward_after_propagate`` / ``forward_no_neighbor`` phases
(gcn2.py:159,257,306 — stock PyG has no such methods; SURVEY §2.9).  Here the
split is first-class: :func:`gcn2_update` is the post-propagation phase, and
the VR forward substitutes the incremental aggregation
``A_ib @ (x − M_in) + M_ag`` for the propagate phase (gcn2.py:255).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from incagg_gnn_tpu.history import HistoryState
from incagg_gnn_tpu.models.base import BaseConfig, ScalableGNN
from incagg_gnn_tpu.models.nn import (
    batchnorm,
    batchnorm_init,
    dropout,
    linear,
    linear_init,
    pad_rows,
)
from incagg_gnn_tpu.ops.agg import edge_counts, spmm
from incagg_gnn_tpu.ops.spmm import PaddedAdj


@dataclasses.dataclass(frozen=True)
class GCN2Config(BaseConfig):
    alpha: float = 0.1
    theta: float = 0.5
    shared_weights: bool = True
    drop_input: bool = True
    batch_norm: bool = False
    residual: bool = False


def gcn2_update(p, cfg: GCN2Config, layer: int, x_hat: jnp.ndarray,
                x0: jnp.ndarray) -> jnp.ndarray:
    """Post-propagation phase of GCN2Conv (the patched PyG
    ``forward_after_propagate``, gcn2.py:257): identity-mix with x_0 and
    weight transform.  ``x_hat`` is the aggregated input ``A @ x``."""
    beta = math.log(cfg.theta / (layer + 1) + 1.0)
    x_hat = (1.0 - cfg.alpha) * x_hat
    x0 = cfg.alpha * x0[: x_hat.shape[0]]
    if cfg.shared_weights:
        s = x_hat + x0
        return (1.0 - beta) * s + beta * jnp.dot(
            s, p["w1"], preferred_element_type=jnp.float32
        )
    out = (1.0 - beta) * x_hat + beta * jnp.dot(
        x_hat, p["w1"], preferred_element_type=jnp.float32
    )
    return out + (1.0 - beta) * x0 + beta * jnp.dot(
        x0, p["w2"], preferred_element_type=jnp.float32
    )


def gcn2_no_neighbor(p, cfg: GCN2Config, layer: int, x: jnp.ndarray,
                     x0: jnp.ndarray) -> jnp.ndarray:
    """The ``use_aggregation=False`` ablation (patched PyG
    ``forward_no_neighbor``, gcn2.py:159): skip propagation entirely."""
    return gcn2_update(p, cfg, layer, x, x0)


class GCN2(ScalableGNN):
    cfg: GCN2Config
    needs_x0 = True
    vr_reduce = "sum"

    def __init__(self, cfg: GCN2Config):
        super().__init__(cfg)
        self.x0_dim = cfg.hidden_channels

    def init(self, rng):
        c = self.cfg
        keys = jax.random.split(rng, c.num_layers + 2)
        convs = []
        for i in range(c.num_layers):
            p = {"w1": linear_init(keys[i], c.hidden_channels, c.hidden_channels,
                                   bias=False, init="glorot")["w"]}
            if not c.shared_weights:
                k2 = jax.random.fold_in(keys[i], 1)
                p["w2"] = linear_init(k2, c.hidden_channels, c.hidden_channels,
                                      bias=False, init="glorot")["w"]
            convs.append(p)
        bns_p, bns_s = [], []
        for _ in range(c.num_layers):
            bp, bs = batchnorm_init(c.hidden_channels)
            bns_p.append(bp)
            bns_s.append(bs)
        params = {
            "convs": convs,
            "bns": bns_p,
            "lins": [
                linear_init(keys[-2], c.in_channels, c.hidden_channels),
                linear_init(keys[-1], c.hidden_channels, c.out_channels),
            ],
        }
        return params, {"bns": bns_s}

    def layer_input_dim(self, layer: int) -> int:
        return self.cfg.hidden_channels

    def layer0_cache_input(self, params, x):
        # M_in[0] = relu(lin0(x)) (gcn2.py:451, 462)
        return jax.nn.relu(linear(params["lins"][0], x))

    def reg_mask(self, params):
        # gcn2.py:61-67: reg = convs + bns, nonreg = lins
        return {
            "convs": jax.tree.map(lambda _: True, params["convs"]),
            "bns": jax.tree.map(lambda _: True, params["bns"]),
            "lins": jax.tree.map(lambda _: False, params["lins"]),
        }

    def _post(self, params, state, layer, h, x_prev, valid, training):
        c = self.cfg
        new_bn = state["bns"][layer]
        if c.batch_norm:
            h, new_bn = batchnorm(params["bns"][layer], state["bns"][layer], h,
                                  valid, training)
        if c.residual:
            h = h + x_prev[: h.shape[0]]
        return jax.nn.relu(h), new_bn

    # ---------------- GAS forward (gcn2.py:78-185) ----------------
    def forward_gas(self, params, state, x, batch, hist_emb, rng, training,
                    aggregate_combined=True, use_aggregation=True):
        c = self.cfg
        r_pad = batch.adj.num_rows
        valid = jnp.arange(r_pad) < batch.batch_size
        nk = c.num_layers + 3
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))

        if c.drop_input:
            x = dropout(keys[next(k)], x, c.dropout, training)
        x = x0 = jax.nn.relu(linear(params["lins"][0], x))
        x = dropout(keys[next(k)], x, c.dropout, training)

        new_bns = list(state["bns"])
        if use_aggregation:
            adj = batch.adj if aggregate_combined else batch.adj.mask_in_batch(batch.batch_size)
            for l in range(c.num_layers - 1):
                h = gcn2_update(params["convs"][l], c, l, spmm(adj, x), x0)
                h, new_bns[l] = self._post(params, state, l, h, x, valid, training)
                x, hist_emb = self.push_and_pull(hist_emb, l + 1, h, batch)
                x = dropout(keys[next(k)], x, c.dropout, training)
            h = gcn2_update(params["convs"][-1], c, c.num_layers - 1, spmm(adj, x), x0)
        else:
            # no-neighbor ablation: IB rows only (gcn2.py:150-182)
            x = x[:r_pad]
            x0 = x0[:r_pad]
            for l in range(c.num_layers - 1):
                h = gcn2_no_neighbor(params["convs"][l], c, l, x, x0)
                h, new_bns[l] = self._post(params, state, l, h, x, valid, training)
                x = dropout(keys[next(k)], h, c.dropout, training)
            h = gcn2_no_neighbor(params["convs"][-1], c, c.num_layers - 1, x, x0)

        h, new_bns[-1] = self._post(params, state, c.num_layers - 1, h, x, valid, training)
        h = dropout(keys[next(k)], h, c.dropout, training)
        out = linear(params["lins"][1], h)

        n_ib, n_ob = edge_counts(batch.adj, batch.batch_size)
        aux = {"num_in_batch_neighbors": n_ib,
               "num_out_batch_neighbors": n_ob}
        return out, {"bns": new_bns}, hist_emb, aux

    # ---------------- VR forward (gcn2.py:187-323) ----------------
    def forward_vr(self, params, state, x, batch, hist: HistoryState, rng,
                   training, drift_norm: int = 2):
        c = self.cfg
        adj = batch.adj
        r_pad = adj.num_rows
        c_pad = batch.n_id.shape[0]
        valid = jnp.arange(r_pad) < batch.batch_size
        nk = c.num_layers + 3
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))

        if c.drop_input:
            x = dropout(keys[next(k)], x, c.dropout, training)
        x = x0 = jax.nn.relu(linear(params["lins"][0], x))
        x = dropout(keys[next(k)], x, c.dropout, training)

        new_bns = list(state["bns"])
        drift = jnp.zeros(())
        for l in range(c.num_layers):
            x_ib = x[:r_pad]
            m_in, m_ag = self.vr_pull(hist, l, batch, x_ib.shape[1])
            d = x_ib - m_in
            drift += self.drift_term(d, batch, drift_norm)
            x_hat = spmm(adj, pad_rows(d, c_pad)) + m_ag
            h = gcn2_update(params["convs"][l], c, l, x_hat, x0[:r_pad])
            if l < c.num_layers - 1:
                h, new_bns[l] = self._post(params, state, l, h, x_ib, valid, training)
                x = dropout(keys[next(k)], h, c.dropout, training)
            else:
                h, new_bns[l] = self._post(params, state, l, h, x_ib, valid, training)
                h = dropout(keys[next(k)], h, c.dropout, training)
                out = linear(params["lins"][1], h)

        aux = {"drift": drift / c.num_layers}
        return out, {"bns": new_bns}, aux

    # ---------------- layer-wise eval (gcn2.py:325-374) ----------------
    def forward_layer(self, params, state, layer, x, x0_ib, adj,
                      use_aggregation=True, pre_agg=None):
        c = self.cfg
        if layer == 0:
            x = x0_full = jax.nn.relu(linear(params["lins"][0], x))
            x0_ib = x0_full[: adj.num_rows]
        if use_aggregation:
            agg = pre_agg if pre_agg is not None else spmm(adj, x)
            h = gcn2_update(params["convs"][layer], c, layer, agg, x0_ib)
        else:
            h = gcn2_no_neighbor(params["convs"][layer], c, layer,
                                 x[: adj.num_rows], x0_ib)
        if c.batch_norm:
            h, _ = batchnorm(params["bns"][layer], state["bns"][layer], h, None,
                             training=False)
        if c.residual and h.shape[-1] == x.shape[-1]:
            h = h + x[: h.shape[0]]
        h = jax.nn.relu(h)
        if layer == c.num_layers - 1:
            h = linear(params["lins"][1], h)
        return h
