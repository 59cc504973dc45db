"""APPNP with GAS and Reverb/VR training (reference: models/appnp.py).

Predict-then-propagate: a 2-layer MLP produces ``x_0`` (out_channels wide),
then ``num_layers`` personalized-PageRank propagation steps
``x = (1 − α)·(A @ x) + α·x_0`` (appnp.py:85,89).  Histories live in
*output* space — ``hist_dim = out_channels`` (appnp.py:24 passes
``out_channels`` as the history width).  The VR rule substitutes
``A_ib @ (x − M_in) + M_ag`` for the propagation (appnp.py:122,130).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from incagg_gnn_tpu.history import HistoryState
from incagg_gnn_tpu.models.base import BaseConfig, ScalableGNN
from incagg_gnn_tpu.models.nn import dropout, linear, linear_init, pad_rows
from incagg_gnn_tpu.ops.agg import edge_counts, spmm


@dataclasses.dataclass(frozen=True)
class APPNPConfig(BaseConfig):
    alpha: float = 0.1


class APPNP(ScalableGNN):
    cfg: APPNPConfig
    needs_x0 = True
    vr_reduce = "sum"

    def __init__(self, cfg: APPNPConfig):
        super().__init__(cfg)
        self.x0_dim = cfg.out_channels

    @property
    def hist_dim(self) -> int:
        return self.cfg.out_channels  # appnp.py:24

    def init(self, rng):
        c = self.cfg
        k0, k1 = jax.random.split(rng)
        params = {
            "lins": [
                linear_init(k0, c.in_channels, c.hidden_channels),
                linear_init(k1, c.hidden_channels, c.out_channels),
            ]
        }
        return params, {}

    def layer_input_dim(self, layer: int) -> int:
        return self.cfg.out_channels

    def _mlp(self, params, x, keys, k, training):
        c = self.cfg
        x = dropout(keys[next(k)], x, c.dropout, training)
        x = jax.nn.relu(linear(params["lins"][0], x))
        x = dropout(keys[next(k)], x, c.dropout, training)
        return linear(params["lins"][1], x)

    def layer0_cache_input(self, params, x):
        # M_in[0] = MLP output (appnp.py:249-251); eval mode (no dropout)
        return linear(
            params["lins"][1], jax.nn.relu(linear(params["lins"][0], x))
        )

    def reg_mask(self, params):
        # appnp.py:36-37: reg = lins[0], nonreg = lins[1]
        return {
            "lins": [
                jax.tree.map(lambda _: True, params["lins"][0]),
                jax.tree.map(lambda _: False, params["lins"][1]),
            ]
        }

    # ---------------- GAS forward (appnp.py:44-106) ----------------
    def forward_gas(self, params, state, x, batch, hist_emb, rng, training,
                    aggregate_combined=True, use_aggregation=True):
        c = self.cfg
        r_pad = batch.adj.num_rows
        nk = 3
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))

        x = self._mlp(params, x, keys, k, training)
        if use_aggregation:
            adj = batch.adj if aggregate_combined else batch.adj.mask_in_batch(batch.batch_size)
            x0 = x[:r_pad]
            # NOTE deviation: the reference's GAS-APPNP runs num_layers+1
            # propagations (one per history in appnp.py:84-87 plus appnp.py:89)
            # while its own eval sweep runs num_layers — a fork artifact from
            # upstream PyGAS's num_layers-1 histories.  We run num_layers
            # propagations with emb[l] = input of propagation l, consistent
            # with the refresh convention (SURVEY §2.9 spirit: fixed defect).
            for l in range(c.num_layers):
                x_prop = (1 - c.alpha) * spmm(adj, x) + c.alpha * x0
                if l == c.num_layers - 1:
                    out = x_prop
                else:
                    x, hist_emb = self.push_and_pull(hist_emb, l + 1, x_prop, batch)
        else:
            x = x[:r_pad]
            x0 = x
            for l in range(c.num_layers):
                x = (1 - c.alpha) * x + c.alpha * x0
            out = x

        n_ib, n_ob = edge_counts(batch.adj, batch.batch_size)
        aux = {"num_in_batch_neighbors": n_ib,
               "num_out_batch_neighbors": n_ob}
        return out, state, hist_emb, aux

    # ---------------- VR forward (appnp.py:108-137) ----------------
    def forward_vr(self, params, state, x, batch, hist: HistoryState, rng,
                   training, drift_norm: int = 2):
        c = self.cfg
        adj = batch.adj
        r_pad = adj.num_rows
        c_pad = batch.n_id.shape[0]
        nk = 3
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))

        x = self._mlp(params, x[:r_pad], keys, k, training)
        x0 = x[:r_pad]
        drift = jnp.zeros(())
        for l in range(c.num_layers):
            x_ib = x[:r_pad]
            m_in, m_ag = self.vr_pull(hist, l, batch, x_ib.shape[1])
            d = x_ib - m_in
            drift += self.drift_term(d, batch, drift_norm)
            x_vr = spmm(adj, pad_rows(d, c_pad)) + m_ag
            x = (1 - c.alpha) * x_vr + c.alpha * x0
        aux = {"drift": drift / c.num_layers}
        return x, state, aux

    # ---------------- layer-wise eval (appnp.py:140-166) ----------------
    def forward_layer(self, params, state, layer, x, x0_ib, adj,
                      use_aggregation=True, pre_agg=None):
        c = self.cfg
        if layer == 0:
            x = self.layer0_cache_input(params, x)
            x0_ib = x[: adj.num_rows]
        if use_aggregation:
            agg = pre_agg if pre_agg is not None else spmm(adj, x)
            return (1 - c.alpha) * agg + c.alpha * x0_ib
        return (1 - c.alpha) * x[: adj.num_rows] + c.alpha * x0_ib
