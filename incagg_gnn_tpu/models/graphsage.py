"""GraphSAGE with GAS and Reverb/VR training (reference: models/graphsage.py —
the largest model file and the canonical Reverb implementation for mean
aggregation).

Layer math (PyG ``SAGEConv(normalize=False)``, mean aggregator):

    h = W_l · mean_{j∈N(i)} x_j + W_r · x_i          (root weight)

The VR forward re-implements the conv with the incremental rule
(graphsage.py:634-644):

    h = lin_l( mean-spmm(A_ib, x − M_in) + M_ag ) + lin_r(x_root)

where the aggregation runs over the *binarized* adjacency
(``adj_t.set_value(None)``, graphsage.py:628) regardless of any gcn_norm
values on the pipeline adjacency, and M_ag caches the binary-mean aggregate
(graphsage.py:896-898).
"""

from __future__ import annotations

import dataclasses

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
from incagg_gnn_tpu.ops.agg import edge_counts, spmm_mean
from incagg_gnn_tpu.ops.spmm import PaddedAdj


@dataclasses.dataclass(frozen=True)
class SAGEConfig(BaseConfig):
    drop_input: bool = True
    batch_norm: bool = False
    residual: bool = False
    linear: bool = False


def sage_conv(p, x: jnp.ndarray, adj: PaddedAdj) -> jnp.ndarray:
    """``lin_l(mean_agg(x)) + lin_r(x_root)`` over the binarized adjacency."""
    agg = spmm_mean(adj.binarized(), x)
    h = linear(p["lin_l"], agg)
    return h + linear(p["lin_r"], x[: adj.num_rows])


class GraphSAGE(ScalableGNN):
    cfg: SAGEConfig
    vr_reduce = "mean"

    def __init__(self, cfg: SAGEConfig):
        super().__init__(cfg)

    def init(self, rng):
        c = self.cfg
        keys = jax.random.split(rng, c.num_layers + 2)
        convs, bns_p, bns_s = [], [], []
        for i in range(c.num_layers):
            in_dim = out_dim = c.hidden_channels
            if i == 0 and not c.linear:
                in_dim = c.in_channels
            if i == c.num_layers - 1 and not c.linear:
                out_dim = c.out_channels
            kl, kr = jax.random.split(keys[i])
            convs.append({
                "lin_l": linear_init(kl, in_dim, out_dim),
                "lin_r": linear_init(kr, in_dim, out_dim, bias=False),
            })
        for _ in range(c.num_layers):
            bp, bs = batchnorm_init(c.hidden_channels)
            bns_p.append(bp)
            bns_s.append(bs)
        params = {"convs": convs, "bns": bns_p}
        if c.linear:
            params["lins"] = [
                linear_init(keys[-2], c.in_channels, c.hidden_channels),
                linear_init(keys[-1], c.hidden_channels, c.out_channels),
            ]
        return params, {"bns": bns_s}

    @property
    def hist_dim(self) -> int:
        # layer-0 caches raw features (see GCN.hist_dim note)
        if self.cfg.linear:
            return self.cfg.hidden_channels
        return max(self.cfg.in_channels, self.cfg.hidden_channels)

    def layer_input_dim(self, layer: int) -> int:
        if layer == 0 and not self.cfg.linear:
            return self.cfg.in_channels
        return self.cfg.hidden_channels

    def layer0_cache_input(self, params, x):
        if self.cfg.linear:
            return jax.nn.relu(linear(params["lins"][0], x))
        return x  # raw features (graphsage.py:879)

    def reg_mask(self, params):
        c = self.cfg
        mask = {
            "convs": [
                jax.tree.map(lambda _: (i < c.num_layers - 1) or c.linear, p)
                for i, p in enumerate(params["convs"])
            ],
            "bns": jax.tree.map(lambda _: True, params["bns"]),
        }
        if c.linear:
            mask["lins"] = jax.tree.map(lambda _: False, params["lins"])
        return mask

    def _post(self, params, state, layer, h, x_prev, valid, training):
        c = self.cfg
        new_bn = state["bns"][layer]
        if c.batch_norm:
            h, new_bn = batchnorm(params["bns"][layer], state["bns"][layer], h,
                                  valid, training)
        if c.residual and h.shape[-1] == x_prev.shape[-1]:
            h = h + x_prev[: h.shape[0]]
        return jax.nn.relu(h), new_bn

    def _edge_counts(self, batch):
        n_ib, n_ob = edge_counts(batch.adj, batch.batch_size)
        return {"num_in_batch_neighbors": n_ib,
                "num_out_batch_neighbors": n_ob}

    # ---------------- GAS forward (graphsage.py:110-366) ----------------
    def forward_gas(self, params, state, x, batch, hist_emb, rng, training,
                    aggregate_combined=True, use_aggregation=True):
        c = self.cfg
        r_pad = batch.adj.num_rows
        valid = jnp.arange(r_pad) < batch.batch_size
        nk = c.num_layers + 4
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))

        if c.drop_input:
            x = dropout(keys[next(k)], x, c.dropout, training)
        if c.linear:
            x = jax.nn.relu(linear(params["lins"][0], x))
            x = dropout(keys[next(k)], x, c.dropout, training)

        new_bns = list(state["bns"])
        if use_aggregation:
            adj = batch.adj if aggregate_combined else batch.adj.mask_in_batch(batch.batch_size)
            for l in range(c.num_layers - 1):
                h = sage_conv(params["convs"][l], x, adj)
                h, new_bns[l] = self._post(params, state, l, h, x, valid, training)
                x, hist_emb = self.push_and_pull(hist_emb, l + 1, h, batch)
                x = dropout(keys[next(k)], x, c.dropout, training)
            h = sage_conv(params["convs"][-1], x, adj)
        else:
            # MLP degrade: lin_l + lin_r on the root features only
            x = x[:r_pad]
            for l in range(c.num_layers - 1):
                h = linear(params["convs"][l]["lin_l"], x) + linear(
                    params["convs"][l]["lin_r"], x
                )
                h, new_bns[l] = self._post(params, state, l, h, x, valid, training)
                x = dropout(keys[next(k)], h, c.dropout, training)
            h = linear(params["convs"][-1]["lin_l"], x) + linear(
                params["convs"][-1]["lin_r"], x
            )

        if c.linear:
            h, new_bns[-1] = self._post(params, state, c.num_layers - 1, h, x,
                                        valid, training)
            h = dropout(keys[next(k)], h, c.dropout, training)
            h = linear(params["lins"][1], h)
        return h, {"bns": new_bns}, hist_emb, self._edge_counts(batch)

    # ---------------- VR forward (graphsage.py:539-707) ----------------
    def forward_vr(self, params, state, x, batch, hist: HistoryState, rng,
                   training, drift_norm: int = 2):
        c = self.cfg
        adj = batch.adj
        r_pad = adj.num_rows
        c_pad = batch.n_id.shape[0]
        valid = jnp.arange(r_pad) < batch.batch_size
        nk = c.num_layers + 4
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))

        if c.drop_input:
            x = dropout(keys[next(k)], x, c.dropout, training)
        if c.linear:
            x = jax.nn.relu(linear(params["lins"][0], x))
            x = dropout(keys[next(k)], x, c.dropout, training)

        new_bns = list(state["bns"])
        drift = jnp.zeros(())
        bin_adj = adj.binarized()
        for l in range(c.num_layers):
            x_ib = x[:r_pad]
            m_in, m_ag = self.vr_pull(hist, l, batch, x_ib.shape[1])
            d = x_ib - m_in
            drift += self.drift_term(d, batch, drift_norm)
            agg = spmm_mean(bin_adj, pad_rows(d, c_pad)) + m_ag
            h = linear(params["convs"][l]["lin_l"], agg)
            h = h + linear(params["convs"][l]["lin_r"], x_ib)
            if l < c.num_layers - 1:
                h, new_bns[l] = self._post(params, state, l, h, x_ib, valid, training)
                x = dropout(keys[next(k)], h, c.dropout, training)
            else:
                out = h
        if c.linear:
            out, new_bns[-1] = self._post(params, state, c.num_layers - 1, out,
                                          x, valid, training)
            out = dropout(keys[next(k)], out, c.dropout, training)
            out = linear(params["lins"][1], out)
        aux = {"drift": drift / c.num_layers, **self._edge_counts(batch)}
        return out, {"bns": new_bns}, aux

    # ---------------- layer-wise eval (graphsage.py:713-765) ----------------
    def forward_layer(self, params, state, layer, x, x0_ib, adj,
                      use_aggregation=True, pre_agg=None):
        c = self.cfg
        if layer == 0 and c.linear:
            x = jax.nn.relu(linear(params["lins"][0], x))
        if use_aggregation:
            if pre_agg is not None:
                # M_ag is the same binarized-mean aggregation SAGEConv uses
                h = linear(params["convs"][layer]["lin_l"], pre_agg)
                h = h + linear(params["convs"][layer]["lin_r"], x[: adj.num_rows])
            else:
                h = sage_conv(params["convs"][layer], x, adj)
        else:
            xr = x[: adj.num_rows]
            h = linear(params["convs"][layer]["lin_l"], xr) + linear(
                params["convs"][layer]["lin_r"], xr
            )
        if layer < c.num_layers - 1 or c.linear:
            if c.batch_norm:
                h, _ = batchnorm(params["bns"][layer], state["bns"][layer], h,
                                 None, training=False)
            if c.residual and h.shape[-1] == x.shape[-1]:
                h = h + x[: h.shape[0]]
            h = jax.nn.relu(h)
        if c.linear and layer == c.num_layers - 1:
            h = linear(params["lins"][1], h)
        return h
