"""GCN with GAS and Reverb/VR training (reference: models/gcn.py).

Layer math (PyG ``GCNConv(normalize=False)``): ``h = A @ (x W) + b`` with the
gcn-normalized adjacency supplied by the pipeline (main.py:147-151).  The VR
forward exploits linearity to aggregate first: ``h = (A_ib @ (x - M_in) +
M_ag) W + b`` (gcn.py:241-244), so the per-step cost is independent of the
out-of-batch halo.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from incagg_gnn_tpu.history import HistoryState, tup_set
from incagg_gnn_tpu.loader import SubgraphBatch
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
class GCNConfig(BaseConfig):
    drop_input: bool = True
    batch_norm: bool = False
    residual: bool = False
    linear: bool = False


def gcn_conv(p, x: jnp.ndarray, adj: PaddedAdj) -> jnp.ndarray:
    """``A @ (x W) + b`` — PyG GCNConv(normalize=False) applied to a
    pre-normalized adjacency.  Transform-then-aggregate keeps the dense GEMM
    on the smaller of the two widths when shrinking."""
    h = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    h = spmm(adj, h)
    return h + p["b"]


def gcn_conv_vr(p, adj: PaddedAdj, x_ib, m_in, m_ag, c_pad: int) -> jnp.ndarray:
    """VR rule then transform: ``((A_ib @ (x − M_in)) + M_ag) W + b``
    (reference gcn.py:241-244, exploiting (A@x)W == A@(xW))."""
    diff = pad_rows(x_ib - m_in, c_pad)
    h = spmm(adj, diff) + m_ag
    return jnp.dot(h, p["w"], preferred_element_type=jnp.float32) + p["b"]


class GCN(ScalableGNN):
    cfg: GCNConfig
    vr_reduce = "sum"

    def __init__(self, cfg: GCNConfig):
        super().__init__(cfg)

    # ---------------- params ----------------
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
            convs.append(linear_init(keys[i], in_dim, out_dim, init="glorot"))
        for i in range(c.num_layers):
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
        # layer-0 caches raw features, so the cache width must cover
        # in_channels (the reference's commented intent at base.py:68
        # ``max(in_channels, hidden_channels)``; its shipped code assumes
        # in <= hidden and zero-pads, gcn.py:356-359)
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
        return x  # raw features (reference gcn.py:355)

    def reg_mask(self, params):
        # reference gcn.py:77-86: reg = convs[:-1] + bns (convs+bns if linear);
        # nonreg = last conv (lins if linear)
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

    # ---------------- helpers ----------------
    def _post_conv(self, params, state, layer, h, x_prev, valid_mask, training):
        """bn → residual → relu shared by every path (gcn.py:144-148)."""
        c = self.cfg
        new_bn = state["bns"][layer]
        if c.batch_norm:
            h, new_bn = batchnorm(
                params["bns"][layer], state["bns"][layer], h, valid_mask, training
            )
        if c.residual and h.shape[-1] == x_prev.shape[-1]:
            h = h + x_prev[: h.shape[0]]
        return jax.nn.relu(h), new_bn

    def _edge_counts(self, batch: SubgraphBatch) -> Dict:
        n_ib, n_ob = edge_counts(batch.adj, batch.batch_size)
        return {
            "num_in_batch_neighbors": n_ib,
            "num_out_batch_neighbors": n_ob,
        }

    # ---------------- GAS forward ----------------
    def forward_gas(
        self, params, state, x, batch, hist_emb, rng, training,
        aggregate_combined=True, use_aggregation=True,
    ):
        c = self.cfg
        r_pad = batch.adj.num_rows
        valid = jnp.arange(r_pad) < batch.batch_size
        keys = (
            jax.random.split(rng, 2 * c.num_layers + 4)
            if rng is not None
            else [None] * (2 * c.num_layers + 4)
        )
        k = iter(range(len(keys)))

        if c.drop_input:
            x = dropout(keys[next(k)], x, c.dropout, training)
        if c.linear:
            x = jax.nn.relu(linear(params["lins"][0], x))
            x = dropout(keys[next(k)], x, c.dropout, training)

        new_bns = list(state["bns"])
        if use_aggregation:
            adj = batch.adj if aggregate_combined else batch.adj.mask_in_batch(batch.batch_size)
            for l in range(c.num_layers - 1):
                h = gcn_conv(params["convs"][l], x, adj)
                h, new_bns[l] = self._post_conv(params, state, l, h, x, valid, training)
                x, hist_emb = self.push_and_pull(hist_emb, l + 1, h, batch)
                x = dropout(keys[next(k)], x, c.dropout, training)
            h = gcn_conv(params["convs"][-1], x, adj)
        else:
            # MLP degrade: IB rows only, conv.lin per layer (gcn.py:167-193)
            x = x[:r_pad]
            for l in range(c.num_layers - 1):
                h = linear(params["convs"][l], x)
                h, new_bns[l] = self._post_conv(params, state, l, h, x, valid, training)
                hist_emb = tup_set(
                    hist_emb, l + 1,
                    hist_emb[l + 1].at[batch.push_idx].set(
                        jax.lax.stop_gradient(
                            jnp.pad(h, ((0, 0),
                                        (0, self.hist_dim - h.shape[1])))
                        ).astype(hist_emb[l + 1].dtype)))
                x = dropout(keys[next(k)], h, c.dropout, training)
            h = linear(params["convs"][-1], x)

        if c.linear:
            h, new_bns[-1] = self._post_conv(
                params, state, c.num_layers - 1, h, x, valid, training
            )
            h = dropout(keys[next(k)], h, c.dropout, training)
            h = linear(params["lins"][1], h)

        return h, {"bns": new_bns}, hist_emb, self._edge_counts(batch)

    # ---------------- VR forward ----------------
    def forward_vr(
        self, params, state, x, batch, hist: HistoryState, rng, training,
        drift_norm: int = 2,
    ):
        c = self.cfg
        adj = batch.adj
        r_pad = adj.num_rows
        c_pad = batch.n_id.shape[0]
        valid = jnp.arange(r_pad) < batch.batch_size
        keys = (
            jax.random.split(rng, c.num_layers + 3)
            if rng is not None
            else [None] * (c.num_layers + 3)
        )
        k = iter(range(len(keys)))

        if c.drop_input:
            x = dropout(keys[next(k)], x, c.dropout, training)
        if c.linear:
            x = jax.nn.relu(linear(params["lins"][0], x))
            x = dropout(keys[next(k)], x, c.dropout, training)

        new_bns = list(state["bns"])
        drift = jnp.zeros(())
        for l in range(c.num_layers):
            x_ib = x[:r_pad]
            m_in, m_ag = self.vr_pull(hist, l, batch, x_ib.shape[1])
            d = x_ib - m_in
            drift += self.drift_term(d, batch, drift_norm)
            h = gcn_conv_vr(params["convs"][l], adj, x_ib, m_in, m_ag, c_pad)
            if l < c.num_layers - 1 or c.linear:
                h, new_bns[l] = self._post_conv(params, state, l, h, x_ib, valid, training)
                if l < c.num_layers - 1:
                    x = dropout(keys[next(k)], h, c.dropout, training)
            if l == c.num_layers - 1:
                x_last = h
        h = x_last
        if c.linear:
            h = dropout(keys[next(k)], h, c.dropout, training)
            h = linear(params["lins"][1], h)

        metrics = {"drift": drift / c.num_layers, **self._edge_counts(batch)}
        return h, {"bns": new_bns}, metrics

    # ---------------- layer-wise eval ----------------
    def forward_layer(self, params, state, layer, x, x0_ib, adj,
                      use_aggregation=True, pre_agg=None):
        c = self.cfg
        if layer == 0 and c.linear:
            x = jax.nn.relu(linear(params["lins"][0], x))
        if use_aggregation:
            if pre_agg is not None:
                # reuse the M_ag aggregation: A@(xW) == (A@x)W
                h = linear(params["convs"][layer], pre_agg)
            else:
                h = gcn_conv(params["convs"][layer], x, adj)
        else:
            h = linear(params["convs"][layer], x[: adj.num_rows])
        if layer < c.num_layers - 1 or c.linear:
            if c.batch_norm:
                h, _ = batchnorm(
                    params["bns"][layer], state["bns"][layer], h, None, training=False
                )
            if c.residual and h.shape[-1] == x.shape[-1]:
                h = h + x[: h.shape[0]]
            h = jax.nn.relu(h)
        if c.linear and layer == c.num_layers - 1:
            # NOTE deviation: the reference applies lins[1] after *every* layer
            # when linear=True (gcn.py:305-307), which breaks the layer-wise
            # cache dims; we apply it only after the final layer.  linear=True
            # is unused by every reference config.
            h = linear(params["lins"][1], h)
        return h
