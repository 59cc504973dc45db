"""GAT with historical embeddings (reference: models/gat.py).

Bipartite multi-head attention conv (PyG ``GATConv(add_self_loops=False)``
applied as ``conv((x, x[:R]), adj_t)``, gat.py:50):

    e_ij = LeakyReLU(a_l · (W x_j) + a_r · (W x_i))      per head
    α_ij = softmax_j(e_ij)   (per destination row)
    h_i  = Σ_j α_ij (W x_j)                              concat/mean heads

In the reference GAT is vestigial — its ``push_and_pull(history, x, *args)``
call uses the stale upstream-PyGAS argument order and silently misbehaves
(gat.py:52, SURVEY §2.9).  Here it is wired correctly into the GAS runtime
(push layer outputs, pull OB rows) and into the layer-wise refresh; VR is not
defined for attention aggregation (the correction term is nonlinear in x), so
``forward_vr`` falls back to plain IB propagation like the reference's PNA.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from incagg_gnn_tpu.history import HistoryState
from incagg_gnn_tpu.models.base import BaseConfig, ScalableGNN
from incagg_gnn_tpu.models.nn import dropout
from incagg_gnn_tpu.ops.ell import HybridAdj
from incagg_gnn_tpu.ops.spmm import PaddedAdj, segment_softmax

import jax.ops


@dataclasses.dataclass(frozen=True)
class GATConfig(BaseConfig):
    hidden_heads: int = 4
    out_heads: int = 1


def gat_conv_init(rng, in_dim: int, out_dim: int, heads: int):
    kw, kl, kr, kb = jax.random.split(rng, 4)
    glorot = lambda k, shape: jax.random.uniform(
        k, shape, jnp.float32,
        -jnp.sqrt(6.0 / (shape[0] + shape[-1])), jnp.sqrt(6.0 / (shape[0] + shape[-1])),
    )
    return {
        "w": glorot(kw, (in_dim, heads * out_dim)),
        "a_l": glorot(kl, (heads, out_dim)),
        "a_r": glorot(kr, (heads, out_dim)),
        "b": jnp.zeros((heads * out_dim,)),
    }


def gat_conv_hybrid(p, x: jnp.ndarray, adj: HybridAdj, heads: int,
                    out_dim: int, concat: bool) -> jnp.ndarray:
    """Scatter-free edge-softmax attention over the hybrid ELL format
    (forward-only — used by the layer-wise refresh/eval sweeps where no
    gradient flows; training keeps the COO path whose backward is a sorted
    segment op).  Per row the softmax reduces over the K ELL slots with the
    small COO overflow folded in via segment max/sum."""
    r_pad = adj.num_rows
    neg = jnp.float32(-1e30)
    wx = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    wx = wx.reshape(x.shape[0], heads, out_dim)
    a_src = (wx * p["a_l"]).sum(-1)  # [C_pad, H]
    a_dst = (wx[:r_pad] * p["a_r"]).sum(-1)  # [R_pad, H]

    valid_e = (adj.ell_vals != 0)[..., None]  # [R, K, 1]
    sc_e = jax.nn.leaky_relu(
        jnp.take(a_src, adj.ell_cols, axis=0) + a_dst[:, None, :], 0.2)
    sc_e = jnp.where(valid_e, sc_e, neg)

    valid_o = (adj.ovf_vals != 0)[:, None]  # [O, 1]
    sc_o = jax.nn.leaky_relu(
        jnp.take(a_src, adj.ovf_cols, axis=0)
        + jnp.take(a_dst, adj.ovf_rows, axis=0), 0.2)
    sc_o = jnp.where(valid_o, sc_o, neg)

    m = sc_e.max(axis=1)  # [R, H]
    if adj.ovf_rows.shape[0] > 0:
        m = jnp.maximum(m, jax.ops.segment_max(
            sc_o, adj.ovf_rows, num_segments=r_pad, indices_are_sorted=True))
    m = jnp.where(m > neg / 2, m, 0.0)  # rows with no edges: keep exp finite

    e_e = jnp.where(valid_e, jnp.exp(sc_e - m[:, None, :]), 0.0)  # [R, K, H]
    g = jnp.take(wx, adj.ell_cols.reshape(-1), axis=0)
    g = g.reshape(adj.ell_cols.shape + (heads, out_dim))  # [R, K, H, D]
    out = (g * e_e[..., None]).sum(axis=1)  # [R, H, D]
    z = e_e.sum(axis=1)  # [R, H]
    if adj.ovf_rows.shape[0] > 0:
        e_o = jnp.where(
            valid_o, jnp.exp(sc_o - jnp.take(m, adj.ovf_rows, axis=0)), 0.0)
        out = out + jax.ops.segment_sum(
            jnp.take(wx, adj.ovf_cols, axis=0) * e_o[..., None],
            adj.ovf_rows, num_segments=r_pad, indices_are_sorted=True)
        z = z + jax.ops.segment_sum(
            e_o, adj.ovf_rows, num_segments=r_pad, indices_are_sorted=True)
    out = out / jnp.maximum(z, 1e-16)[..., None]
    if concat:
        out = out.reshape(r_pad, heads * out_dim)
    else:
        out = out.mean(axis=1)
    return out + (p["b"] if concat else p["b"].reshape(heads, out_dim).mean(0))


def gat_conv(p, x: jnp.ndarray, adj, heads: int, out_dim: int,
             concat: bool, rng, att_dropout: float, training: bool) -> jnp.ndarray:
    """Edge-softmax attention over the padded edge list."""
    if isinstance(adj, HybridAdj):
        assert not (training and att_dropout > 0.0 and rng is not None), (
            "hybrid GAT path is forward-only (refresh/eval)")
        return gat_conv_hybrid(p, x, adj, heads, out_dim, concat)
    r_pad = adj.num_rows
    wx = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    wx = wx.reshape(x.shape[0], heads, out_dim)
    alpha_src = (wx * p["a_l"]).sum(-1)  # [C_pad, H] source term (cols)
    alpha_dst = (wx[:r_pad] * p["a_r"]).sum(-1)  # [R_pad, H] dest term (rows)
    valid = adj.vals != 0
    scores = jax.nn.leaky_relu(
        jnp.take(alpha_src, adj.cols, axis=0) + jnp.take(alpha_dst, adj.rows, axis=0),
        negative_slope=0.2,
    )
    att = segment_softmax(scores, adj.rows, r_pad, valid)  # [E_pad, H]
    if training and att_dropout > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - att_dropout, att.shape)
        att = jnp.where(keep, att / (1.0 - att_dropout), 0.0)
    msg = jnp.take(wx, adj.cols, axis=0) * att[:, :, None]  # [E_pad, H, D]
    out = jax.ops.segment_sum(msg, adj.rows, num_segments=r_pad,
                              indices_are_sorted=True)
    if concat:
        out = out.reshape(r_pad, heads * out_dim)
    else:
        out = out.mean(axis=1)
    return out + (p["b"] if concat else p["b"].reshape(heads, out_dim).mean(0))


class GAT(ScalableGNN):
    cfg: GATConfig

    @property
    def hist_dim(self) -> int:
        # layer-0 caches raw features in VR refresh (see GCN.hist_dim note)
        return max(self.cfg.in_channels,
                   self.cfg.hidden_channels * self.cfg.hidden_heads)

    def init(self, rng):
        c = self.cfg
        keys = jax.random.split(rng, c.num_layers)
        convs = []
        for i in range(c.num_layers - 1):
            in_dim = c.in_channels if i == 0 else c.hidden_channels * c.hidden_heads
            convs.append(gat_conv_init(keys[i], in_dim, c.hidden_channels, c.hidden_heads))
        convs.append(
            gat_conv_init(keys[-1], c.hidden_channels * c.hidden_heads,
                          c.out_channels, c.out_heads)
        )
        return {"convs": convs}, {}

    def layer_input_dim(self, layer: int) -> int:
        if layer == 0:
            return self.cfg.in_channels
        return self.cfg.hidden_channels * self.cfg.hidden_heads

    def reg_mask(self, params):
        # gat.py:39-40: reg = convs, nonreg = empty
        return jax.tree.map(lambda _: True, params)

    def _conv(self, params, layer, x, adj, rng, training):
        c = self.cfg
        if layer < c.num_layers - 1:
            return gat_conv(params["convs"][layer], x, adj, c.hidden_heads,
                            c.hidden_channels, True, rng, c.dropout, training)
        return gat_conv(params["convs"][-1], x, adj, c.out_heads,
                        c.out_channels, False, rng, c.dropout, training)

    # ---------------- GAS forward (gat.py:47-56) ----------------
    def forward_gas(self, params, state, x, batch, hist_emb, rng, training,
                    aggregate_combined=True, use_aggregation=True):
        c = self.cfg
        nk = 2 * c.num_layers
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))
        adj = batch.adj if aggregate_combined else batch.adj.mask_in_batch(batch.batch_size)
        for l in range(c.num_layers - 1):
            x = dropout(keys[next(k)], x, c.dropout, training)
            h = self._conv(params, l, x, adj, keys[next(k)], training)
            h = jax.nn.elu(h)
            x, hist_emb = self.push_and_pull(hist_emb, l + 1, h, batch)
        x = dropout(keys[next(k)], x, c.dropout, training)
        out = self._conv(params, c.num_layers - 1, x, adj, keys[next(k)], training)

        real = batch.adj.vals != 0
        ib = real & (batch.adj.cols < batch.batch_size)
        aux = {"num_in_batch_neighbors": ib.sum(),
               "num_out_batch_neighbors": real.sum() - ib.sum()}
        return out, state, hist_emb, aux

    # ---------------- VR fallback ----------------
    def forward_vr(self, params, state, x, batch, hist: HistoryState, rng,
                   training, drift_norm: int = 2):
        """Attention aggregation has no linear VR decomposition; propagate
        plainly over the IB-only graph (same policy as the reference's PNA
        'mock' VR path)."""
        c = self.cfg
        nk = 2 * c.num_layers
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))
        for l in range(c.num_layers - 1):
            x = dropout(keys[next(k)], x, c.dropout, training)
            x = jax.nn.elu(self._conv(params, l, x, batch.adj, keys[next(k)], training))
        x = dropout(keys[next(k)], x, c.dropout, training)
        out = self._conv(params, c.num_layers - 1, x, batch.adj, keys[next(k)], training)
        return out, state, {"drift": jnp.zeros(())}

    # ---------------- layer-wise eval (gat.py:58-66) ----------------
    def forward_layer(self, params, state, layer, x, x0_ib, adj,
                      use_aggregation=True, pre_agg=None):  # pre_agg unused:
        # multi-aggregator/attention forwards can't reuse the cached mean/sum
        h = self._conv(params, layer, x, adj, None, False)
        if layer < self.cfg.num_layers - 1:
            h = jax.nn.elu(h)
        return h
