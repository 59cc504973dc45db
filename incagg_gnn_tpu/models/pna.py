"""PNA — Principal Neighborhood Aggregation (reference: models/pna.py).

The reference's custom ``PNAConv`` (pna.py:24-84, not stock PyG): for each
(aggregator, scaler) pair a pre-Linear + ReLU, the aggregation, a post-Linear
and a degree scaler, summed over pairs, plus a root ``lin(x)`` term:

    out = Σ_{(aggr, scaler)} scaler(deg) · post_lin(aggr(A, relu(pre_lin(x))))
          + lin(x)[:R]

Scalers (pna.py:77-81): identity, amplification ``log(d+1)/avg_log_deg``,
attenuation ``avg_log_deg/(log(d+1)+eps)``; ``avg_deg`` statistics come from
the full-graph degree vector (pna.py:36-39, fed from main.py:182).

Reverb status: the reference's PNA ``VR_forward`` is experimental — the VR
path is commented out and it propagates plainly over the batch graph
("mock", pna.py:235,270).  This framework offers both semantics:

- ``true_vr=False`` (default): the reference's shipped behavior — plain IB
  propagation; stale-neighbor information enters only via the periodic
  refresh keeping histories warm for eval.
- ``true_vr=True``: an **exact incremental rule for the linear aggregators**
  (the capability the reference stubbed out).  Because each (aggregator,
  scaler) branch aggregates a *different* nonlinear transform
  ``relu(pre_lin_i(x))``, the refresh caches one full-neighborhood SUM
  aggregate per linear branch, packed side-by-side into ``emb_ag[layer]``
  (stride ``_d_pack``), plus one column holding the full-neighborhood
  degree.  The per-branch ``M_in_i = relu(pre_lin_i(M_in))`` is *recomputed*
  from the ordinary layer-input cache at train time (halving cache memory);
  immediately after a refresh this equals the refresh-time value, so

      sum:   agg_i = Σ_ib(h_i − M_in_i) + M_ag_i                 (exact)
      mean:  agg_i = (Σ_ib(h_i − M_in_i) + M_ag_i) / deg_full    (exact —
             unlike GraphSAGE's reference rule, the cached full degree makes
             the mean correction consistent with the full neighborhood)

  max/min branches have no incremental form; they use fresh IB propagation
  (the reference's mock behavior), documented as the approximation.  Degree
  scalers read the cached full degree, matching the refresh/eval path
  exactly.  Memory: hist width grows to ``num_linear_branches · max(hidden,
  out) + 1`` — opt-in, and bf16 histories halve it.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from incagg_gnn_tpu.history import HistoryState
from incagg_gnn_tpu.models.base import BaseConfig, ScalableGNN, StreamedPulls
from incagg_gnn_tpu.models.nn import (
    batchnorm,
    batchnorm_init,
    dropout,
    linear,
    linear_init,
    pad_cols,
    pad_rows,
)
from incagg_gnn_tpu.ops.agg import edge_counts, spmm_reduce
from incagg_gnn_tpu.ops.spmm import PaddedAdj

EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class PNAConfig(BaseConfig):
    aggregators: Sequence[str] = ("mean", "max", "min", "sum")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    avg_deg_lin: float = 1.0  # mean(deg) over the full graph (pna.py:36-39)
    avg_deg_log: float = 1.0  # mean(log(deg+1))
    drop_input: bool = True
    batch_norm: bool = False
    residual: bool = False
    #: exact per-branch VR for the linear aggregators (see module docstring);
    #: False = the reference's shipped "mock" IB propagation (pna.py:235,270)
    true_vr: bool = False


def compute_avg_deg(degrees: np.ndarray):
    """Degree statistics for the scalers (pna.py:35-39)."""
    deg = degrees.astype(np.float64)
    return float(deg.mean()), float(np.log(deg + 1).mean())


def pna_conv(p, cfg: PNAConfig, x: jnp.ndarray, adj: PaddedAdj) -> jnp.ndarray:
    """One PNAConv application (pna.py:60-84)."""
    bin_adj = adj.binarized()
    deg = bin_adj.deg[:, None]
    out = 0.0
    i = 0
    for aggr in cfg.aggregators:
        for scaler in cfg.scalers:
            h = jax.nn.relu(linear(p["pre"][i], x))
            h = spmm_reduce(bin_adj, h, aggr)
            h = linear(p["post"][i], h)
            if scaler == "amplification":
                h = h * (jnp.log(deg + 1) / cfg.avg_deg_log)
            elif scaler == "attenuation":
                h = h * (cfg.avg_deg_log / (jnp.log(deg + 1) + EPS))
            out = out + h
            i += 1
    return out + linear(p["lin"], x)[: adj.num_rows]


class PNA(ScalableGNN):
    cfg: PNAConfig
    vr_reduce = "mean"

    def init(self, rng):
        c = self.cfg
        keys = jax.random.split(rng, c.num_layers)
        convs, bns_p, bns_s = [], [], []
        nb = len(c.aggregators) * len(c.scalers)
        for i in range(c.num_layers):
            in_dim = c.in_channels if i == 0 else c.hidden_channels
            out_dim = c.out_channels if i == c.num_layers - 1 else c.hidden_channels
            ks = jax.random.split(keys[i], 2 * nb + 1)
            convs.append({
                "pre": [linear_init(ks[j], in_dim, out_dim) for j in range(nb)],
                "post": [linear_init(ks[nb + j], out_dim, out_dim) for j in range(nb)],
                "lin": linear_init(ks[-1], in_dim, out_dim),
            })
        for _ in range(max(c.num_layers - 1, 1)):
            bp, bs = batchnorm_init(c.hidden_channels)
            bns_p.append(bp)
            bns_s.append(bs)
        return {"convs": convs, "bns": bns_p}, {"bns": bns_s}

    # -------- true-VR packed-cache geometry --------
    @property
    def _d_pack(self) -> int:
        """Per-branch stride in the packed emb_ag (max layer output width)."""
        return max(self.cfg.hidden_channels, self.cfg.out_channels)

    @property
    def _linear_branches(self):
        """(branch_index, aggregator) for branches with an exact VR rule, in
        pna_conv's enumeration order (aggregator outer, scaler inner)."""
        out, i = [], 0
        for a in self.cfg.aggregators:
            for _ in self.cfg.scalers:
                if a in ("sum", "mean"):
                    out.append((i, a))
                i += 1
        return out

    @property
    def vr_cache_is_agg(self) -> bool:
        return not self.cfg.true_vr

    @property
    def hist_dim(self) -> int:
        # layer-0 caches raw features (see GCN.hist_dim note)
        base = max(self.cfg.in_channels, self.cfg.hidden_channels)
        if not self.cfg.true_vr:
            return base
        # packed per-branch aggregates + the full-degree column
        return max(base, len(self._linear_branches) * self._d_pack + 1)

    def layer_input_dim(self, layer: int) -> int:
        return self.cfg.in_channels if layer == 0 else self.cfg.hidden_channels

    def layer0_cache_input(self, params, x):
        return x

    def reg_mask(self, params):
        # pna.py:125-131: reg = convs[:-1] + bns, nonreg = last conv
        c = self.cfg
        return {
            "convs": [
                jax.tree.map(lambda _: i < c.num_layers - 1, p)
                for i, p in enumerate(params["convs"])
            ],
            "bns": jax.tree.map(lambda _: True, params["bns"]),
        }

    def _post(self, params, state, layer, h, x_prev, valid, training):
        c = self.cfg
        new_bn = state["bns"][layer]
        if c.batch_norm:
            h, new_bn = batchnorm(params["bns"][layer], state["bns"][layer], h,
                                  valid, training)
        if c.residual and h.shape[-1] == x_prev.shape[-1]:
            h = h + x_prev[: h.shape[0]]
        return jax.nn.relu(h), new_bn

    # ---------------- GAS forward (pna.py:138-158) ----------------
    def forward_gas(self, params, state, x, batch, hist_emb, rng, training,
                    aggregate_combined=True, use_aggregation=True):
        c = self.cfg
        r_pad = batch.adj.num_rows
        valid = jnp.arange(r_pad) < batch.batch_size
        nk = c.num_layers + 2
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))

        if c.drop_input:
            x = dropout(keys[next(k)], x, c.dropout, training)
        adj = batch.adj if aggregate_combined else batch.adj.mask_in_batch(batch.batch_size)
        new_bns = list(state["bns"])
        for l in range(c.num_layers - 1):
            h = pna_conv(params["convs"][l], c, x, adj)
            h, new_bns[l] = self._post(params, state, l, h, x, valid, training)
            x, hist_emb = self.push_and_pull(hist_emb, l + 1, h, batch)
            x = dropout(keys[next(k)], x, c.dropout, training)
        out = pna_conv(params["convs"][-1], c, x, adj)

        n_ib, n_ob = edge_counts(batch.adj, batch.batch_size)
        aux = {"num_in_batch_neighbors": n_ib,
               "num_out_batch_neighbors": n_ob}
        return out, {"bns": new_bns}, hist_emb, aux

    # ---------------- VR refresh cache (true_vr) ----------------
    def vr_cache_value(self, params, layer, adj, x):
        """With ``true_vr``: pack one full-neighborhood SUM aggregate of
        ``relu(pre_lin_i(x))`` per linear branch (stride ``_d_pack``) plus the
        full-degree column; the refresh's eval batches carry the full 1-hop
        neighborhood, so these are exact full-graph quantities for IB rows."""
        if not self.cfg.true_vr:
            return super().vr_cache_value(params, layer, adj, x)
        bin_adj = adj.binarized()
        p = params["convs"][layer]
        parts = []
        for i, _aggr in self._linear_branches:
            h = jax.nn.relu(linear(p["pre"][i], x))
            parts.append(pad_cols(spmm_reduce(bin_adj, h, "sum"), self._d_pack))
        parts.append(bin_adj.deg[:, None])
        return jnp.concatenate(parts, axis=1)

    def _vr_pull_full(self, hist, layer, batch, in_dim):
        """IB rows of the layer-input cache (sliced to the layer width) and
        the FULL-width packed emb_ag row block."""
        if isinstance(hist, StreamedPulls):
            m_in, packed = hist.m_in[layer], hist.m_ag[layer]
        else:
            m_in = jnp.take(hist.emb[layer], batch.push_idx, axis=0)
            packed = jnp.take(hist.emb_ag[layer], batch.push_idx, axis=0)
        return (
            jax.lax.stop_gradient(m_in[:, :in_dim].astype(jnp.float32)),
            jax.lax.stop_gradient(packed.astype(jnp.float32)),
        )

    # ---------------- VR forward ----------------
    def forward_vr(self, params, state, x, batch, hist: HistoryState, rng,
                   training, drift_norm: int = 2):
        if self.cfg.true_vr:
            return self._forward_vr_true(params, state, x, batch, hist, rng,
                                         training, drift_norm)
        return self._forward_vr_mock(params, state, x, batch, hist, rng,
                                     training, drift_norm)

    def _forward_vr_true(self, params, state, x, batch, hist, rng, training,
                         drift_norm: int = 2):
        """Exact per-branch incremental aggregation for sum/mean branches
        (fresh-cache identity with the dense oracle); fresh IB propagation for
        max/min (no incremental form exists).  See module docstring."""
        c = self.cfg
        adj = batch.adj
        bin_adj = adj.binarized()
        r_pad = adj.num_rows
        c_pad = batch.n_id.shape[0]
        valid = jnp.arange(r_pad) < batch.batch_size
        nk = c.num_layers + 2
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))
        deg_col = len(self._linear_branches) * self._d_pack
        linear_idx = {i: n for n, (i, _) in enumerate(self._linear_branches)}

        if c.drop_input:
            x = dropout(keys[next(k)], x, c.dropout, training)
        new_bns = list(state["bns"])
        drift = jnp.zeros(())
        out = None
        for l in range(c.num_layers):
            in_dim = self.layer_input_dim(l)
            out_dim = (c.out_channels if l == c.num_layers - 1
                       else c.hidden_channels)
            x_ib = x[:r_pad]
            m_in_layer, packed = self._vr_pull_full(hist, l, batch, in_dim)
            d = x_ib[:, :in_dim] - m_in_layer
            drift += self.drift_term(d, batch, drift_norm)
            deg_full = packed[:, deg_col:deg_col + 1]
            p = params["convs"][l]
            h_l = 0.0
            i = 0
            for aggr in c.aggregators:
                for scaler in c.scalers:
                    h = jax.nn.relu(linear(p["pre"][i], x))
                    if aggr in ("sum", "mean"):
                        m_in_i = jax.nn.relu(linear(p["pre"][i], m_in_layer))
                        diff = pad_rows(h[:r_pad] - m_in_i, c_pad)
                        off = linear_idx[i] * self._d_pack
                        g = (spmm_reduce(bin_adj, diff, "sum")
                             + packed[:, off:off + out_dim])
                        if aggr == "mean":
                            g = g / jnp.maximum(deg_full, 1.0)
                    else:
                        # max/min: fresh IB propagation (mock — no exact rule)
                        g = spmm_reduce(bin_adj, pad_rows(h, c_pad), aggr)
                    g = linear(p["post"][i], g)
                    if scaler == "amplification":
                        g = g * (jnp.log(deg_full + 1) / c.avg_deg_log)
                    elif scaler == "attenuation":
                        g = g * (c.avg_deg_log / (jnp.log(deg_full + 1) + EPS))
                    h_l = h_l + g
                    i += 1
            h_l = h_l + linear(p["lin"], x)[:r_pad]
            if l < c.num_layers - 1:
                h_l, new_bns[l] = self._post(params, state, l, h_l, x, valid,
                                             training)
                x = dropout(keys[next(k)], h_l, c.dropout, training)
            out = h_l
        aux = {"drift": drift / c.num_layers}
        return out, {"bns": new_bns}, aux

    # ------------- VR forward (pna.py:162-278 "mock") -------------
    def _forward_vr_mock(self, params, state, x, batch, hist: HistoryState,
                         rng, training, drift_norm: int = 2):
        """Plain propagation over the IB-only batch graph — the reference's
        shipped PNA VR behavior (pna.py:235,270: VR algebra commented out,
        'mock' propagate).  Stale-neighbor information enters only through the
        periodic refresh keeping histories warm for eval."""
        c = self.cfg
        r_pad = batch.adj.num_rows
        valid = jnp.arange(r_pad) < batch.batch_size
        nk = c.num_layers + 2
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))

        if c.drop_input:
            x = dropout(keys[next(k)], x, c.dropout, training)
        new_bns = list(state["bns"])
        drift = jnp.zeros(())
        for l in range(c.num_layers - 1):
            x_ib_prev = x[:r_pad]
            m_in, _ = self.vr_pull(hist, l, batch, min(x.shape[1], self.hist_dim))
            d = x_ib_prev[:, : m_in.shape[1]] - m_in
            drift += self.drift_term(d, batch, drift_norm)
            h = pna_conv(params["convs"][l], c, x, batch.adj)
            h, new_bns[l] = self._post(params, state, l, h, x, valid, training)
            x = dropout(keys[next(k)], h, c.dropout, training)
        out = pna_conv(params["convs"][-1], c, x, batch.adj)
        aux = {"drift": drift / max(c.num_layers - 1, 1)}
        return out, {"bns": new_bns}, aux

    # ---------------- layer-wise eval (pna.py:282-295) ----------------
    def forward_layer(self, params, state, layer, x, x0_ib, adj,
                      use_aggregation=True, pre_agg=None):  # pre_agg unused:
        # multi-aggregator/attention forwards can't reuse the cached mean/sum
        c = self.cfg
        h = pna_conv(params["convs"][layer], c, x, adj)
        if layer < c.num_layers - 1:
            if c.batch_norm:
                h, _ = batchnorm(params["bns"][layer], state["bns"][layer], h,
                                 None, training=False)
            if c.residual and h.shape[-1] == x.shape[-1]:
                h = h + x[: h.shape[0]]
            h = jax.nn.relu(h)
        return h
