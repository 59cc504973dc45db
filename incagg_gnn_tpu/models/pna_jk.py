"""PNA with Jumping Knowledge (reference: models/pna_jk.py).

PNA layers whose per-layer outputs are all concatenated and fed through a
final linear head (pna_jk.py:75-99).  In the reference this model is
vestigial — its ``push_and_pull(hist, x, *args)`` call uses the stale
upstream-PyGAS argument order (pna_jk.py:86, SURVEY §2.9); here it is wired
correctly into the GAS runtime.  The JK concat needs every layer's output for
the *same* nodes, so the layer-wise refresh threads the per-layer IB outputs
through an extra state table like x0.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from incagg_gnn_tpu.history import HistoryState, tup_set
from incagg_gnn_tpu.models.base import ScalableGNN
from incagg_gnn_tpu.models.nn import batchnorm, dropout, linear, linear_init
from incagg_gnn_tpu.models.pna import PNA, PNAConfig, pna_conv


@dataclasses.dataclass(frozen=True)
class PNAJKConfig(PNAConfig):
    pass


class PNA_JK(PNA):
    """All conv layers output hidden_channels; a JK head maps the concat of
    all layer outputs to out_channels (pna_jk.py:30-44)."""

    cfg: PNAJKConfig

    def __init__(self, cfg: PNAJKConfig):
        if getattr(cfg, "true_vr", False):
            raise NotImplementedError(
                "PNA_JK has no true-VR rule (forward_vr is the mock IB "
                "propagation with the JK head); set true_vr on plain PNA"
            )
        super().__init__(cfg)

    def init(self, rng):
        c = self.cfg
        keys = jax.random.split(rng, c.num_layers + 1)
        nb = len(c.aggregators) * len(c.scalers)
        convs = []
        from incagg_gnn_tpu.models.nn import batchnorm_init

        bns_p, bns_s = [], []
        for i in range(c.num_layers):
            in_dim = c.in_channels if i == 0 else c.hidden_channels
            out_dim = c.hidden_channels
            ks = jax.random.split(keys[i], 2 * nb + 1)
            convs.append({
                "pre": [linear_init(ks[j], in_dim, out_dim) for j in range(nb)],
                "post": [linear_init(ks[nb + j], out_dim, out_dim) for j in range(nb)],
                "lin": linear_init(ks[-1], in_dim, out_dim),
            })
            bp, bs = batchnorm_init(c.hidden_channels)
            bns_p.append(bp)
            bns_s.append(bs)
        params = {
            "convs": convs,
            "bns": bns_p,
            "jk": linear_init(keys[-1], c.num_layers * c.hidden_channels, c.out_channels),
        }
        return params, {"bns": bns_s}

    def reg_mask(self, params):
        # pna_jk.py: reg = convs + bns, nonreg = jk head
        return {
            "convs": jax.tree.map(lambda _: True, params["convs"]),
            "bns": jax.tree.map(lambda _: True, params["bns"]),
            "jk": jax.tree.map(lambda _: False, params["jk"]),
        }

    # JK needs all layer outputs; refresh threads them via emb slots plus a
    # jk staging table keyed off out_table width — simplest correct scheme:
    # emb[l+1] already stores layer-l output for l<L-1; the final layer's
    # output is produced inside forward_layer's JK head using pulled slots.
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
        xs: List[jnp.ndarray] = []
        for l in range(c.num_layers):
            h = pna_conv(params["convs"][l], c, x, adj)
            h, new_bns[l] = self._post(params, state, l, h, x, valid, training)
            xs.append(h[:r_pad])
            if l < c.num_layers - 1:
                x, hist_emb = self.push_and_pull(hist_emb, l + 1, h, batch)
                x = dropout(keys[next(k)], x, c.dropout, training)
        out = linear(params["jk"], jnp.concatenate(xs, axis=-1))

        from incagg_gnn_tpu.ops.agg import edge_counts

        n_ib, n_ob = edge_counts(batch.adj, batch.batch_size)
        aux = {"num_in_batch_neighbors": n_ib,
               "num_out_batch_neighbors": n_ob}
        return out, {"bns": new_bns}, hist_emb, aux

    def forward_vr(self, params, state, x, batch, hist: HistoryState, rng,
                   training, drift_norm: int = 2):
        """Plain IB propagation with JK head (same policy as PNA's mock VR)."""
        c = self.cfg
        r_pad = batch.adj.num_rows
        valid = jnp.arange(r_pad) < batch.batch_size
        nk = c.num_layers + 2
        keys = jax.random.split(rng, nk) if rng is not None else [None] * nk
        k = iter(range(nk))
        if c.drop_input:
            x = dropout(keys[next(k)], x, c.dropout, training)
        new_bns = list(state["bns"])
        xs = []
        for l in range(c.num_layers):
            h = pna_conv(params["convs"][l], c, x, batch.adj)
            h, new_bns[l] = self._post(params, state, l, h, x, valid, training)
            xs.append(h[:r_pad])
            if l < c.num_layers - 1:
                x = dropout(keys[next(k)], h, c.dropout, training)
        out = linear(params["jk"], jnp.concatenate(xs, axis=-1))
        return out, {"bns": new_bns}, {"drift": jnp.zeros(())}

    def forward_layer(self, params, state, layer, x, x0_ib, adj,
                      use_aggregation=True, pre_agg=None):  # pre_agg unused:
        # multi-aggregator/attention forwards can't reuse the cached mean/sum
        """Per-layer sweep pass (pna_jk.py:101-126): every layer applies
        bn+relu; the JK concat is assembled by the generic refresh via the
        jk_state hook (layer outputs are exactly emb[1..L-1] plus this)."""
        c = self.cfg
        h = pna_conv(params["convs"][layer], c, x, adj)
        if c.batch_norm:
            h, _ = batchnorm(params["bns"][layer], state["bns"][layer], h, None,
                             training=False)
        if c.residual and h.shape[-1] == x.shape[-1]:
            h = h + x[: h.shape[0]]
        h = jax.nn.relu(h)
        return h

    # The generic refresh writes forward_layer outputs into emb[l+1]; for the
    # final logits it would store the last conv output, but JK logits need
    # every layer.  Override the final-layer hook: gather emb[1..L-1] (earlier
    # outputs) + current output, concat, apply the JK head.
    def _refresh_layer_fn(self, layer: int, vr: bool, use_aggregation: bool):
        key = (layer, vr, use_aggregation, "jk")
        if key in self._refresh_fns:
            return self._refresh_fns[key]
        L = self.cfg.num_layers
        if layer < L - 1:
            fn = super()._refresh_layer_fn(layer, vr, use_aggregation)
            self._refresh_fns[key] = fn
            return fn

        D = self.hist_dim

        def fn(params, state, hist, x_table, out_table, batch):
            emb, emb_ag = hist.emb, hist.emb_ag
            dim = self.layer_input_dim(layer)
            x_in = jnp.take(emb[layer], batch.n_id, axis=0)[:, :dim].astype(jnp.float32)
            if vr:
                ag = self.vr_aggregate(batch.adj, x_in)
                from incagg_gnn_tpu.models.nn import pad_cols
                emb_ag = tup_set(
                    emb_ag, layer, emb_ag[layer].at[batch.push_idx].set(
                        pad_cols(ag, D).astype(emb_ag[layer].dtype)))
            out_l = self.forward_layer(params, state, layer, x_in, None, batch.adj,
                                       use_aggregation)
            r_pad = batch.adj.num_rows
            # gather earlier layer outputs (emb[1..L-1] hold outputs 0..L-2);
            # slice to hidden width (cache width may be max(in, hidden))
            hid = self.cfg.hidden_channels
            xs = [
                jnp.take(emb[j], batch.push_idx, axis=0)[:, :hid].astype(jnp.float32)
                for j in range(1, L)
            ] + [out_l[:r_pad]]
            logits = linear(params["jk"], jnp.concatenate(xs, axis=-1))
            out_table = out_table.at[batch.push_idx].set(logits)
            return HistoryState(emb, emb_ag), out_table

        jfn = jax.jit(fn, donate_argnums=(2, 4))
        self._refresh_fns[key] = jfn
        return jfn
