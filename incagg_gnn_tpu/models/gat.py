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
from incagg_gnn_tpu.ops.ell import BiHybridAdj, HybridAdj
from incagg_gnn_tpu.ops.spmm import PaddedAdj, segment_softmax

import jax.ops

_NEG = jnp.float32(-1e30)


def _hybrid_att_coeffs(fwd: HybridAdj, a_src, a_dst):
    """Masked leaky-relu scores and row-softmax attention over the hybrid
    layout.  Returns (att_e [R,K,H], att_o [O,H], pre_e, pre_o, valid_e,
    valid_o) — pre-activations kept for the backward's leaky-relu factor."""
    assert not fwd.ext, (
        "GAT attention reads only the ELL core + overflow; a bucketed adj "
        "(non-empty ext levels) would silently drop extension edges — "
        "build GAT adjacencies with bucket_ext=False")
    r_pad = fwd.num_rows
    valid_e = (fwd.ell_vals != 0)[..., None]
    pre_e = jnp.take(a_src, fwd.ell_cols, axis=0) + a_dst[:, None, :]
    sc_e = jnp.where(valid_e, jax.nn.leaky_relu(pre_e, 0.2), _NEG)
    valid_o = (fwd.ovf_vals != 0)[:, None]
    pre_o = (jnp.take(a_src, fwd.ovf_cols, axis=0)
             + jnp.take(a_dst, fwd.ovf_rows, axis=0))
    sc_o = jnp.where(valid_o, jax.nn.leaky_relu(pre_o, 0.2), _NEG)

    m = sc_e.max(axis=1)
    if fwd.ovf_rows.shape[0] > 0:
        m = jnp.maximum(m, jax.ops.segment_max(
            sc_o, fwd.ovf_rows, num_segments=r_pad, indices_are_sorted=True))
    m = jnp.where(m > _NEG / 2, m, 0.0)
    e_e = jnp.where(valid_e, jnp.exp(sc_e - m[:, None, :]), 0.0)
    z = e_e.sum(axis=1)
    e_o = jnp.zeros_like(sc_o)
    if fwd.ovf_rows.shape[0] > 0:
        e_o = jnp.where(
            valid_o, jnp.exp(sc_o - jnp.take(m, fwd.ovf_rows, axis=0)), 0.0)
        z = z + jax.ops.segment_sum(
            e_o, fwd.ovf_rows, num_segments=r_pad, indices_are_sorted=True)
    z = jnp.maximum(z, 1e-16)
    att_e = e_e / z[:, None, :]
    att_o = e_o / jnp.take(z, fwd.ovf_rows, axis=0)
    return att_e, att_o, pre_e, pre_o, valid_e, valid_o


def _row_chunked(fn, r: int, bytes_per_row: int, *arrs):
    """Budgeted row-chunking of the [R, K, H, D] attention gathers (they OOM
    the chip at reddit-scale widths otherwise) — ops/ell.row_chunked, read at
    call time so the budget stays monkeypatch-/env-consistent with the ELL
    sum/max paths."""
    from incagg_gnn_tpu.ops.ell import row_chunked

    return row_chunked(fn, r, bytes_per_row, *arrs)


def _att_message_sum(fwd: HybridAdj, att_e, att_o, wx):
    """out[r] = Σ_slots att · wx[col]  (scatter-free over the hybrid;
    row-chunked under the gather budget)."""
    r_pad = fwd.num_rows
    k = fwd.ell_cols.shape[1]
    h, d = wx.shape[1], wx.shape[2]

    def ell_part(cols, att):
        g = jnp.take(wx, cols.reshape(-1), axis=0)
        g = g.reshape(cols.shape + wx.shape[1:])  # [rc, K, H, D]
        return (g * att[..., None]).sum(axis=1)

    out = _row_chunked(ell_part, r_pad, k * h * d * wx.dtype.itemsize,
                       fwd.ell_cols, att_e)
    if fwd.ovf_rows.shape[0] > 0:
        out = out + jax.ops.segment_sum(
            jnp.take(wx, fwd.ovf_cols, axis=0) * att_o[..., None],
            fwd.ovf_rows, num_segments=r_pad, indices_are_sorted=True)
    return out


def _to_bwd_layout(bwd: HybridAdj, t2f, flat):
    """Move per-edge values from forward-flat layout [F, H] onto the
    transpose via the static t2f permutation (pads -> 0); returns the bwd
    ELL block [C, K_t, H] and overflow block [O_t, H]."""
    v = jnp.where((t2f >= 0)[:, None],
                  jnp.take(flat, jnp.clip(t2f, 0), axis=0), 0.0)
    n_ell = bwd.ell_cols.shape[0] * bwd.ell_cols.shape[1]
    return (v[:n_ell].reshape(bwd.ell_cols.shape + flat.shape[1:]),
            v[n_ell:])


@jax.custom_vjp
def _att_block(adj: BiHybridAdj, a_src, a_dst, wx, drop_e, drop_o):
    """Attention aggregation ``out[r] = Σ_j softmax_j(sc)·drop·wx[j]`` with a
    **scatter-free backward**: every gradient that XLA's autodiff would turn
    into an unsorted scatter-add (d_wx, d_a_src) instead rides the transpose
    hybrid, with the forward-layout per-edge values (attention coefficients,
    score gradients) moved onto it by the static ``t2f`` slot permutation.
    ``drop_e/drop_o``: attention-dropout masks (already divided by keep-prob;
    ones at eval)."""
    att_e, att_o, *_ = _hybrid_att_coeffs(adj.fwd, a_src, a_dst)
    return _att_message_sum(adj.fwd, att_e * drop_e, att_o * drop_o, wx)


def _att_block_fwd(adj, a_src, a_dst, wx, drop_e, drop_o):
    return _att_block(adj, a_src, a_dst, wx, drop_e, drop_o), (
        adj, a_src, a_dst, wx, drop_e, drop_o)


def _att_block_bwd(res, g):
    adj, a_src, a_dst, wx, drop_e, drop_o = res
    fwd, bwd, t2f = adj.fwd, adj.bwd, adj.t2f
    r_pad = fwd.num_rows
    heads = wx.shape[1]
    # rematerialize the softmax (cheap; avoids storing [R,K,H] residuals)
    att_e, att_o, pre_e, pre_o, valid_e, valid_o = _hybrid_att_coeffs(
        fwd, a_src, a_dst)
    # d(att·drop): cotangent of each edge's (dropped) coefficient
    k = fwd.ell_cols.shape[1]
    d = wx.shape[2]

    def attd_part(cols, g_rows):
        gw = jnp.take(wx, cols.reshape(-1), axis=0)
        gw = gw.reshape(cols.shape + wx.shape[1:])  # [rc,K,H,D]
        return (gw * g_rows[:, None, :, :]).sum(-1)  # [rc,K,H]

    d_attd_e = _row_chunked(attd_part, r_pad,
                            k * heads * d * wx.dtype.itemsize,
                            fwd.ell_cols, g)
    d_attd_o = (jnp.take(wx, fwd.ovf_cols, axis=0)
                * jnp.take(g, fwd.ovf_rows, axis=0)).sum(-1)  # [O,H]
    d_att_e = d_attd_e * drop_e
    d_att_o = d_attd_o * drop_o
    # softmax backward per row: d_sc = att * (d_att - Σ_row att·d_att)
    sdot = (att_e * d_att_e).sum(axis=1)
    if fwd.ovf_rows.shape[0] > 0:
        sdot = sdot + jax.ops.segment_sum(
            att_o * d_att_o, fwd.ovf_rows, num_segments=r_pad,
            indices_are_sorted=True)
    d_sc_e = att_e * (d_att_e - sdot[:, None, :])
    d_sc_o = att_o * (d_att_o - jnp.take(sdot, fwd.ovf_rows, axis=0))
    # leaky-relu factor, masked to real edges
    d_pre_e = jnp.where(valid_e, d_sc_e * jnp.where(pre_e >= 0, 1.0, 0.2), 0.0)
    d_pre_o = jnp.where(valid_o, d_sc_o * jnp.where(pre_o >= 0, 1.0, 0.2), 0.0)
    # d_a_dst: row-local reduction (no scatter)
    d_a_dst = d_pre_e.sum(axis=1)
    if fwd.ovf_rows.shape[0] > 0:
        d_a_dst = d_a_dst + jax.ops.segment_sum(
            d_pre_o, fwd.ovf_rows, num_segments=r_pad, indices_are_sorted=True)
    # d_a_src: transpose-side reduction of d_pre (static-permutation gather)
    d_pre_flat = jnp.concatenate(
        [d_pre_e.reshape(-1, heads), d_pre_o], axis=0)
    dpb_e, dpb_o = _to_bwd_layout(bwd, t2f, d_pre_flat)
    d_a_src = dpb_e.sum(axis=1)
    if bwd.ovf_rows.shape[0] > 0:
        d_a_src = d_a_src + jax.ops.segment_sum(
            dpb_o, bwd.ovf_rows, num_segments=bwd.num_rows,
            indices_are_sorted=True)
    # d_wx: transpose aggregation of att·drop against the out-cotangent
    attd_flat = jnp.concatenate(
        [(att_e * drop_e).reshape(-1, heads), att_o * drop_o], axis=0)
    ab_e, ab_o = _to_bwd_layout(bwd, t2f, attd_flat)
    k_t = bwd.ell_cols.shape[1]

    def dwx_part(cols, ab):
        ge = jnp.take(g, cols.reshape(-1), axis=0)
        ge = ge.reshape(cols.shape + g.shape[1:])  # [rc,K_t,H,D]
        return (ge * ab[..., None]).sum(axis=1)

    d_wx = _row_chunked(dwx_part, bwd.num_rows,
                        k_t * heads * d * g.dtype.itemsize,
                        bwd.ell_cols, ab_e)
    if bwd.ovf_rows.shape[0] > 0:
        d_wx = d_wx + jax.ops.segment_sum(
            jnp.take(g, bwd.ovf_cols, axis=0) * ab_o[..., None],
            bwd.ovf_rows, num_segments=bwd.num_rows, indices_are_sorted=True)

    from incagg_gnn_tpu.ops.ell import _zero_cotangent as _zero

    return (jax.tree.map(_zero, adj), d_a_src, d_a_dst, d_wx,
            jnp.zeros_like(drop_e), jnp.zeros_like(drop_o))


_att_block.defvjp(_att_block_fwd, _att_block_bwd)


def gat_conv_bi(p, x: jnp.ndarray, adj: BiHybridAdj, heads: int,
                out_dim: int, concat: bool, rng, att_dropout: float,
                training: bool) -> jnp.ndarray:
    """Trainable scatter-free attention over the hybrid pair (custom VJP)."""
    assert adj.t2f is not None, (
        "GAT training over hybrid needs the transpose permutation "
        "(loader adj_perm=True)")
    r_pad = adj.fwd.num_rows
    wx = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    wx = wx.reshape(x.shape[0], heads, out_dim)
    a_src = (wx * p["a_l"]).sum(-1)
    a_dst = (wx[:r_pad] * p["a_r"]).sum(-1)
    k = adj.fwd.ell_cols.shape[1]
    o = adj.fwd.ovf_rows.shape[0]
    if training and att_dropout > 0.0 and rng is not None:
        ke, ko = jax.random.split(rng)
        keep = 1.0 - att_dropout
        drop_e = jax.random.bernoulli(
            ke, keep, (r_pad, k, heads)).astype(jnp.float32) / keep
        drop_o = jax.random.bernoulli(
            ko, keep, (o, heads)).astype(jnp.float32) / keep
    else:
        drop_e = jnp.ones((r_pad, k, heads), jnp.float32)
        drop_o = jnp.ones((o, heads), jnp.float32)
    out = _att_block(adj, a_src, a_dst, wx, drop_e, drop_o)
    if concat:
        out = out.reshape(r_pad, heads * out_dim)
    else:
        out = out.mean(axis=1)
    return out + (p["b"] if concat else p["b"].reshape(heads, out_dim).mean(0))


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
    gradient flows; the trainable variant is gat_conv_bi).  Per row the
    softmax reduces over the K ELL slots with the small COO overflow folded
    in via sorted segment max/sum."""
    r_pad = adj.num_rows
    wx = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    wx = wx.reshape(x.shape[0], heads, out_dim)
    a_src = (wx * p["a_l"]).sum(-1)  # [C_pad, H]
    a_dst = (wx[:r_pad] * p["a_r"]).sum(-1)  # [R_pad, H]
    att_e, att_o, *_ = _hybrid_att_coeffs(adj, a_src, a_dst)
    out = _att_message_sum(adj, att_e, att_o, wx)
    if concat:
        out = out.reshape(r_pad, heads * out_dim)
    else:
        out = out.mean(axis=1)
    return out + (p["b"] if concat else p["b"].reshape(heads, out_dim).mean(0))


def gat_conv(p, x: jnp.ndarray, adj, heads: int, out_dim: int,
             concat: bool, rng, att_dropout: float, training: bool) -> jnp.ndarray:
    """Edge-softmax attention over the padded edge list."""
    if isinstance(adj, BiHybridAdj):
        return gat_conv_bi(p, x, adj, heads, out_dim, concat, rng,
                           att_dropout, training)
    if isinstance(adj, HybridAdj):
        if training and att_dropout > 0.0 and rng is not None:
            raise ValueError(
                "GAT training over forward-only hybrid batches "
                "(adj_format='hybrid-fwd') cannot apply attention dropout; "
                "use adj_format='auto'/'hybrid' (scatter-free custom VJP) "
                "or 'coo'")
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

        from incagg_gnn_tpu.ops.agg import edge_counts

        n_ib, n_ob = edge_counts(batch.adj, batch.batch_size)
        aux = {"num_in_batch_neighbors": n_ib,
               "num_out_batch_neighbors": n_ob}
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
