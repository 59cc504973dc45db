"""On-chip sweep for the arxiv (deg-14) train row — the one shape that has
never hit its bar (VERDICT r4 item 2: >=80M e/s train, >=0.6x tier
roofline; r4 captured 77.6M with 79.7M on-chip).

Two attack lines from the r4 traces:
  (a) dispatch amortization — the axon tunnel adds ~30-38 ms per call;
      at iters=50 that is ~0.7 ms/iter on an 18.8 ms/iter chain (~3.7%).
      Sweep iters 50/100/200.
  (b) layout retune — choose_k_levels' cost constants were validated at
      reddit/products degree histograms; sweep single-K {8,16,24} and
      forced bucketed variants against the auto pick at deg 14.

Uses bench.py's exact measurement harness (same scan chain, same warmup
and best-two-agree timing) so numbers are driver-comparable.

    python scripts/probes/_arxiv_tune.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

import bench
from bench import _setup_jax, _time_run

N, DEG, PARTS, CLASSES = 100_000, 14.0, 80, 16
D = bench.D


def build_adj(variant: str):
    import jax.numpy as jnp

    from incagg_gnn_tpu.graph.csr import gcn_norm
    from incagg_gnn_tpu.graph.datasets import make_sbm
    from incagg_gnn_tpu.ops import ell as ell_mod
    from incagg_gnn_tpu.ops.ell import build_bi_hybrid_adj, spmm_bi

    data, _, _ = make_sbm(num_nodes=N, num_classes=CLASSES, num_features=8,
                          avg_degree=DEG, seed=0)
    adj = gcn_norm(data.adj_t.set_diag())
    e = int(adj.nnz)
    n_pad = ((N + 128) // 128) * 128

    kw = {}
    patch = None
    if variant == "auto":
        pass
    elif variant.startswith("k"):  # single-K
        kw = dict(k=int(variant[1:]), k_t=int(variant[1:]),
                  bucket_ext=False)
    elif variant.startswith("b"):  # forced bucket widths "b8+8" etc
        k0, exts = variant[1:].split("+", 1)
        widths = tuple(int(w) for w in exts.split("+"))
        orig = ell_mod.choose_k_levels

        def forced(deg, **_kw):
            return int(k0), widths

        ell_mod.choose_k_levels = forced
        patch = (ell_mod, orig)
        kw = dict(bucket_ext=True)
    else:
        raise ValueError(variant)
    try:
        bi = build_bi_hybrid_adj(adj.rowptr, adj.col, adj.value,
                                 n_pad, n_pad, **kw)
    finally:
        if patch:
            patch[0].choose_k_levels = orig
    desc = {
        "k_fwd": int(bi.fwd.ell_cols.shape[1]),
        "ext_fwd": [int(x.cols.shape[1]) for x in bi.fwd.ext],
        "ovf_fwd": int(bi.fwd.ovf_cols.shape[0]),
        "k_bwd": int(bi.bwd.ell_cols.shape[1]),
        "ext_bwd": [int(x.cols.shape[1]) for x in bi.bwd.ext],
        "ovf_bwd": int(bi.bwd.ovf_cols.shape[0]),
    }
    return bi, spmm_bi, e, n_pad, desc


def measure(variant: str, iters: int) -> float:
    jax = _setup_jax()
    import jax.numpy as jnp

    ops, fn, e, n_pad, desc = build_adj(variant)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_pad, D)) * 0.1,
        jnp.float32)
    w = jnp.asarray(
        np.random.default_rng(3).standard_normal((D, D)) * 0.05, x.dtype)

    def step(h, w_, o):
        def f(v, w_):
            return (fn(o, v) @ w_).sum().astype(jnp.float32)
        _, (dx, dw) = jax.value_and_grad(f, argnums=(0, 1))(h, w_)
        return ((h - 1e-3 * dx.astype(h.dtype)).astype(h.dtype),
                (w_ - 1e-3 * dw.astype(w_.dtype)).astype(w_.dtype))

    @jax.jit
    def run(x, w, ops):
        def body(carry, _):
            h, w_ = carry
            return step(h, w_, ops), None
        (h, w_), _ = jax.lax.scan(body, (x, w), None, length=iters)
        return h.sum().astype(jnp.float32) + w_.sum().astype(jnp.float32)

    def timed():
        float(run(x, w, ops))

    t = _time_run(timed)
    eps = e / (t / iters)
    print(f"{variant:10s} iters={iters:4d} {eps/1e6:7.1f}M e/s  "
          f"({t/iters*1e3:.2f} ms/iter)  {desc}", flush=True)
    return eps


if __name__ == "__main__":
    variants = sys.argv[1:] or ["auto", "k8", "k16", "k24",
                                "b8+8", "b8+8+16", "b8+16"]
    best = (None, 0.0)
    for v in variants:
        eps = measure(v, 50)
        if eps > best[1]:
            best = (v, eps)
    print(f"\nbest @50: {best[0]} {best[1]/1e6:.1f}M; iters sweep on it:")
    for it in (100, 200):
        measure(best[0], it)
