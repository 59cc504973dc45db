"""K-curve mapping for the hybrid ELL SpMM: k x dtype (v5e)."""
import json
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/incagg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from incagg_gnn_tpu.graph.csr import gcn_norm
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.ops.ell import build_hybrid_adj

n, d, iters = 100_000, 256, 10
data, _, _ = make_sbm(num_nodes=n, num_classes=16, num_features=8,
                      avg_degree=14.0, seed=0)
adj = gcn_norm(data.adj_t.set_diag())
e = adj.nnz
n_pad = ((n + 128) // 128) * 128
x32 = jnp.asarray(
    np.random.default_rng(1).standard_normal((n_pad, d)) * 0.1, jnp.float32)
x16 = x32.astype(jnp.bfloat16)


def spmm(padj, x, ell_vals, ovf_vals, acc):
    g = jnp.take(x, padj.ell_cols.reshape(-1), axis=0)
    g = g.reshape(padj.ell_cols.shape + (x.shape[1],))
    out = (g * ell_vals[..., None]).sum(axis=1, dtype=acc)
    go = jnp.take(x, padj.ovf_cols, axis=0) * ovf_vals[:, None]
    return (out + jax.ops.segment_sum(
        go.astype(acc), padj.ovf_rows, num_segments=padj.num_rows,
        indices_are_sorted=True)).astype(x.dtype)


def bench(tag, padj, x0, bf16):
    ev = padj.ell_vals.astype(jnp.bfloat16) if bf16 else padj.ell_vals
    ov = padj.ovf_vals.astype(jnp.bfloat16) if bf16 else padj.ovf_vals
    acc = jnp.bfloat16 if bf16 else jnp.float32

    @jax.jit
    def run(x):
        def body(h, _):
            return spmm(padj, h, ev, ov, acc), None
        h, _ = jax.lax.scan(body, x, None, length=iters)
        return h.astype(jnp.float32).sum()

    float(run(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, time.perf_counter() - t0)
    eps = e / (best / iters)
    print(json.dumps({"tag": tag, "edges_per_s": round(eps),
                      "ms_per_iter": round(best / iters * 1e3, 3),
                      "ovf": int(padj.ovf_rows.shape[0])}), flush=True)


for k in [12, 14, 16, 18, 20]:
    padj = build_hybrid_adj(adj.rowptr, adj.col, adj.value, n_pad, n_pad, k=k)
    bench(f"k{k}_f32", padj, x32, False)
    bench(f"k{k}_bf16", padj, x16, True)
