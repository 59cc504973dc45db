"""Measure bf16 variants of the hybrid ELL SpMM on the v5e (bench shape).

Variants (scan-chained, scalar readback — honest through the tunnel):
  f32       : current bench path (x f32, vals f32)
  bf16_x    : x bf16, vals f32 -> product/accum f32, output cast bf16
  bf16_all  : x bf16, vals bf16, accumulate f32 (sum dtype), output bf16
  bf16_acc  : x bf16, vals bf16, accumulate bf16 (cheapest, least precise)
"""
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
padj = build_hybrid_adj(adj.rowptr, adj.col, adj.value, n_pad, n_pad)
x32 = jnp.asarray(
    np.random.default_rng(1).standard_normal((n_pad, d)) * 0.1, jnp.float32)
x16 = x32.astype(jnp.bfloat16)
vals16 = padj.ell_vals.astype(jnp.bfloat16)
ovals16 = padj.ovf_vals.astype(jnp.bfloat16)


def spmm_var(x, ell_vals, ovf_vals, acc_dtype, out_dtype):
    g = jnp.take(x, padj.ell_cols.reshape(-1), axis=0)
    g = g.reshape(padj.ell_cols.shape + (x.shape[1],))
    out = (g * ell_vals[..., None]).sum(axis=1, dtype=acc_dtype)
    go = jnp.take(x, padj.ovf_cols, axis=0) * ovf_vals[:, None]
    out = out + jax.ops.segment_sum(
        go.astype(acc_dtype), padj.ovf_rows, num_segments=padj.num_rows,
        indices_are_sorted=True)
    return out.astype(out_dtype)


def bench(tag, x0, ell_vals, ovf_vals, acc_dtype):
    out_dtype = x0.dtype

    @jax.jit
    def run(x):
        def body(h, _):
            return spmm_var(h, ell_vals, ovf_vals, acc_dtype, out_dtype), None
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
                      "ms_per_iter": round(best / iters * 1e3, 3)}), flush=True)
    return eps


bench("f32", x32, padj.ell_vals, padj.ovf_vals, jnp.float32)
bench("bf16_x", x16, padj.ell_vals, padj.ovf_vals, jnp.float32)
bench("bf16_all", x16, vals16, ovals16, jnp.float32)
bench("bf16_acc", x16, vals16, ovals16, jnp.bfloat16)

# numeric check: bf16_all vs f32 relative error
o32 = np.asarray(spmm_var(x32, padj.ell_vals, padj.ovf_vals, jnp.float32,
                          jnp.float32))
o16 = np.asarray(spmm_var(x16, vals16, ovals16, jnp.float32,
                          jnp.bfloat16)).astype(np.float32)
rel = np.abs(o16 - o32).max() / (np.abs(o32).max() + 1e-9)
print(json.dumps({"tag": "relerr_bf16_all", "max_rel": float(rel)}), flush=True)
