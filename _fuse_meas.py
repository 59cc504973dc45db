"""ELL SpMM fusion/width experiments (v5e).

Facts so far: gather engine does ~430-465M rows/s up to 1KB rows; full
hybrid SpMM runs at 106M edges/s — ~4x below the gather ceiling at the
actual R*K issue count.  Hypothesis: XLA materializes the gathered
[R, K, D] tensor in HBM (2.4 GB round trip per iteration).  Variants:

  k{8,16,24,32} : ELL width sweep (fewer slots = fewer gathers + smaller
                  materialization, more COO overflow)
  blocked{192,384,768} : lax.map over row blocks — bounds the intermediate
                  to [rb, K, D] (a few MB), giving XLA a VMEM-resident
                  working set per step
  dotg          : einsum('rk,rkd->rd') via dot_general (batched matvec)
  unweighted    : no ell_vals multiply (factorized-norm trick) — isolates
                  the multiply cost
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
from incagg_gnn_tpu.ops.ell import build_hybrid_adj, spmm_hybrid

n, d, iters = 100_000, 256, 10
data, _, _ = make_sbm(num_nodes=n, num_classes=16, num_features=8,
                      avg_degree=14.0, seed=0)
adj = gcn_norm(data.adj_t.set_diag())
e = adj.nnz
n_pad = ((n + 128) // 128) * 128
x32 = jnp.asarray(
    np.random.default_rng(1).standard_normal((n_pad, d)) * 0.1, jnp.float32)


def timeit(tag, fn, x0, extra=None):
    run = jax.jit(fn)
    float(run(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, time.perf_counter() - t0)
    eps = e / (best / iters)
    print(json.dumps({"tag": tag, "edges_per_s": round(eps),
                      "ms_per_iter": round(best / iters * 1e3, 3),
                      **(extra or {})}), flush=True)


def chain(spmm):
    def fn(x):
        def body(h, _):
            return spmm(h), None
        h, _ = jax.lax.scan(body, x, None, length=iters)
        return h.sum()
    return fn


# -- K sweep --------------------------------------------------------------
for k in [8, 16, 24, 32]:
    padj_k = build_hybrid_adj(adj.rowptr, adj.col, adj.value, n_pad, n_pad,
                              k=k)
    timeit(f"k{k}", chain(lambda h, p=padj_k: spmm_hybrid(p, h)), x32,
           {"ovf": int(padj_k.ovf_rows.shape[0])})

padj = build_hybrid_adj(adj.rowptr, adj.col, adj.value, n_pad, n_pad)
K = padj.ell_cols.shape[1]
print(json.dumps({"tag": "default_k", "k": K}), flush=True)


def ovf_part(x, out, acc=jnp.float32):
    go = jnp.take(x, padj.ovf_cols, axis=0) * padj.ovf_vals[:, None]
    return out + jax.ops.segment_sum(
        go.astype(acc), padj.ovf_rows, num_segments=padj.num_rows,
        indices_are_sorted=True)


# -- blocked (lax.map over row tiles) ------------------------------------
def make_blocked(rb):
    R = padj.ell_cols.shape[0]
    nb = (R + rb - 1) // rb
    R2 = nb * rb
    cols = np.asarray(padj.ell_cols)
    vals = np.asarray(padj.ell_vals)
    cols_p = np.full((R2, K), n_pad - 1, np.int32)
    vals_p = np.zeros((R2, K), np.float32)
    cols_p[:R], vals_p[:R] = cols, vals
    cols_b = jnp.asarray(cols_p.reshape(nb, rb, K))
    vals_b = jnp.asarray(vals_p.reshape(nb, rb, K))

    def spmm(x):
        def blk(cv):
            c, v = cv
            g = jnp.take(x, c.reshape(-1), axis=0).reshape(rb, K, d)
            return (g * v[..., None]).sum(axis=1)
        out = jax.lax.map(blk, (cols_b, vals_b)).reshape(R2, d)[:R]
        return ovf_part(x, out)

    return spmm


for rb in [192, 384, 768]:
    timeit(f"blocked_rb{rb}", chain(make_blocked(rb)), x32)


# -- dot_general batched matvec ------------------------------------------
def spmm_dotg(x):
    g = jnp.take(x, padj.ell_cols.reshape(-1), axis=0)
    g = g.reshape(padj.ell_cols.shape + (d,))
    out = jnp.einsum("rk,rkd->rd", padj.ell_vals, g,
                     preferred_element_type=jnp.float32)
    return ovf_part(x, out)

timeit("dotg", chain(spmm_dotg), x32)


# -- unweighted (multiply-cost isolation) --------------------------------
def spmm_unw(x):
    g = jnp.take(x, padj.ell_cols.reshape(-1), axis=0)
    g = g.reshape(padj.ell_cols.shape + (d,))
    out = g.sum(axis=1)
    return ovf_part(x, out)

timeit("unweighted", chain(spmm_unw), x32)

# correctness: blocked vs reference
ref = np.asarray(spmm_hybrid(padj, x32))
got = np.asarray(make_blocked(384)(x32))
print(json.dumps({"tag": "blocked_maxerr",
                  "err": float(np.abs(ref - got).max())}), flush=True)
