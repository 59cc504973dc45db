"""Packed-row gather variants for the hybrid ELL SpMM (v5e).

Hypothesis: the SpMM is gather-ISSUE-bound (~155M rows/s ceiling), so
gathering one 2p-wide row per p edges-to-adjacent-nodes... no — per edge we
still need its own source row, but we can FUSE p node rows into one packed
row: gather x_packed[col >> log2(p)] (1/p distinct-issue width amortization
only when cols hit the same packed row? NO: every edge still issues one
gather of a p*D row; the win is that each issue moves p*D bytes, and the
needed D-slice is selected with VPU arithmetic.  Issue count is UNCHANGED
(R*K gathers) but each gather is wider; if the engine is issue-rate-bound
(fixed rows/s regardless of width up to some size), wider rows don't help
either... unless the bound is per-byte at small widths.  The earlier
gather-only probe measured ~155M rows/s at D=256*4B=1KB; this experiment
directly tests whether wider rows keep the same issue rate (→ no win) or
the same byte rate (→ p-fold win is impossible, but narrower D benefits).

The real win available: DEDUPLICATED gather.  Within one ELL row block the
K columns of consecutive rows overlap heavily after the cluster permutation.
Variant 'rowblk' reshapes the gather so XLA sees [R*K] sorted-ish indices —
already the case.  So this script just measures width scaling to settle the
issue-rate question: gather of [E] random rows from tables of row width
w ∈ {64, 128, 256, 512, 1024} bytes... approximated via D columns f32/bf16.
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
rng = np.random.default_rng(1)
x32 = jnp.asarray(rng.standard_normal((n_pad, d)) * 0.1, jnp.float32)


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


# -- A: pure gather width scaling (no SpMM): E gathers of width dd --------
idx = jnp.asarray(np.sort(rng.integers(0, n_pad, size=e)).astype(np.int32))
for dd, dt in [(64, jnp.float32), (128, jnp.float32), (256, jnp.float32),
               (512, jnp.float32), (256, jnp.bfloat16), (1024, jnp.bfloat16)]:
    tab = jnp.asarray(rng.standard_normal((n_pad, dd)) * 0.1).astype(dt)

    def g_fn(tab, idx=idx):
        def body(s, _):
            g = jnp.take(tab, idx, axis=0)
            return s + g.sum(dtype=jnp.float32) * 1e-9, None
        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=iters)
        return s

    timeit(f"gatheronly_d{dd}_{jnp.dtype(dt).name}", g_fn, tab,
           {"bytes_per_row": dd * jnp.dtype(dt).itemsize})

# -- B: packed-pair SpMM: x packed [n/2, 2d], select half via arithmetic --
cols = padj.ell_cols
hi, lo = cols >> 1, (cols & 1).astype(jnp.float32)
ocols = padj.ovf_cols
ohi, olo = ocols >> 1, (ocols & 1).astype(jnp.float32)


def spmm_pair(x2, vals, ovals, acc=jnp.float32):
    g = jnp.take(x2, hi.reshape(-1), axis=0)
    g = g.reshape(hi.shape + (2, d))
    sel = g[:, :, 0, :] * (1.0 - lo[..., None]) + g[:, :, 1, :] * lo[..., None]
    out = (sel * vals[..., None]).sum(axis=1, dtype=acc)
    go = jnp.take(x2, ohi, axis=0).reshape(-1, 2, d)
    gsel = go[:, 0, :] * (1.0 - olo[:, None]) + go[:, 1, :] * olo[:, None]
    out = out + jax.ops.segment_sum(
        (gsel * ovals[:, None]).astype(acc), padj.ovf_rows,
        num_segments=padj.num_rows, indices_are_sorted=True)
    return out


def pair_loop(x, vals, ovals):
    def body(h, _):
        h2 = h.reshape(n_pad // 2, 2 * d)
        return spmm_pair(h2, vals, ovals).astype(h.dtype), None
    h, _ = jax.lax.scan(body, x, None, length=iters)
    return h.astype(jnp.float32).sum()

timeit("pair2_f32", lambda x: pair_loop(x, padj.ell_vals, padj.ovf_vals), x32)
x16 = x32.astype(jnp.bfloat16)
v16, ov16 = padj.ell_vals.astype(jnp.bfloat16), padj.ovf_vals.astype(jnp.bfloat16)
timeit("pair2_bf16", lambda x: pair_loop(x, v16, ov16), x16)

# correctness of the pair trick vs plain hybrid
from incagg_gnn_tpu.ops.ell import spmm_hybrid
ref = np.asarray(spmm_hybrid(padj, x32))
got = np.asarray(spmm_pair(x32.reshape(n_pad // 2, 2 * d), padj.ell_vals,
                           padj.ovf_vals))
print(json.dumps({"tag": "pair_maxerr",
                  "err": float(np.abs(ref - got).max())}), flush=True)
