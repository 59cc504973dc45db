"""Chip measurement of the bidirectional block tier (training fwd+bwd)
vs the bi-hybrid pair.

Usage: python _bi_probe.py [n] [avg_degree] [classes] [dtype] [d]
"""
import sys
import time

import numpy as np

from incagg_gnn_tpu.graph.csr import gcn_norm, permute
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.graph.partition import partition_graph
from incagg_gnn_tpu.ops.block import (
    build_bi_block_hybrid, plan_block_tier, spmm_block_bi)
from incagg_gnn_tpu.ops.ell import build_bi_hybrid_adj, spmm_bi


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 233_000
    avg_degree = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
    classes = int(sys.argv[3]) if len(sys.argv) > 3 else 41
    dtype_s = sys.argv[4] if len(sys.argv) > 4 else "bf16"
    d = int(sys.argv[5]) if len(sys.argv) > 5 else 256

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/incagg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import ml_dtypes

    data, _, _ = make_sbm(num_nodes=n, num_classes=classes, num_features=8,
                          avg_degree=avg_degree, seed=0)
    perm, ptr = partition_graph(data.adj_t, 200 if n > 150_000 else 80,
                                log=True)
    data = permute(data, perm)
    adj = gcn_norm(data.adj_t.set_diag())
    e = adj.nnz
    n_pad = ((n + 128) // 128) * 128
    dt = jnp.bfloat16 if dtype_s == "bf16" else jnp.float32
    a_np_dtype = ml_dtypes.bfloat16 if dtype_s == "bf16" else np.float32

    t0 = time.perf_counter()
    th = plan_block_tier(adj.rowptr, adj.col, n_pad,
                         x_itemsize=2 if dtype_s == "bf16" else 4, d_hint=d)
    print(f"plan: thresh={th} [{time.perf_counter()-t0:.1f}s]", flush=True)
    t0 = time.perf_counter()
    blk = None
    if th is not None:
        blk = build_bi_block_hybrid(adj.rowptr, adj.col, adj.value, n_pad,
                                    n_pad, thresh=th, a_dtype=a_np_dtype)
        gb = sum(a.dense.a.size * a.dense.a.dtype.itemsize
                 for a in (blk.fwd, blk.bwd)) / 1e9
        print(f"build: tiles={blk.fwd.dense.a.shape[0]}+"
              f"{blk.bwd.dense.a.shape[0]} hbm={gb:.2f}GB "
              f"[{time.perf_counter()-t0:.1f}s]", flush=True)

    t0 = time.perf_counter()
    hyb = build_bi_hybrid_adj(adj.rowptr, adj.col, adj.value, n_pad, n_pad)
    print(f"hybrid build [{time.perf_counter()-t0:.1f}s]", flush=True)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_pad, d)) * 0.1, dt)
    w = jnp.asarray(
        np.random.default_rng(2).standard_normal((n_pad, d)) * 0.1, dt)
    iters = 10

    def timed(fn, x, ops):
        # fwd+bwd: grad of sum(w * (A@x)) wrt x, chained so it's sequential
        def run_fn(x, w, ops):
            def step(h, _):
                g = jax.grad(
                    lambda h: (fn(ops, h) * w).sum().astype(jnp.float32))(h)
                return (h + 0.001 * g.astype(h.dtype)), None

            return jax.lax.scan(step, x, None, length=iters)[0].sum()

        run = jax.jit(run_fn)
        float(run(x, w, ops))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, w, ops))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    t_base = timed(spmm_bi, x, hyb)
    # fwd+bwd = 2 aggregations per step
    print(f"bi-hybrid: {t_base*1e3:.2f} ms/step = "
          f"{2*e/t_base/1e6:.1f}M agg-edges/s", flush=True)
    if blk is not None:
        t_blk = timed(spmm_block_bi, x, blk)
        print(f"bi-block:  {t_blk*1e3:.2f} ms/step = "
              f"{2*e/t_blk/1e6:.1f}M agg-edges/s ({t_base/t_blk:.2f}x)",
              flush=True)
        # numerics cross-check: holding BOTH formats plus two full-graph
        # grads exceeds HBM at the headline reddit shape (the CPU tests
        # cover equivalence exactly) — opt in with --check at small scales
        if "--check" in sys.argv:
            gh = jax.grad(lambda h: (spmm_bi(hyb, h) * w).sum().astype(
                jnp.float32))(x)
            gb2 = jax.grad(lambda h: (spmm_block_bi(blk, h) * w).sum().astype(
                jnp.float32))(x)
            ref = np.asarray(gh, np.float32)
            got = np.asarray(gb2, np.float32)
            err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
            print(f"grad max rel err: {err:.2e}")


if __name__ == "__main__":
    main()
