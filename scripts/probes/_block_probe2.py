"""Chip measurement of ops/block.py (production module) vs pure hybrid.

Usage: python _block_probe2.py [n] [avg_degree] [classes] [dtype] [d]
"""
import sys
import time

import numpy as np

from incagg_gnn_tpu.graph.csr import gcn_norm, permute
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.graph.partition import partition_graph
from incagg_gnn_tpu.ops.block import build_block_hybrid, plan_block_tier, spmm_block
from incagg_gnn_tpu.ops.ell import build_hybrid_adj, spmm_hybrid


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    avg_degree = float(sys.argv[2]) if len(sys.argv) > 2 else 50.0
    classes = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    dtype_s = sys.argv[4] if len(sys.argv) > 4 else "bf16"
    d = int(sys.argv[5]) if len(sys.argv) > 5 else 256

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/incagg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import ml_dtypes

    data, _, _ = make_sbm(num_nodes=n, num_classes=classes, num_features=8,
                          avg_degree=avg_degree, seed=0)
    perm, ptr = partition_graph(data.adj_t, 200 if n > 150_000 else 80, log=True)
    data = permute(data, perm)
    adj = gcn_norm(data.adj_t.set_diag())
    e = adj.nnz
    n_pad = ((n + 128) // 128) * 128
    dt = jnp.bfloat16 if dtype_s == "bf16" else jnp.float32
    a_np_dtype = ml_dtypes.bfloat16 if dtype_s == "bf16" else np.float32

    t0 = time.perf_counter()
    th = plan_block_tier(adj.rowptr, adj.col, n_pad,
                         x_itemsize=2 if dtype_s == "bf16" else 4, d_hint=d)
    print(f"plan: thresh={th} [{time.perf_counter()-t0:.1f}s]")
    t0 = time.perf_counter()
    blk = None
    if th is not None:
        blk = build_block_hybrid(adj.rowptr, adj.col, adj.value, n_pad, n_pad,
                                 thresh=th, a_dtype=a_np_dtype)
        gb = blk.dense.a.size * blk.dense.a.dtype.itemsize / 1e9
        print(f"build: tiles={blk.dense.a.shape[0]} steps="
              f"{blk.dense.brow_step.shape[0]} hbm={gb:.2f}GB "
              f"[{time.perf_counter()-t0:.1f}s]")
        blk = blk._replace(rem=blk.rem._replace(
            ell_vals=blk.rem.ell_vals.astype(dt),
            ovf_vals=blk.rem.ovf_vals.astype(dt)))

    full = build_hybrid_adj(adj.rowptr, adj.col, adj.value, n_pad, n_pad)
    full = full._replace(ell_vals=full.ell_vals.astype(dt),
                         ovf_vals=full.ovf_vals.astype(dt))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_pad, d)) * 0.1, dt)
    iters = 10

    def timed(fn, x, ops):
        run = jax.jit(lambda x, ops: jax.lax.scan(
            lambda h, _: (fn(ops, h), None), x, None, length=iters)[0].sum())
        float(run(x, ops))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, ops))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    t_base = timed(spmm_hybrid, x, full)
    print(f"hybrid: {t_base*1e3:.2f} ms = {e/t_base/1e6:.1f}M edges/s")
    if blk is not None:
        t_blk = timed(spmm_block, x, blk)
        print(f"block:  {t_blk*1e3:.2f} ms = {e/t_blk/1e6:.1f}M edges/s "
              f"({t_base/t_blk:.2f}x)")
        ref = np.asarray(spmm_hybrid(full, x), np.float32)
        got = np.asarray(spmm_block(blk, x), np.float32)
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
        print(f"max rel err: {err:.2e}")


if __name__ == "__main__":
    main()
