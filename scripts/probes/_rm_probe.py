"""Isolate the reddit-mid train-batch aggregation: bi-hybrid vs bi-block
fwd+bwd at the exact per-batch shape (IB-only cluster subgraph, d=1024).

Usage: python _rm_probe.py [d] [thresh]
"""
import sys
import time

import numpy as np

from incagg_gnn_tpu.graph.csr import gcn_norm, permute
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.graph.partition import partition_graph
from incagg_gnn_tpu.graph.relabel import relabel_one_hop_within_batch
from incagg_gnn_tpu.ops.block import (
    build_bi_block_hybrid, plan_block_tier, spmm_block_bi)
from incagg_gnn_tpu.ops.ell import build_bi_hybrid_adj, spmm_bi


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/incagg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import ml_dtypes

    data, _, _ = make_sbm(num_nodes=100_000, num_classes=41, num_features=8,
                          avg_degree=100.0, seed=42)
    perm, ptr = partition_graph(data.adj_t, 20, seed=42)
    data = permute(data, perm)
    data.adj_t = gcn_norm(data.adj_t.set_diag())
    idx = np.arange(ptr[0], ptr[1])
    rowptr, col, value, n_id = relabel_one_hop_within_batch(
        data.adj_t, idx, True)
    r = len(idx)
    r_pad = ((r + 127) // 128) * 128
    print(f"batch: rows={r} edges={col.size} deg={col.size/r:.1f}", flush=True)

    th = (int(sys.argv[2]) if len(sys.argv) > 2 else
          plan_block_tier(rowptr, col, r_pad, x_itemsize=2, a_itemsize=2,
                          d_hint=d))
    print(f"thresh={th}", flush=True)
    blk = build_bi_block_hybrid(rowptr, col, value, r_pad, r_pad, thresh=th,
                                a_dtype=ml_dtypes.bfloat16)
    nb = blk.fwd.dense.a.shape[0]
    e_rem = int((blk.fwd.rem.ell_vals != 0).sum()) + int(
        (blk.fwd.rem.ovf_vals != 0).sum())
    print(f"tiles={nb}+{blk.bwd.dense.a.shape[0]} "
          f"({nb * 32768 / 1e6:.0f} MB/dir) rem_edges={e_rem} "
          f"K_rem={blk.fwd.rem.ell_cols.shape[1]}", flush=True)
    hyb = build_bi_hybrid_adj(rowptr, col, value, r_pad, r_pad)
    print(f"hyb K={hyb.fwd.ell_cols.shape[1]} K_t={hyb.bwd.ell_cols.shape[1]} "
          f"ovf={hyb.fwd.ovf_rows.shape[0]}", flush=True)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((r_pad, d)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((r_pad, d)) * 0.1, jnp.bfloat16)
    iters = 30

    def timed(fn, ops):
        def run_fn(x, w, ops):
            def step(h, _):
                g = jax.grad(lambda h: (fn(ops, h) * w).sum().astype(
                    jnp.float32))(h)
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

    e = col.size
    t_h = timed(spmm_bi, hyb)
    print(f"bi-hybrid: {t_h*1e6:.0f} us/step ({2*e/t_h/1e6:.0f}M edges/s)",
          flush=True)
    t_b = timed(spmm_block_bi, blk)
    print(f"bi-block:  {t_b*1e6:.0f} us/step ({2*e/t_b/1e6:.0f}M edges/s) "
          f"[{t_h/t_b:.2f}x]", flush=True)


if __name__ == "__main__":
    main()
