"""Benchmark entry point (run by the driver on real TPU hardware).

Measures the hot kernel — the sorted gather/segment-sum SpMM implementing
neighborhood aggregation (BASELINE.json metric: "edges/s/chip (SpMM agg)") —
on a partitioned synthetic graph at hidden width 256, using a scan-chained
loop so the result is data-dependent end-to-end (no async-dispatch or
dead-code timing artifacts; the axon tunnel otherwise reports fantasy
numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline = value / roofline, where roofline is the HBM-bandwidth bound for
the gather+accumulate at this width on one v5e chip (819 GB/s; ~3 row moves
of d*4 bytes per edge).  The reference publishes no throughput numbers
(BASELINE.md), so the roofline fraction is the honest denominator.
"""

import json
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: compiles through the chip tunnel take
    # minutes; cache them across bench invocations
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/incagg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
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
    # scatter-free hybrid ELL+COO path (measured 1.7x over COO segment-sum)
    padj = build_hybrid_adj(adj.rowptr, adj.col, adj.value, n_pad, n_pad)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_pad, d)) * 0.1, jnp.float32
    )

    @jax.jit
    def run(x):
        def body(h, _):
            return spmm_hybrid(padj, h), None
        h, _ = jax.lax.scan(body, x, None, length=iters)
        return h.sum()

    float(run(x))  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))  # scalar readback forces completion
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    edges_per_s = e / dt

    hbm_bw = 819e9  # v5e HBM bytes/s
    roofline = hbm_bw / (3 * d * 4)
    print(json.dumps({
        "metric": "spmm_agg_edges_per_s_per_chip_d256",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / roofline, 4),
    }))


if __name__ == "__main__":
    main()
