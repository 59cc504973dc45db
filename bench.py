"""Benchmark entry point (run by the driver on real TPU hardware).

Measures the hot kernel — neighborhood-aggregation SpMM — at the three
operating shapes the framework targets (BASELINE.md: GCN-arxiv,
GCNII/APPNP-products, GraphSAGE-reddit), each on the tier the trainer's
`adj_format=auto` policy actually selects there (docs/RESULTS.md
"Block-dense (MXU) aggregation tier"):

  arxiv-shape    deg 14,  hybrid ELL+COO, f32   (block tier auto-rejects)
  products-shape deg 50,  block+remainder, bf16
  reddit-shape   deg 100, block+remainder, bf16

All rows are scan-chained so the result is data-dependent end-to-end (no
async-dispatch timing artifacts through the axon tunnel).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "suite"}.
The headline row is the best tier (reddit-shape block).  vs_baseline =
edges/s divided by a FIXED reference bound: the HBM-bandwidth roofline of
an ideal gather-based SpMM at d=256 f32 on one v5e chip (819 GB/s /
(3 row moves x 256 x 4 B) = 266.6M edges/s).  The reference publishes no
throughput numbers (BASELINE.md), so this speed-of-light denominator is
the honest baseline; the dense MXU tier can exceed 1.0 by moving fewer
bytes per edge than any gather formulation — that is the design win.
The per-row "vs_tier_roofline" additionally reports each row against the
same bound scaled to its own compute dtype (bf16 moves half the bytes).
"""

import json
import sys
import time

import numpy as np

HBM_BW = 819e9  # v5e HBM bytes/s
D = 256
ROOFLINE_F32 = HBM_BW / (3 * D * 4)  # 266.6M edges/s — the fixed baseline


def _bench_shape(name, n, avg_degree, fmt, dtype_s, num_parts, classes,
                 iters=10):
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from incagg_gnn_tpu.graph.csr import gcn_norm, permute
    from incagg_gnn_tpu.graph.datasets import make_sbm
    from incagg_gnn_tpu.graph.partition import partition_graph
    from incagg_gnn_tpu.ops.block import (
        build_block_hybrid, plan_block_tier, spmm_block)
    from incagg_gnn_tpu.ops.ell import build_hybrid_adj, spmm_hybrid

    data, _, _ = make_sbm(num_nodes=n, num_classes=classes, num_features=8,
                          avg_degree=avg_degree, seed=0)
    adj = data.adj_t
    if fmt == "block":
        # the dense tier needs partition+permute locality (like the trainer)
        perm, ptr = partition_graph(adj, num_parts)
        data = permute(data, perm)
        adj = data.adj_t
    adj = gcn_norm(adj.set_diag())
    e = int(adj.nnz)
    n_pad = ((n + 128) // 128) * 128
    dt = jnp.bfloat16 if dtype_s == "bf16" else jnp.float32
    a_np = ml_dtypes.bfloat16 if dtype_s == "bf16" else np.float32
    itemsize = 2 if dtype_s == "bf16" else 4

    ops, fn = None, None
    if fmt == "block":
        th = plan_block_tier(adj.rowptr, adj.col, n_pad,
                             x_itemsize=itemsize, a_itemsize=itemsize,
                             d_hint=D)
        if th is not None:
            blk = build_block_hybrid(adj.rowptr, adj.col, adj.value,
                                     n_pad, n_pad, thresh=th, a_dtype=a_np)
            blk = blk._replace(rem=blk.rem._replace(
                ell_vals=blk.rem.ell_vals.astype(dt),
                ovf_vals=blk.rem.ovf_vals.astype(dt)))
            ops, fn = blk, spmm_block
        else:
            fmt = "hybrid"  # tier auto-rejected: report the actual path
    if ops is None:
        hyb = build_hybrid_adj(adj.rowptr, adj.col, adj.value, n_pad, n_pad)
        hyb = hyb._replace(ell_vals=hyb.ell_vals.astype(dt),
                           ovf_vals=hyb.ovf_vals.astype(dt))
        ops, fn = hyb, spmm_hybrid

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_pad, D)) * 0.1, dt)

    @jax.jit
    def run(x, ops):
        def body(h, _):
            return fn(ops, h), None
        h, _ = jax.lax.scan(body, x, None, length=iters)
        return h.sum()

    float(run(x, ops))  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, ops))  # scalar readback forces completion
        best = min(best, time.perf_counter() - t0)
    edges_per_s = e / (best / iters)
    tier_roof = HBM_BW / (3 * D * itemsize)
    return {
        "shape": name, "fmt": fmt, "dtype": dtype_s,
        "n": n, "edges": e,
        "edges_per_s": round(edges_per_s),
        "vs_baseline": round(edges_per_s / ROOFLINE_F32, 4),
        "vs_tier_roofline": round(edges_per_s / tier_roof, 4),
    }


def main():
    import jax

    # persistent compilation cache: compiles through the chip tunnel take
    # minutes; cache them across bench invocations
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/incagg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    shapes = [
        # round-1 headline row kept first (VERDICT r1 #1); community widths
        # follow the sbm presets (reddit = 41 classes: ~5.7K-wide
        # communities give the high LOCAL block density real reddit has —
        # 16 classes is the uniform-density pessimum, docs/RESULTS.md
        # "Products-mid ... when the tier pays")
        ("arxiv", 100_000, 14.0, "hybrid", "f32", 80, 16),
        ("products", 100_000, 50.0, "block", "bf16", 80, 16),
        ("reddit", 233_000, 100.0, "block", "bf16", 200, 41),
    ]
    suite = []
    for args in shapes:
        row = _bench_shape(*args)
        suite.append(row)
        print(f"# {row}", file=sys.stderr)

    head = max(suite, key=lambda r: r["vs_baseline"])
    print(json.dumps({
        "metric": f"spmm_agg_edges_per_s_per_chip_d256_{head['shape']}"
                  f"_{head['fmt']}",
        "value": head["edges_per_s"],
        "unit": "edges/s",
        "vs_baseline": head["vs_baseline"],
        "suite": suite,
    }))


if __name__ == "__main__":
    main()
