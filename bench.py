"""Benchmark entry point (run by the driver on real TPU hardware).

Measures the hot kernel of the framework — the padded gather/segment-sum SpMM
that implements neighborhood aggregation (BASELINE.json metric:
"edges/s/chip (SpMM agg)") — on an ogbn-arxiv-scale synthetic graph at
hidden=256, plus the end-to-end Reverb/VR training-step throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is value / roofline, where roofline is the HBM-bandwidth bound
for the gather+scatter at this feature width on one v5e chip (~819 GB/s):
each edge moves ~3 rows of d*4 bytes (gather read + accumulate read/write),
so roofline ≈ BW / (3 * d * 4) edges/s.  The reference publishes no
throughput numbers (BASELINE.md), so the roofline fraction is the honest
denominator.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from incagg_gnn_tpu.graph.datasets import make_sbm
    from incagg_gnn_tpu.ops.spmm import build_padded_adj, spmm

    # ogbn-arxiv scale: 169K nodes, ~2.3M directed edges
    n, d = 169_343, 256
    data, _, _ = make_sbm(num_nodes=n, num_classes=40, num_features=8,
                          avg_degree=13.7, seed=0)
    from incagg_gnn_tpu.graph.csr import gcn_norm

    adj = gcn_norm(data.adj_t.set_diag())  # spectral radius ~1: safe to chain
    e = adj.nnz
    e_pad = ((e + 127) // 128) * 128
    n_pad = ((n + 128) // 128) * 128
    padj = build_padded_adj(adj.rowptr, adj.col, adj.value, n_pad, n_pad, e_pad)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((n_pad, d)),
                    dtype=jnp.float32)

    # chain iterations inside one jitted scan so timing can't be gamed by
    # dropped results or per-call dispatch overhead
    iters = 20

    @jax.jit
    def run(x):
        def body(h, _):
            return spmm(padj, h), None
        h, _ = jax.lax.scan(body, x, None, length=iters)
        return h

    run(x).block_until_ready()  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / (reps * iters)
    edges_per_s = e / dt

    hbm_bw = 819e9  # v5e HBM bandwidth, bytes/s
    roofline = hbm_bw / (3 * d * 4)
    print(json.dumps({
        "metric": "spmm_agg_edges_per_s_per_chip_d256",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / roofline, 4),
    }))


if __name__ == "__main__":
    main()
