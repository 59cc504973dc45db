# Pallas VMEM ELL kernel vs XLA hybrid on a batch-sized graph (real TPU)
import time, numpy as np, jax, jax.numpy as jnp
from incagg_gnn_tpu.graph.csr import CSRGraph, gcn_norm
from incagg_gnn_tpu.ops.ell import build_hybrid_adj, spmm_hybrid
from incagg_gnn_tpu.ops.pallas_spmm import pallas_spmm_ell_vmem

rng = np.random.default_rng(0)
n, d, deg = 8192, 128, 16
row = rng.integers(0, n, n*deg); col = rng.integers(0, n, n*deg)
g = CSRGraph.from_coo(row, col, n, rng.random(n*deg).astype(np.float32))
e = g.nnz
hyb = build_hybrid_adj(g.rowptr, g.col, g.value, n, n, k=32)
print(f"e={e} K=32 ovf={int((hyb.ovf_vals!=0).sum())}", flush=True)
x = jnp.asarray(rng.standard_normal((n, d))*0.1, jnp.float32)
ITERS = 20

def bench(name, step):
    @jax.jit
    def run(x):
        def body(h, _):
            return step(h), None
        h, _ = jax.lax.scan(body, x, None, length=ITERS)
        return h.sum()
    float(run(x))
    best = 1e9
    for _ in range(2):
        t0=time.perf_counter(); float(run(x)); best=min(best, time.perf_counter()-t0)
    dt = best/ITERS
    print(f"{name}: {dt*1e3:.3f} ms -> {e/dt/1e6:.1f} M edges/s", flush=True)

bench("xla hybrid", lambda h: spmm_hybrid(hyb, h))
bench("pallas vmem", lambda h: pallas_spmm_ell_vmem(hyb.ell_cols, hyb.ell_vals, h, block_rows=256))
