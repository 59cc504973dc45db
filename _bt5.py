# Hybrid ELL vs sorted segment_sum on TPU, scan-chained.
import time, numpy as np, jax, jax.numpy as jnp
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.graph.csr import gcn_norm
from incagg_gnn_tpu.ops.spmm import build_padded_adj, spmm
from incagg_gnn_tpu.ops.ell import build_hybrid_adj, spmm_hybrid, choose_k

n, deg, d = 100_000, 14, 256
data, _, _ = make_sbm(num_nodes=n, num_classes=16, num_features=8, avg_degree=deg, seed=0)
adj = gcn_norm(data.adj_t.set_diag())
e = adj.nnz
n_pad = ((n + 128)//128)*128
degs = np.diff(adj.rowptr)
k = choose_k(degs)
print(f"e={e}, max_deg={degs.max()}, K={k}, ell slots={n_pad*k} (waste {n_pad*k/e:.2f}x), ovf={int(np.maximum(degs-k,0).sum())}", flush=True)
hadj = build_hybrid_adj(adj.rowptr, adj.col, adj.value, n_pad, n_pad, k)
x = jnp.asarray(np.random.default_rng(1).standard_normal((n_pad, d))*0.1, jnp.float32)
ITERS = 10

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
        t0 = time.perf_counter(); float(run(x)); best = min(best, time.perf_counter()-t0)
    dt = best/ITERS
    print(f"{name}: {dt*1e3:.2f} ms -> {e/dt/1e6:.1f} M edges/s", flush=True)

bench("hybrid ELL", lambda h: spmm_hybrid(hadj, h))
# grad path too (backward is the transpose gather/scatter XLA derives)
def loss(h):
    return spmm_hybrid(hadj, h).sum()
gf = jax.jit(jax.grad(loss))
jax.block_until_ready(gf(x))
t0 = time.perf_counter()
for _ in range(3):
    g = gf(x)
float(g.sum())
print(f"hybrid grad: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)
