import time, numpy as np, jax, jax.numpy as jnp
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.graph.csr import gcn_norm

n, deg, d = 100_000, 14, 256
data, _, _ = make_sbm(num_nodes=n, num_classes=16, num_features=8, avg_degree=deg, seed=0)
adj = gcn_norm(data.adj_t.set_diag())
e = adj.nnz
rows = np.repeat(np.arange(n, dtype=np.int32), np.diff(adj.rowptr))
cols = adj.col.astype(np.int32)
vals = adj.value
e_pad = ((e + 127)//128)*128
n_pad = ((n + 128)//128)*128
rows_p = np.full(e_pad, n_pad-1, np.int32); rows_p[:e] = rows
cols_p = np.full(e_pad, n_pad-1, np.int32); cols_p[:e] = cols
vals_p = np.zeros(e_pad, np.float32); vals_p[:e] = vals
R, C, V = jnp.asarray(rows_p), jnp.asarray(cols_p), jnp.asarray(vals_p)
x = jnp.asarray(np.random.default_rng(1).standard_normal((n_pad, d)), jnp.float32)

def bench(name, f, *args, iters=5):
    o = f(*args); jax.block_until_ready(o)
    # chain to defeat laziness: can't chain shape-changing; use fresh calls + readback
    t0 = time.perf_counter()
    for i in range(iters):
        o = f(*args)
        _ = float(jnp.asarray(o).ravel()[i])  # force
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.2f} ms -> {e/dt/1e6:.1f} M edges/s", flush=True)
    return dt

f1 = jax.jit(lambda R,C,V,x: jax.ops.segment_sum(jnp.take(x, C, axis=0)*V[:,None], R, num_segments=n_pad))
bench("baseline seg_sum", f1, R,C,V,x)

f2 = jax.jit(lambda R,C,V,x: jax.ops.segment_sum(jnp.take(x, C, axis=0)*V[:,None], R, num_segments=n_pad, indices_are_sorted=True))
bench("sorted seg_sum", f2, R,C,V,x)

f3 = jax.jit(lambda C,x: jnp.take(x, C, axis=0))
bench("gather only", f3, C, x)

f4 = jax.jit(lambda R,g: jax.ops.segment_sum(g, R, num_segments=n_pad, indices_are_sorted=True))
g = f3(C,x)
bench("scatter only (sorted)", f4, R, g)
