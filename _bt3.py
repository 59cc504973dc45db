import time, numpy as np, jax, jax.numpy as jnp
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.graph.csr import gcn_norm

n, deg, d = 100_000, 14, 256
data, _, _ = make_sbm(num_nodes=n, num_classes=16, num_features=8, avg_degree=deg, seed=0)
adj = gcn_norm(data.adj_t.set_diag())
e = adj.nnz
rows = np.repeat(np.arange(n, dtype=np.int32), np.diff(adj.rowptr))
e_pad = ((e + 127)//128)*128
n_pad = ((n + 128)//128)*128
rows_p = np.full(e_pad, n_pad-1, np.int32); rows_p[:e] = rows
cols_p = np.full(e_pad, n_pad-1, np.int32); cols_p[:e] = adj.col
vals_p = np.zeros(e_pad, np.float32); vals_p[:e] = adj.value
R, C, V = jnp.asarray(rows_p), jnp.asarray(cols_p), jnp.asarray(vals_p)
ITERS = 10

def chain(spmm_fn, x0):
    @jax.jit
    def run(x):
        def body(h, _):
            return spmm_fn(h), None
        h, _ = jax.lax.scan(body, x, None, length=ITERS)
        return h.sum()
    return run

def bench(name, fn, x0, dtype):
    run = chain(fn, x0)
    s = float(run(x0))  # compile + run
    t0 = time.perf_counter(); s = float(run(x0)); dt1 = time.perf_counter()-t0
    t0 = time.perf_counter(); s = float(run(x0)); dt2 = time.perf_counter()-t0
    dt = min(dt1, dt2)/ITERS
    print(f"{name} [{dtype}]: {dt*1e3:.2f} ms/spmm -> {e/dt/1e6:.1f} M edges/s", flush=True)

x32 = jnp.asarray(np.random.default_rng(1).standard_normal((n_pad, d))*0.1, jnp.float32)
bench("sorted seg_sum", lambda h: jax.ops.segment_sum(jnp.take(h, C, axis=0)*V[:,None], R, num_segments=n_pad, indices_are_sorted=True), x32, "f32")
x16 = x32.astype(jnp.bfloat16)
bench("sorted seg_sum", lambda h: jax.ops.segment_sum(jnp.take(h, C, axis=0)*V[:,None].astype(jnp.bfloat16), R, num_segments=n_pad, indices_are_sorted=True).astype(jnp.bfloat16), x16, "bf16")
# d=128 and d=512 scaling
for dd in (128, 512):
    xx = jnp.asarray(np.random.default_rng(1).standard_normal((n_pad, dd))*0.1, jnp.float32)
    bench(f"sorted seg_sum d={dd}", lambda h: jax.ops.segment_sum(jnp.take(h, C, axis=0)*V[:,None], R, num_segments=n_pad, indices_are_sorted=True), xx, "f32")
