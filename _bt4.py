# Compare: (a) XLA sorted segment_sum, (b) one-hot row-tile matmul segsum,
# (c) pure gather, (d) gather+multiply (no reduce) -- all scan-chained with
# scalar readback so the tunnel can't fake results.
import time, numpy as np, jax, jax.numpy as jnp
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.graph.csr import gcn_norm

n, deg, d = 100_000, 14, 256
data, _, _ = make_sbm(num_nodes=n, num_classes=16, num_features=8, avg_degree=deg, seed=0)
adj = gcn_norm(data.adj_t.set_diag())
e = adj.nnz
rows = np.repeat(np.arange(n, dtype=np.int32), np.diff(adj.rowptr))
e_pad = ((e + 511)//512)*512
n_pad = ((n + 128)//128)*128
rows_p = np.full(e_pad, n_pad-1, np.int32); rows_p[:e] = rows
cols_p = np.full(e_pad, n_pad-1, np.int32); cols_p[:e] = adj.col
vals_p = np.zeros(e_pad, np.float32); vals_p[:e] = adj.value
R, C, V = jnp.asarray(rows_p), jnp.asarray(cols_p), jnp.asarray(vals_p)
x0 = jnp.asarray(np.random.default_rng(1).standard_normal((n_pad, d))*0.1, jnp.float32)
ITERS = 5

def bench(name, step, same_shape=True):
    if same_shape:
        @jax.jit
        def run(x):
            def body(h, _):
                return step(h), None
            h, _ = jax.lax.scan(body, x, None, length=ITERS)
            return h.sum()
    else:
        @jax.jit
        def run(x):
            def body(h, _):
                g = step(h)
                # fold back to x shape to keep the chain honest
                return h + g[: x.shape[0]].sum() * 1e-9, None
            h, _ = jax.lax.scan(body, x, None, length=ITERS)
            return h.sum()
    float(run(x0))
    t0 = time.perf_counter(); float(run(x0)); dt1 = time.perf_counter()-t0
    t0 = time.perf_counter(); float(run(x0)); dt2 = time.perf_counter()-t0
    dt = min(dt1, dt2)/ITERS
    print(f"{name}: {dt*1e3:.2f} ms -> {e/dt/1e6:.1f} M edges/s", flush=True)

bench("sorted seg_sum", lambda h: jax.ops.segment_sum(jnp.take(h, C, axis=0)*V[:,None], R, num_segments=n_pad, indices_are_sorted=True))
bench("gather+mul only", lambda h: jnp.take(h, C, axis=0)*V[:,None], same_shape=False)

# one-hot tile matmul: tiles of T edges; rows within tile mapped to a W-row
# window starting at tile_base (host precomputed); S one-hot [W, T] @ G [T, d]
T = 512
nt = e_pad // T
tile_base = rows_p.reshape(nt, T).min(axis=1).astype(np.int32)
rel = rows_p.reshape(nt, T) - tile_base[:, None]
W = int(rel.max()) + 1
W = ((W + 127)//128)*128
print(f"tiles={nt}, window W={W}", flush=True)
REL = jnp.asarray(rel)  # [nt, T]
BASE = jnp.asarray(tile_base)

def onehot_spmm(h):
    g = jnp.take(h, C, axis=0) * V[:, None]      # [E, d]
    g = g.reshape(nt, T, d)
    onehot = (REL[:, None, :] == jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)).astype(jnp.float32)  # [nt, W, T]
    part = jnp.einsum("twe,ted->twd", onehot, g, preferred_element_type=jnp.float32)  # [nt, W, d]
    # scatter tile windows into output: rows BASE[t] + w  (overlapping windows -> scatter-add over ~nt*W rows)
    out_rows = (BASE[:, None] + jnp.arange(W)[None, :]).reshape(-1)
    out = jax.ops.segment_sum(part.reshape(-1, d), jnp.clip(out_rows, 0, n_pad-1), num_segments=n_pad, indices_are_sorted=True)
    return out

if W <= 2048:
    bench("one-hot tile matmul", onehot_spmm)
