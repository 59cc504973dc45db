# Host pipeline at ogbn-products scale (CPU only): partition, permute,
# normalize, loaders. Measures wall times + memory viability.
import time, numpy as np
import jax; jax.config.update('jax_platforms', 'cpu')
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.graph.csr import gcn_norm, permute
from incagg_gnn_tpu.graph.partition import partition_graph
from incagg_gnn_tpu.loader import SubgraphLoader, EvalSubgraphLoader

t0=time.perf_counter()
data, in_c, out_c = make_sbm(num_nodes=2_449_029, num_classes=47, num_features=100, avg_degree=50.0, seed=0)
print(f"gen {time.perf_counter()-t0:.0f}s E={data.adj_t.nnz}", flush=True)
t0=time.perf_counter()
perm, ptr = partition_graph(data.adj_t, 150, seed=0)
print(f"partition {time.perf_counter()-t0:.0f}s", flush=True)
t0=time.perf_counter()
data = permute(data, perm)
print(f"permute {time.perf_counter()-t0:.0f}s", flush=True)
t0=time.perf_counter()
data.adj_t = gcn_norm(data.adj_t.set_diag())
print(f"norm {time.perf_counter()-t0:.0f}s", flush=True)
t0=time.perf_counter()
tl = SubgraphLoader(data, ptr, batch_size=1, mode="ib", shuffle=True, adj_format="hybrid")
b0 = next(iter(tl))
print(f"train loader + first batch {time.perf_counter()-t0:.0f}s  buckets={tl.buckets}", flush=True)
t0=time.perf_counter()
n_batches = 0
for hb in tl:
    n_batches += 1
    if n_batches >= 10: break
print(f"10 train batches {time.perf_counter()-t0:.1f}s", flush=True)
