import numpy as np, os
os.environ["INCAGG_PLATFORM"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
from incagg_gnn_tpu.graph.csr import gcn_norm, permute
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.graph.partition import partition_graph
from incagg_gnn_tpu.loader import SubgraphLoader, EvalSubgraphLoader
import incagg_gnn_tpu.ops.block as B

data, _, _ = make_sbm(num_nodes=500_000, num_classes=47, num_features=8, avg_degree=50.0, seed=42)
perm, ptr = partition_graph(data.adj_t, 30, seed=42)
data = permute(data, perm)
data.adj_t = gcn_norm(data.adj_t.set_diag())

for mode, name in (("ib","train"), ("gas","eval")):
    ld = SubgraphLoader(data, ptr, batch_size=1, mode=mode, shuffle=False)
    # reproduce the collate CSR of the first batch without building the device adj
    g = ld._groups(False)[0]
    idx, offs, cnts = ld._group_nodes(g)
    from incagg_gnn_tpu.graph.relabel import relabel_one_hop, relabel_one_hop_within_batch
    if mode == "ib":
        rowptr, col, value, n_id = relabel_one_hop_within_batch(data.adj_t, idx, True)
    else:
        rowptr, col, value, n_id = relabel_one_hop(data.adj_t, idx, True)
    ld._collate(g, 0, 0)  # set buckets
    b = ld.buckets
    r = rowptr.shape[0]-1
    deg = np.diff(rowptr)
    print(f"{name}: rows={r} cols_pad={b.cols} edges={col.size} deg_mean={deg.mean():.1f}")
    for thresh_probe in (None,):
        ai = 2
        th = B.plan_block_tier(rowptr, col, b.cols, x_itemsize=ai, a_itemsize=ai, d_hint=128)
        print("  plan ->", th)
    # histogram detail
    ncb = b.cols // 128
    row = np.repeat(np.arange(r, dtype=np.int64), deg)
    key = (row // 128) * ncb + col.astype(np.int64) // 128
    counts = np.unique(key, return_counts=True)[1]
    th0 = B.marginal_thresh(2, 2, 128)
    base, tiered, e_dense = B._cost_ns(counts, int(col.size), th0, deg, 2, 2, 128)
    print(f"  marginal_thresh={th0} blocks={counts.size} counts>=th: {(counts>=th0).sum()} "
          f"e_dense={e_dense} ({e_dense/max(col.size,1):.2%}) base={base/1e3:.0f}us tiered={tiered/1e3:.0f}us ratio={tiered/base:.3f}")
    print("  count quantiles:", np.percentile(counts, [50,90,99,99.9]).round(1), "max", counts.max())
