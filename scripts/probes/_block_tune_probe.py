"""Block-tier tuning probe at the bench reddit shape (VERDICT r2 item 7:
push the bf16 row past 0.6x of its own roofline / >=350M e/s).

Variants over the r3 baseline (266M: tiles 22.8 ms @190 ns/tile, rem
66.9 ms with K=16 + 855K-edge overflow):
  A. LANES=8 (amortize per-step grid overhead further)
  B. lower tile thresh (absorb more mid-degree blocks; needs tile_cap)
  C. remainder K=24 (fewer COO overflow edges)

    python scripts/probes/_block_tune_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
os.environ.setdefault("INCAGG_BLOCK_TILE_CAP", "150000")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/incagg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from incagg_gnn_tpu.graph.csr import gcn_norm, permute
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.graph.partition import partition_graph
import incagg_gnn_tpu.ops.block as blk
from incagg_gnn_tpu.ops.block import build_block_hybrid, plan_block_tier
from incagg_gnn_tpu.ops.ell import spmm_hybrid

N, DEG, PARTS, D = 233_000, 100.0, 200, 256
import ml_dtypes

data, _, _ = make_sbm(num_nodes=N, num_classes=40, num_features=8,
                      avg_degree=DEG, seed=0)
perm, ptr = partition_graph(data.adj_t, PARTS)
data = permute(data, perm)
adj = gcn_norm(data.adj_t.set_diag())
e = int(adj.nnz)
n_pad = ((N + 128) // 128) * 128
rowptr, col, value = (np.asarray(adj.rowptr), np.asarray(adj.col),
                      np.asarray(adj.value))
x = jnp.asarray(np.random.default_rng(1).standard_normal((n_pad, D)) * 0.1,
                jnp.bfloat16)
auto_th = plan_block_tier(rowptr, col, n_pad, x_itemsize=2, a_itemsize=2,
                          d_hint=D)
print(f"edges={e} auto_thresh={auto_th}", flush=True)


def timeit(thunk, iters=10):
    float(thunk().sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = thunk()
        float(o.sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


j_full = jax.jit(blk.spmm_block)
j_rem = jax.jit(spmm_hybrid)


def report(tag, ops):
    t_full = timeit(lambda: j_full(ops, x))
    t_rem = timeit(lambda: j_rem(ops.rem, x))
    tiles = ops.dense.a.shape[0]
    k = ops.rem.ell_cols.shape[1]
    ovf = int(ops.rem.ovf_cols.shape[0])
    print(f"{tag}: tiles={tiles} K={k} ovf={ovf} "
          f"full {t_full*1e3:.1f} ms ({e/t_full/1e6:.0f}M e/s) "
          f"rem {t_rem*1e3:.1f} ms "
          f"tile_ns={(t_full-t_rem)/max(tiles,1)*1e9:.0f}", flush=True)
    return t_full


variants = []
t0 = time.time()
base = build_block_hybrid(rowptr, col, value, n_pad, n_pad, thresh=auto_th,
                          a_dtype=ml_dtypes.bfloat16)
print(f"[build {time.time()-t0:.0f}s]", flush=True)
report("base(auto)", base)

# C: remainder K=24 on the same tiles
t0 = time.time()
c = build_block_hybrid(rowptr, col, value, n_pad, n_pad, thresh=auto_th,
                       a_dtype=ml_dtypes.bfloat16, k=24)
print(f"[build {time.time()-t0:.0f}s]", flush=True)
report("K=24", c)

# B: lower thresh by ~1/3 (more tiles, thinner remainder)
t0 = time.time()
lo = max(8, int(auto_th * 2 // 3))
b = build_block_hybrid(rowptr, col, value, n_pad, n_pad, thresh=lo,
                       a_dtype=ml_dtypes.bfloat16)
print(f"[build {time.time()-t0:.0f}s]", flush=True)
report(f"thresh={lo}", b)

# (LANES=8 needs a kernel-signature change — the 4 x-ref aliases are
# hardcoded; tiles are only ~23 of 88 ms, so the remainder variants above
# carry the probe.)
