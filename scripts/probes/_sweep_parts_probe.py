"""Probe: where do the 33 ms/batch-layer of the products-mid refresh go?

Times each component of the refresh step at the real operating shape
(N=500K, 30 parts, R_pad=16.7K IB rows, C_pad~41K, K=51, D=128, bf16
tables) in isolation: table gathers, table scatters, ELL aggregation,
dense layer math, and a composed scan step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from incagg_gnn_tpu.ops.ell import HybridAdj, spmm_hybrid

rng = np.random.default_rng(0)
L, N, D = 5, 500_008, 128
R, K, C = 16768, 51, 40960
NB = 30

emb = jnp.zeros((L, N, D), jnp.bfloat16)
n_id = jnp.asarray(np.sort(rng.choice(N - 8, C, replace=False)).astype(np.int32))
push_idx = n_id[:R]
rows = jnp.asarray(rng.standard_normal((R, D)), jnp.bfloat16)
rows32 = rows.astype(jnp.float32)

def bench(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<42} {dt*1e3:8.3f} ms", flush=True)
    return dt

# 1. row-scatter into one layer of the stacked table (donated, as in sweep)
f_scat = jax.jit(lambda e, i, r: e.at[2, i].set(r), donate_argnums=(0,))
e = emb
out = jax.block_until_ready(f_scat(e, push_idx, rows))
t0 = time.perf_counter()
for _ in range(30):
    out = f_scat(out, push_idx, rows)
jax.block_until_ready(out)
print(f"{'scatter [R=16.7K,128]bf16 into [5,N,128]':<42} "
      f"{(time.perf_counter()-t0)/30*1e3:8.3f} ms", flush=True)

# 2. gather C rows from one layer
f_gath = jax.jit(lambda e, i: jnp.take(e[2], i, axis=0))
bench("gather  [C=41K,128]bf16 from [5,N,128]", f_gath, out, n_id)

# 3. ELL aggregation (from VMEM-resident x)
cols = jnp.asarray(rng.integers(0, C, size=(R, K)).astype(np.int32))
vals = jnp.ones((R, K), jnp.float32)
adj = HybridAdj(ell_cols=cols, ell_vals=vals,
                ovf_rows=jnp.zeros(0, jnp.int32),
                ovf_cols=jnp.zeros(0, jnp.int32),
                ovf_vals=jnp.zeros(0, jnp.float32),
                deg=jnp.full((R,), float(K), jnp.float32))
x_c = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
bench("spmm_hybrid f32 [R,K=51]x[C,128]", jax.jit(spmm_hybrid), adj, x_c)

# 4. dense layer math (GCNII-ish: two matmuls + add)
w = jnp.asarray(rng.standard_normal((D, D)) * 0.1, jnp.float32)
f_dense = jax.jit(lambda x, w: (x @ w + 0.5 * x) @ w)
bench("dense 2x[R,128]@[128,128]", f_dense, x_c[:R], w)

# 5. composed: scan over 30 batches of (gather, spmm, dense, 2 scatters)
idx_all = np.stack([
    np.sort(rng.choice(N - 8, C, replace=False)).astype(np.int32)
    for _ in range(NB)])
idx_all = jnp.asarray(idx_all)
cols_all = jnp.asarray(rng.integers(0, C, size=(NB, R, K)).astype(np.int32))

def step(carry, b):
    e, ea = carry
    ii, cc = b
    x_in = jnp.take(e[2], ii, axis=0).astype(jnp.float32)
    a = HybridAdj(ell_cols=cc, ell_vals=vals,
                  ovf_rows=jnp.zeros(0, jnp.int32),
                  ovf_cols=jnp.zeros(0, jnp.int32),
                  ovf_vals=jnp.zeros(0, jnp.float32),
                  deg=jnp.full((R,), float(K), jnp.float32))
    ag = spmm_hybrid(a, x_in)
    h = (ag @ w + 0.5 * ag) @ w
    ea = ea.at[2, ii[:R]].set(ag.astype(jnp.bfloat16))
    e = e.at[3, ii[:R]].set(h.astype(jnp.bfloat16))
    return (e, ea), None

f_scan = jax.jit(
    lambda e, ea, ii, cc: jax.lax.scan(step, (e, ea), (ii, cc))[0],
    donate_argnums=(0, 1))
ea0 = jnp.zeros((L, N, D), jnp.bfloat16)
e0 = jnp.zeros((L, N, D), jnp.bfloat16)
o = jax.block_until_ready(f_scan(e0, ea0, idx_all, cols_all))
t0 = time.perf_counter()
for _ in range(5):
    o = f_scan(o[0], o[1], idx_all, cols_all)
jax.block_until_ready(o)
dt = (time.perf_counter() - t0) / 5
print(f"{'scan 30x(gather+spmm+dense+2scatter)':<42} {dt*1e3:8.3f} ms "
      f"({dt/NB*1e3:.3f} ms/batch)", flush=True)
