"""Probe: ELL aggregation gather rate at f32 vs bf16 feature rows.

Products-mid refresh-sweep shape: R=16.7K IB rows, K~51, D=128 — the
sweep's hot gather is x[ell_cols] with x at the table dtype.  If bf16
halves the gather cost, the refresh should keep gathered history rows in
bf16 through the aggregation (ROADMAP "bf16 sweep aggregation").
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
R, K, D, C = 16768, 51, 128, 40960
cols = rng.integers(0, C, size=(R, K)).astype(np.int32)
vals = np.ones((R, K), np.float32)
adj = HybridAdj(
    ell_cols=jnp.asarray(cols), ell_vals=jnp.asarray(vals),
    ovf_rows=jnp.zeros(0, jnp.int32), ovf_cols=jnp.zeros(0, jnp.int32),
    ovf_vals=jnp.zeros(0, jnp.float32),
    deg=jnp.full((R,), float(K), jnp.float32),
)

for dt in (jnp.float32, jnp.bfloat16):
    x = jnp.asarray(rng.standard_normal((C, D)), dtype=dt)
    fn = jax.jit(lambda a, x: spmm_hybrid(a, x))
    out = jax.block_until_ready(fn(adj, x))
    n_it = 50
    t0 = time.perf_counter()
    for _ in range(n_it):
        out = fn(adj, x)
    jax.block_until_ready(out)
    dt_s = (time.perf_counter() - t0) / n_it
    slots = R * K
    print(f"{np.dtype(dt).name:>9}: {dt_s*1e3:7.3f} ms  "
          f"{slots/dt_s/1e6:8.1f} M slots/s  out={out.dtype}", flush=True)

# bf16 vals too (pure-bf16 multiply-accumulate path)
adj16 = adj._replace(ell_vals=adj.ell_vals.astype(jnp.bfloat16))
x = jnp.asarray(rng.standard_normal((C, D)), dtype=jnp.bfloat16)
fn = jax.jit(lambda a, x: spmm_hybrid(a, x))
out = jax.block_until_ready(fn(adj16, x))
t0 = time.perf_counter()
for _ in range(50):
    out = fn(adj16, x)
jax.block_until_ready(out)
dt_s = (time.perf_counter() - t0) / 50
print(f"bf16+bf16vals: {dt_s*1e3:7.3f} ms  {R*K/dt_s/1e6:8.1f} M slots/s  "
      f"out={out.dtype}", flush=True)
