"""A/B probe: block-tier remainder values f32 (today) vs cast-to-bf16 at
the bench reddit shape — the remainder dominates the reddit block row
(~72 of 87 ms), and mixed bf16-x / f32-vals multiplies were measured at
0.6x the uniform path on plain hybrid (docs/RESULTS.md).  Also reports
the tile/remainder time split and the thresh/K actually picked.

    python scripts/probes/_rem_dtype_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/incagg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import bench as B

jnp_dt = jnp.bfloat16
ops, fn, fmt, e, x = B._build("reddit", 233_000, 100.0, "block", "bf16",
                              200, 40, "fwd")
print(f"fmt={fmt} edges={e}", flush=True)
assert fmt == "block"
dense, rem = ops.dense, ops.rem
print(f"tiles={dense.a.shape[0]} a_dtype={dense.a.dtype} "
      f"rem K={rem.ell_cols.shape[1]} ovf={rem.ovf_cols.shape[0]} "
      f"rem_vals={rem.ell_vals.dtype}", flush=True)


def timeit(thunk, iters=10):
    # scalar readback, not block_until_ready: through the axon tunnel the
    # latter returns before the computation completes (bench.py does the
    # same); chain iterations through a data dependency
    float(thunk().sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            o = thunk()
            acc = o if acc is None else acc
        float(o.sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


from incagg_gnn_tpu.ops.block import _dense_call, spmm_block
from incagg_gnn_tpu.ops.ell import spmm_hybrid

# pass arrays as ARGUMENTS (closed-over device arrays become HLO
# constants -> GBs shipped to the remote compiler, bench.py lesson)
j_full = jax.jit(spmm_block)
j_tiles = jax.jit(lambda d, xx: _dense_call(d, xx, rem.num_rows))
j_rem = jax.jit(spmm_hybrid)
t_full = timeit(lambda: j_full(ops, x))
t_tiles = timeit(lambda: j_tiles(dense, x))
t_rem = timeit(lambda: j_rem(rem, x))
print(f"full {t_full*1e3:.1f} ms ({e/t_full/1e6:.0f}M e/s)  "
      f"tiles {t_tiles*1e3:.1f} ms  rem {t_rem*1e3:.1f} ms", flush=True)

rem_bf = rem._replace(ell_vals=rem.ell_vals.astype(jnp_dt),
                      ovf_vals=rem.ovf_vals.astype(jnp_dt))
t_rem_bf = timeit(lambda: j_rem(rem_bf, x))
ops_bf = ops._replace(rem=rem_bf)
t_full_bf = timeit(lambda: j_full(ops_bf, x))
print(f"rem bf16-vals {t_rem_bf*1e3:.1f} ms  "
      f"full bf16-rem {t_full_bf*1e3:.1f} ms "
      f"({e/t_full_bf/1e6:.0f}M e/s)", flush=True)
err = float(jnp.abs(
    j_full(ops_bf, x).astype(jnp.float32)
    - j_full(ops, x).astype(jnp.float32)).max())
print(f"max abs diff bf16-rem vs f32-rem: {err:.3e}", flush=True)
