"""One-command Mosaic re-probe for the fused ELL VMEM-gather kernel
(VERDICT r2 item 8): run after every toolchain bump.

    python scripts/probes/mosaic_reprobe.py

Tries to COMPILE (not interpret) ops/pallas_spmm.pallas_spmm_ell_vmem on
the attached TPU, then — if it compiles — validates numerics against the
XLA reference and times it against the gather-engine hybrid path at a
batch-local shape (products-config cluster, C=8192 D=128 K=32).  Appends a
one-line dated verdict to docs/RESULTS.md is left to the operator; the
script prints the line to use.

Known state (jax 0.9 / Mosaic 2026-08): the dynamic VMEM row gather is
rejected at compile time ("Shape mismatch in input, indices and output");
see ops/pallas_spmm.py docstring and docs/RESULTS.md "Pallas gather
re-probe" for every alternative formulation already measured.
"""

import datetime
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from incagg_gnn_tpu.ops.pallas_spmm import pallas_spmm_ell_vmem

R, K, C, D = 8192, 32, 8192, 128
rng = np.random.default_rng(0)
cols = jnp.asarray(rng.integers(0, C, size=(R, K)), jnp.int32)
vals = jnp.asarray(rng.normal(size=(R, K)), jnp.float32)
x = jnp.asarray(rng.normal(size=(C, D)), jnp.float32)

today = datetime.date.today().isoformat()
dev = jax.devices()[0]
print(f"device: {dev}, jax {jax.__version__}")

try:
    out = pallas_spmm_ell_vmem(cols, vals, x, block_rows=256)
    out.block_until_ready()
except Exception:
    tb = traceback.format_exc()
    lines = [l for l in tb.strip().splitlines()
             if l.strip() and "JAX has removed its internal frames" not in l
             and "JAX_TRACEBACK_FILTERING" not in l and l.strip("- ")]
    tail = lines[-1]
    print("COMPILE: still blocked")
    print("last error line:", tail[:200])
    print(f"\nRESULTS.md line:\n- {today}: Mosaic fused ELL gather re-probe "
          f"(scripts/probes/mosaic_reprobe.py): still blocked — {tail[:120]}")
    sys.exit(0)

print("COMPILE: OK — validating + timing")
ref = (jnp.take(x, cols.reshape(-1), axis=0).reshape(R, K, D)
       * vals[..., None]).sum(axis=1)
err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
print(f"max rel err vs XLA: {err:.2e}")

def bench(fn, *a):
    fn(*a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        o = fn(*a)
    o.block_until_ready()
    return (time.perf_counter() - t0) / 20

t_pl = bench(lambda c_, v_, x_: pallas_spmm_ell_vmem(c_, v_, x_,
                                                     block_rows=256),
             cols, vals, x)
t_xla = bench(jax.jit(lambda c_, v_, x_: (
    jnp.take(x_, c_.reshape(-1), axis=0).reshape(R, K, D)
    * v_[..., None]).sum(axis=1)), cols, vals, x)
slots = R * K
print(f"pallas {t_pl*1e3:.2f} ms ({slots/t_pl/1e6:.1f}M slots/s)  "
      f"xla {t_xla*1e3:.2f} ms ({slots/t_xla/1e6:.1f}M slots/s)")
print(f"\nRESULTS.md line:\n- {today}: Mosaic fused ELL gather re-probe: "
      f"COMPILES; err {err:.1e}; pallas {slots/t_pl/1e6:.1f}M vs XLA "
      f"{slots/t_xla/1e6:.1f}M slots/s — "
      f"{'WIRE IT UP (ops/ell.py tier)' if t_pl < t_xla else 'still slower, keep XLA path'}")
