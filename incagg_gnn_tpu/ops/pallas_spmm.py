"""Pallas TPU kernels for ELL-format neighborhood aggregation.

Two kernels:

- :func:`pallas_spmm_ell_vmem` — the full aggregation with ``x`` resident in
  VMEM, for *batch-local* graphs (Reverb training batches: C·D·4 ≲ 10 MB,
  e.g. a products-config cluster of ≤16K nodes at d=128).  The gather runs as
  VMEM dynamic loads inside the kernel, fused with the multiply/accumulate —
  no HBM intermediate at all.  NOTE: Mosaic rejects the dynamic VMEM row
  gather (``jnp.take`` inside the kernel) at compile time ("Shape mismatch in
  input, indices and output") — re-confirmed on jax 0.9 along with every
  alternative formulation (advanced indexing: same rejection; per-row scalar
  dynamic-slice loop: compiler crash; one-hot MXU matmul gather: compiles but
  only reaches parity with the XLA gather engine — full analysis in
  docs/RESULTS.md "Pallas gather re-probe").  The kernel is validated in
  interpret mode and kept as the blueprint for when the lowering lands — the
  production paths use the XLA hybrid implementation (ops/ell.py).

- :func:`pallas_ell_reduce` — the multiply+K-reduction stage only (gather
  stays in XLA), double-buffered over row blocks.  Demonstrates the blocked
  pipeline; XLA fuses this case equally well, so it exists mainly as the
  scaffold for fused variants.

Measured context (v5e, 100K nodes / 1.5M edges / d=256): XLA's gather engine
moves ~155M rows/s, which a per-edge DMA loop cannot approach (DMA issue
latency ~0.2-1 us/row); kernels here therefore never issue per-edge DMAs —
they either keep ``x`` in VMEM or let XLA gather.  The full-graph path uses
the hybrid ELL+COO XLA implementation (ops/ell.py, 109M edges/s vs 60M for
COO segment-sum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_kernel(cols_ref, vals_ref, x_ref, out_ref):
    """One row-block: out[r] = sum_k vals[r,k] * x[cols[r,k]].

    ``x_ref`` is the full [C, D] table in VMEM; the gather is a dynamic VMEM
    load per (row, slot), vectorized over D by the VPU.
    """
    br, k = cols_ref.shape
    d = x_ref.shape[1]
    x = x_ref[:]

    def body(j, acc):
        idx = cols_ref[:, j]  # [BR] int32
        g = jnp.take(x, idx, axis=0)  # [BR, D] VMEM gather
        return acc + g * vals_ref[:, j][:, None]

    out_ref[:] = jax.lax.fori_loop(
        0, k, body, jnp.zeros((br, d), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def pallas_spmm_ell_vmem(
    ell_cols: jnp.ndarray,  # [R, K] int32
    ell_vals: jnp.ndarray,  # [R, K] float32
    x: jnp.ndarray,  # [C, D] float32 — must fit VMEM (C*D*4 <~ 10MB)
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    r, k = ell_cols.shape
    c, d = x.shape
    assert r % block_rows == 0, (r, block_rows)
    grid = (r // block_rows,)
    return pl.pallas_call(
        _vmem_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, d), jnp.float32),
        interpret=interpret,
    )(ell_cols, ell_vals, x)


def _reduce_kernel(g_ref, vals_ref, out_ref):
    """out[r] = sum_k vals[r,k] * g[r,k,:] for one row block."""
    out_ref[:] = (g_ref[:] * vals_ref[:][..., None]).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def pallas_ell_reduce(
    g: jnp.ndarray,  # [R, K, D] gathered neighbor features
    ell_vals: jnp.ndarray,  # [R, K]
    block_rows: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    r, k, d = g.shape
    assert r % block_rows == 0
    return pl.pallas_call(
        _reduce_kernel,
        grid=(r // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, k, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, d), jnp.float32),
        interpret=interpret,
    )(g, ell_vals)
