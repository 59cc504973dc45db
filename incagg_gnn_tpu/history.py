"""Historical-embedding caches as functional JAX state.

TPU-native redesign of the reference's ``History`` module + ``AsyncIOPool``
transfer engine (history.py:9-65, pool.py:15-134, csrc/async.cpp,
csrc/cuda/async_cuda.cu): on GPU the caches live in pinned host RAM and every
pull/push crosses PCIe through a hand-rolled CUDA-stream copy engine.  On TPU
the caches live directly in device HBM as arrays threaded through the jitted
step functions:

- **pull** = ``jnp.take`` (an XLA gather, fused into the step),
- **push** = ``.at[idx].set`` scatter into a **donated** buffer (in-place HBM
  update, no copy),
- asynchrony comes for free from XLA's dataflow ordering — no slots, streams,
  or worker threads (SURVEY §5.2).

Layout (reference: base.py:67-81 and the "index change" convention,
base.py:544,552-557): ``emb[l]`` holds the *input* of layer ``l`` (so
``emb[0]`` is the layer-0 input in model space and ``emb[l>=1]`` the output of
layer ``l-1``), and ``emb_ag[l] = A_full @ emb[l]`` restricted to each node's
full neighborhood — the two operands of the incremental-aggregation rule
``h = A @ (x - M_in) + M_ag``.

Row ``N`` (the last row) is a zero "trash" row: padded batch positions gather
from and scatter to it, keeping every shape static without masking.

When the caches exceed HBM, the host-offload spill engine
(``incagg_gnn_tpu/history_spill.py`` + ``csrc/spill.cpp``) keeps shards in
host DRAM with the same slotted staging discipline as the reference's pool.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def tup_set(t: tuple, i: int, v) -> tuple:
    """Replace element ``i`` of a tuple (the per-layer analogue of
    ``stack.at[i].set(v)``)."""
    return t[:i] + (v,) + t[i + 1:]


class HistoryState(NamedTuple):
    """Per-layer ``M_in`` (``emb``) and ``M_ag`` (``emb_ag``) tables.

    Each field is a TUPLE of ``num_layers`` arrays ``[num_nodes + 1, dim]``
    (the ``+1`` row is the padding trash row and must stay zero).  Separate
    per-layer tables — not one ``[L, N+1, D]`` stack — are a measured TPU
    requirement: XLA lowers a row scatter into a fixed layer of a 3-D
    tiled stack as flatten-reshape copies of the ENTIRE stack (2x 1.28 GB
    per push at products scale, 25% of the refresh sweep), while the same
    scatter into a 2-D table is 3.8x faster with no copies
    (docs/RESULTS.md r3 "refresh sweep", scripts/probes/_refresh_micro.py).
    ``emb[l]`` indexing is unchanged at use sites; writes go through
    :func:`tup_set`.
    """

    emb: Tuple[jnp.ndarray, ...]
    emb_ag: Tuple[jnp.ndarray, ...]

    @property
    def num_layers(self) -> int:
        return len(self.emb)

    @property
    def num_nodes(self) -> int:
        return self.emb[0].shape[0] - 1

    @property
    def dim(self) -> int:
        return self.emb[0].shape[1]


#: cache dtypes by config name.  bf16 halves and fp8 quarters the HBM of the
#: two [L, N+1, D] stacks vs f32; quantization error enters the VR rule
#: exactly like staleness drift (corrected by A@(x - M_in)) and is re-zeroed
#: at every refresh, so accuracy degrades gracefully (tests pin it).
CACHE_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float8_e4m3": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
}


def resolve_dtype(name: str):
    """Map a config dtype string to the jnp dtype (hist_dtype / x_dtype)."""
    if name not in CACHE_DTYPES:
        raise ValueError(
            f"unknown cache dtype {name!r}; one of {sorted(CACHE_DTYPES)}"
        )
    return CACHE_DTYPES[name]


def init_history(
    num_layers: int, num_nodes: int, dim: int, dtype=jnp.float32
) -> HistoryState:
    """Zero-initialized caches (reference: history.py:25-26)."""
    shape = (num_nodes + 1, dim)
    return HistoryState(
        emb=tuple(jnp.zeros(shape, dtype) for _ in range(num_layers)),
        emb_ag=tuple(jnp.zeros(shape, dtype) for _ in range(num_layers)),
    )


def pull(table: jnp.ndarray, n_id: jnp.ndarray) -> jnp.ndarray:
    """Gather rows ``n_id`` from a ``[N+1, D]`` cache layer (reference:
    history.py:33-39 ``History.pull``)."""
    return jnp.take(table, n_id, axis=0).astype(jnp.float32)


def push(table: jnp.ndarray, idx: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Scatter ``values`` into rows ``idx`` (padded entries must point at the
    trash row ``N``).  Functional replacement for ``History.push``
    (history.py:41-65); gradients do not flow into the cache."""
    values = jax.lax.stop_gradient(values).astype(table.dtype)
    return table.at[idx].set(values)


def reset_trash_row(state: HistoryState) -> HistoryState:
    """Re-zero the trash row (padding scatters write garbage there)."""
    return HistoryState(
        emb=tuple(t.at[-1, :].set(0.0) for t in state.emb),
        emb_ag=tuple(t.at[-1, :].set(0.0) for t in state.emb_ag),
    )
