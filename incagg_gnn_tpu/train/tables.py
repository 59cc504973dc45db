"""Device-resident full-graph tables.

On GPU the reference moves per-batch features/labels host→device every step
(main.py:61-64).  On TPU the full feature/label/mask tables live in HBM once
(with a zero trash row at index N for padding gathers) and batches carry only
indices — removing the per-step host transfer entirely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from incagg_gnn_tpu.graph.csr import GraphData


class DeviceTables(NamedTuple):
    x: jnp.ndarray  # [N+1, F] float32 (row N = zeros)
    y: jnp.ndarray  # [N+1] int32 or [N+1, C] float32
    train_mask: jnp.ndarray  # [N+1] bool (row N = False)
    val_mask: jnp.ndarray
    test_mask: jnp.ndarray


def make_tables(data: GraphData, dtype=jnp.float32) -> DeviceTables:
    n = data.num_nodes
    x = np.concatenate([data.x, np.zeros((1, data.x.shape[1]), data.x.dtype)])
    if data.y.ndim == 1:
        y = np.concatenate([data.y.astype(np.int32), np.zeros(1, np.int32)])
    else:
        y = np.concatenate([data.y.astype(np.float32), np.zeros((1, data.y.shape[1]), np.float32)])

    def m(mask):
        return jnp.asarray(np.concatenate([mask.astype(bool), [False]]))

    return DeviceTables(
        x=jnp.asarray(x, dtype=dtype),
        y=jnp.asarray(y),
        train_mask=m(data.train_mask),
        val_mask=m(data.val_mask),
        test_mask=m(data.test_mask),
    )
