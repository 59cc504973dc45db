"""Device-sharded node layout: clusters → device slabs.

Promotes the reference's METIS partitioning from batch locality to true
spatial parallelism (SURVEY §2.1 "graph/spatial partition parallel" row):
clusters are bin-packed onto devices; each device owns a fixed-size *slab* of
node rows holding its clusters contiguously (preserving the offset/count
contiguity invariant per device, loader.py:178-179), padded to a common slab
size with a per-slab trash row at the end.

Global sharded arrays have ``n_dev * slab`` rows; sharding them with
``P('data')`` over the node axis gives each device exactly its slab, so a
device's in-batch rows — and, in Reverb/VR mode, *all* of its pulls — are
local to its shard.
"""

from __future__ import annotations

import dataclasses
import numpy as np



@dataclasses.dataclass
class ShardLayout:
    n_dev: int
    slab: int  # rows per device, incl. the trailing trash row
    dev_of_cluster: np.ndarray  # [num_clusters] device owning each cluster
    cluster_row: np.ndarray  # [num_clusters] new-layout start row of cluster
    node_to_row: np.ndarray  # [N] old (permuted) node id -> new global row
    row_to_node: np.ndarray  # [n_dev*slab] new row -> old node id, -1 for pad/trash

    @property
    def num_rows(self) -> int:
        return self.n_dev * self.slab

    def local_trash(self) -> int:
        """Local (in-slab) index of the trash row."""
        return self.slab - 1


def build_shard_layout(ptr: np.ndarray, n_dev: int, align: int = 8) -> ShardLayout:
    """Greedy bin-packing of clusters (largest-first onto least-loaded device)
    and construction of the slab row layout."""
    ptr = np.asarray(ptr, dtype=np.int64)
    sizes = np.diff(ptr)
    k = len(sizes)
    order = np.argsort(-sizes, kind="stable")
    load = np.zeros(n_dev, dtype=np.int64)
    dev_of_cluster = np.zeros(k, dtype=np.int64)
    for c in order:
        d = int(load.argmin())
        dev_of_cluster[c] = d
        load[d] += sizes[c]
    slab = int(load.max()) + 1  # +1 trash row
    slab = ((slab + align - 1) // align) * align

    n = int(ptr[-1])
    node_to_row = np.empty(n, dtype=np.int64)
    row_to_node = np.full(n_dev * slab, -1, dtype=np.int64)
    cluster_row = np.zeros(k, dtype=np.int64)
    cursor = np.arange(n_dev, dtype=np.int64) * slab
    for c in range(k):  # keep cluster order stable within each device
        d = dev_of_cluster[c]
        start, size = int(ptr[c]), int(sizes[c])
        cluster_row[c] = cursor[d]
        rows = np.arange(cursor[d], cursor[d] + size)
        node_to_row[start : start + size] = rows
        row_to_node[rows] = np.arange(start, start + size)
        cursor[d] += size
    return ShardLayout(
        n_dev=n_dev,
        slab=slab,
        dev_of_cluster=dev_of_cluster,
        cluster_row=cluster_row,
        node_to_row=node_to_row,
        row_to_node=row_to_node,
    )


def scatter_table(layout: ShardLayout, table: np.ndarray, fill=0) -> np.ndarray:
    """Re-lay a [N, ...] node table into the [n_dev*slab, ...] shard layout
    (pad/trash rows get ``fill``)."""
    out_shape = (layout.num_rows,) + table.shape[1:]
    out = np.full(out_shape, fill, dtype=table.dtype)
    valid = layout.row_to_node >= 0
    out[valid] = table[layout.row_to_node[valid]]
    return out
