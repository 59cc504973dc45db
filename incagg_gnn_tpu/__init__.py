"""incagg_gnn_tpu — a TPU-native framework for scalable GNN training with
historical embeddings and incremental (variance-reduced) aggregation.

Provides the capabilities of the reference system (AMShek/IncAgg-GNN, a PyGAS
fork; see /root/reference) re-designed TPU-first on JAX/XLA/Pallas/pjit:

- graph partitioning into locality clusters with a contiguous node permutation
  (reference: torch_geometric_autoscale/metis.py),
- one-hop subgraph extraction with IB/OB relabeling
  (reference: csrc/cpu/relabel_cpu.cpp),
- per-layer historical-embedding caches ``M_in`` and aggregated caches
  ``M_ag = A @ M_in`` resident in device HBM as functional JAX state
  (reference: history.py, models/base.py:67-81),
- GAS-style training with out-of-batch pulls and Reverb/VR-style incremental
  aggregation ``h = A @ (x - M_in) + M_ag``
  (reference: models/base.py:126-378),
- layer-wise cache-refresh inference (reference: models/base.py:509-603),
- the model family GCN / GraphSAGE / APPNP / GCNII / PNA / PNA_JK / GAT,
- single-chip → multi-chip scaling via jax.sharding over a device mesh.

Unlike the reference (single-GPU torch + pinned-CPU caches + CUDA async copy
engine), everything on the compute path here is a pure function under jit with
static shapes; histories are donated HBM buffers, pulls are XLA gathers, and
pushes are XLA scatters — no transfer engine is needed until caches spill to
host DRAM (see history/spill).
"""

__version__ = "0.1.0"

from incagg_gnn_tpu.graph.csr import CSRGraph, GraphData, gcn_norm, permute
from incagg_gnn_tpu.graph.datasets import get_data
from incagg_gnn_tpu.graph.partition import partition_graph, ind2ptr
from incagg_gnn_tpu.graph.relabel import relabel_one_hop, relabel_one_hop_within_batch
from incagg_gnn_tpu.history import HistoryState
from incagg_gnn_tpu.history_spill import SpilledHistory
from incagg_gnn_tpu.loader import SubgraphBatch, SubgraphLoader, EvalSubgraphLoader
from incagg_gnn_tpu.models.base import ScalableGNN
from incagg_gnn_tpu.models.nn import edge_dropout
from incagg_gnn_tpu.utils.metrics import compute_micro_f1, index2mask, gen_masks

# public API parity with the reference's __init__ exports
# (torch_geometric_autoscale/__init__.py:12-33): get_data, History
# (HistoryState), AsyncIOPool (SpilledHistory), metis (partition_graph),
# permute, compute_micro_f1, gen_masks, dropout (edge_dropout),
# SubgraphLoader, EvalSubgraphLoader, ScalableGNN.
__all__ = [
    "get_data",
    "ScalableGNN",
    "edge_dropout",
    "CSRGraph",
    "GraphData",
    "gcn_norm",
    "permute",
    "partition_graph",
    "ind2ptr",
    "relabel_one_hop",
    "relabel_one_hop_within_batch",
    "HistoryState",
    "SpilledHistory",
    "SubgraphBatch",
    "SubgraphLoader",
    "EvalSubgraphLoader",
    "compute_micro_f1",
    "index2mask",
    "gen_masks",
]
