from incagg_gnn_tpu.graph.csr import CSRGraph, GraphData, gcn_norm, permute
from incagg_gnn_tpu.graph.partition import partition_graph, ind2ptr
from incagg_gnn_tpu.graph.relabel import relabel_one_hop, relabel_one_hop_within_batch

__all__ = [
    "CSRGraph",
    "GraphData",
    "gcn_norm",
    "permute",
    "partition_graph",
    "ind2ptr",
    "relabel_one_hop",
    "relabel_one_hop_within_batch",
]
