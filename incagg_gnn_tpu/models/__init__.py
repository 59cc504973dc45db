"""Model registry (reference: models/__init__.py:1-19)."""

from incagg_gnn_tpu.models.base import BaseConfig, ScalableGNN
from incagg_gnn_tpu.models.gcn import GCN, GCNConfig
from incagg_gnn_tpu.models.gcn2 import GCN2, GCN2Config
from incagg_gnn_tpu.models.appnp import APPNP, APPNPConfig
from incagg_gnn_tpu.models.graphsage import GraphSAGE, SAGEConfig
from incagg_gnn_tpu.models.pna import PNA, PNAConfig, compute_avg_deg
from incagg_gnn_tpu.models.pna_jk import PNA_JK, PNAJKConfig
from incagg_gnn_tpu.models.gat import GAT, GATConfig

MODEL_REGISTRY = {
    "GCN": (GCN, GCNConfig),
    "GCN2": (GCN2, GCN2Config),
    "APPNP": (APPNP, APPNPConfig),
    "GraphSAGE": (GraphSAGE, SAGEConfig),
    "PNA": (PNA, PNAConfig),
    "PNA_JK": (PNA_JK, PNAJKConfig),
    "GAT": (GAT, GATConfig),
}

__all__ = [
    "BaseConfig", "ScalableGNN",
    "GCN", "GCNConfig",
    "GCN2", "GCN2Config",
    "APPNP", "APPNPConfig",
    "GraphSAGE", "SAGEConfig",
    "PNA", "PNAConfig", "compute_avg_deg",
    "PNA_JK", "PNAJKConfig",
    "GAT", "GATConfig",
    "MODEL_REGISTRY",
]
