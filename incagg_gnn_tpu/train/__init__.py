from incagg_gnn_tpu.train.tables import DeviceTables, make_tables
from incagg_gnn_tpu.train.steps import make_gas_train_step, make_vr_train_step
from incagg_gnn_tpu.train.optim import make_optimizer

__all__ = [
    "DeviceTables",
    "make_tables",
    "make_gas_train_step",
    "make_vr_train_step",
    "make_optimizer",
]
