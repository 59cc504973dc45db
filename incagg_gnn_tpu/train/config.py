"""Config system (reference: Hydra + conf/ YAMLs, SURVEY §5.6).

Same composition shape as the reference — a model YAML holding a
``params.<dataset>`` block of architecture + trainer knobs, selected at
runtime — but with **every** flag declared and validated (the reference
required undeclared ``++key=value`` CLI overrides for seed/batch_size/
VR_update/... , SURVEY §2.9).  Plain YAML + dataclasses, no Hydra dependency.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml

from incagg_gnn_tpu.train.trainer import TrainerConfig


@dataclasses.dataclass
class RunConfig:
    model: str  # GCN | GCN2 | APPNP | GraphSAGE | PNA | PNA_JK | GAT
    dataset: str
    root: str = "/tmp/datasets"
    architecture: Dict[str, Any] = dataclasses.field(default_factory=dict)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    hist_dtype: str = "float32"
    log_every: int = 1


_TRAINER_KEYS = {f.name for f in dataclasses.fields(TrainerConfig)}


def load_config(
    model_yaml: str,
    dataset: str,
    overrides: Optional[Dict[str, Any]] = None,
) -> RunConfig:
    """Compose a run config from a model YAML's per-dataset block + overrides.

    YAML layout (mirrors conf/model/*.yaml in the reference):

        name: GCN
        norm: true
        loop: true
        params:
          arxiv:
            architecture: {num_layers: 3, hidden_channels: 256, ...}
            num_parts: 80
            batch_size: 40
            lr: 0.01
            ...
    """
    with open(model_yaml) as f:
        doc = yaml.safe_load(f)
    name = doc["name"]
    if dataset not in doc.get("params", {}):
        raise KeyError(
            f"model {name} has no hyperparameter block for dataset "
            f"{dataset!r}; available: {sorted(doc.get('params', {}))}"
        )
    block = dict(doc["params"][dataset])
    arch = dict(block.pop("architecture", {}))

    tkw: Dict[str, Any] = {
        "loop": bool(doc.get("loop", True)),
        "norm": bool(doc.get("norm", True)),
    }
    alias = {"VR_update": "vr_update", "edge_dropout": "edge_dropout"}
    for k, v in block.items():
        k = alias.get(k, k)
        if k in _TRAINER_KEYS:
            if k == "grad_norm" and (v is None or isinstance(v, str)):
                v = None  # reference YAMLs use 'none'/null strings
            tkw[k] = v
    cfg = RunConfig(model=name, dataset=dataset, architecture=arch)

    for k, v in (overrides or {}).items():
        k = alias.get(k, k)
        if k in _TRAINER_KEYS:
            tkw[k] = v
        elif k in ("model", "dataset", "root", "hist_dtype", "log_every"):
            setattr(cfg, k, v)
        else:
            cfg.architecture[k] = v

    if "grad_norm" in tkw and isinstance(tkw["grad_norm"], str):
        tkw["grad_norm"] = None
    cfg.trainer = TrainerConfig(**tkw)
    return cfg


def parse_overrides(argv) -> Dict[str, Any]:
    """Parse ``key=value`` CLI overrides with YAML-typed values."""
    out = {}
    for a in argv:
        if "=" not in a:
            raise ValueError(f"override must be key=value, got {a!r}")
        k, v = a.split("=", 1)
        out[k.lstrip("+")] = yaml.safe_load(v)
    return out
