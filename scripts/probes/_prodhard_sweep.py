"""Calibration sweep for a DISCRIMINATIVE products-hard preset (VERDICT r4
item 4): the v3 preset (p_in 0.8, label_noise 0.25) saturates every model
at the 0.766 ceiling — GCN == GCNII == SAGE to 3 decimals, so the suite
cannot detect a GCNII-specific regression, which was its point (the
reference's table separates them: products GCN 75.3 / GCNII 76.2 / APPNP
78.5, README.md:68-70).

Keep the homophily + ceiling DESIGN; open headroom below the ceiling by
(verdict's knobs) lowering label noise, raising class count, shrinking
features — until the family ORDERS (GCNII >= GCN by a margin > noise).
Each candidate keeps num_nodes=50K / avg_degree=50 (the products-shape
invariants).

    python scripts/probes/_prodhard_sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
os.environ.setdefault("INCAGG_PLATFORM", "cpu")

CANDS = {
    # v3 shipped preset (control — expect ceiling-pinned ties)
    "v3": dict(num_classes=16, num_features=64, feature_noise=8.0,
               label_noise=0.25),
    # lower noise only: ceiling 1-.15*15/16 = 0.859
    "ln15": dict(num_classes=16, num_features=64, feature_noise=8.0,
                 label_noise=0.15),
    # + harder features: more classes, fewer features
    "c32f32": dict(num_classes=32, num_features=32, feature_noise=8.0,
                   label_noise=0.15),
    "c64f16": dict(num_classes=64, num_features=16, feature_noise=8.0,
                   label_noise=0.15),
    # near-overlapping class centers: aggregation depth is the only signal
    "c64f16n12": dict(num_classes=64, num_features=16, feature_noise=12.0,
                      label_noise=0.15),
    "c32f16n12": dict(num_classes=32, num_features=16, feature_noise=12.0,
                      label_noise=0.15),
    # depth-limited regime: at deg 50 / p_in 0.8 ONE hop averages away any
    # moderate feature noise, so GCN always reaches the ceiling.  Crank the
    # noise past the one-hop budget (sigma >> sqrt(50)) and/or starve the
    # label rate so long-range propagation (GCNII/APPNP's edge) is needed.
    "n20": dict(num_classes=16, num_features=32, feature_noise=20.0,
                label_noise=0.15),
    "n30": dict(num_classes=16, num_features=32, feature_noise=30.0,
                label_noise=0.15),
    "n20tf1": dict(num_classes=16, num_features=32, feature_noise=20.0,
                   label_noise=0.15, train_frac=0.01),
    "n30tf1": dict(num_classes=16, num_features=32, feature_noise=30.0,
                   label_noise=0.15, train_frac=0.01),
    # power-law hubs: hub neighborhoods are class-mixed, punishing naive
    # averaging — the structural axis where initial-residual models can win
    "pl": dict(num_classes=16, num_features=32, feature_noise=10.0,
               label_noise=0.15, degree_skew=0.8, p_in=0.55),
    "pln16": dict(num_classes=16, num_features=32, feature_noise=16.0,
                  label_noise=0.15, degree_skew=0.8, p_in=0.55),
}


def run_one(cand: dict, model_name: str, seed: int, epochs: int,
            layers: int | None = None) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from incagg_gnn_tpu.graph.datasets import make_sbm
    from incagg_gnn_tpu.models import (APPNP, APPNPConfig, GCN, GCNConfig,
                                       GCN2, GCN2Config)
    from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

    kw = dict(num_nodes=50_000, avg_degree=50.0, p_in=0.8, train_frac=0.05,
              seed=seed)
    kw.update(cand)
    data, in_c, out_c = make_sbm(**kw)
    common = dict(num_nodes=data.num_nodes, in_channels=in_c,
                  out_channels=out_c, hidden_channels=64, dropout=0.3)
    if model_name == "gcn":
        model = GCN(GCNConfig(num_layers=layers or 3, drop_input=False,
                              batch_norm=True, **common))
    elif model_name == "gcn2":
        model = GCN2(GCN2Config(num_layers=layers or 4, drop_input=False,
                                batch_norm=True, alpha=0.1, theta=0.5,
                                **common))
    elif model_name == "appnp":
        model = APPNP(APPNPConfig(num_layers=3, alpha=0.1, **common))
    else:
        raise ValueError(model_name)
    tcfg = TrainerConfig(num_parts=16, batch_size=4, vr_update=False,
                         epochs=epochs, lr=0.01, seed=seed, log_every=1000)
    return float(Trainer(model, data, tcfg).fit()["best_test"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="1 seed, GCN+GCNII only (the ordering screen)")
    ap.add_argument("--cands", nargs="+", default=list(CANDS))
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--out", default="/tmp/prodhard_sweep.json")
    args = ap.parse_args()

    models = ["gcn", "gcn2"] if args.quick else ["gcn", "gcn2", "appnp"]
    out = {}
    for name in args.cands:
        cand = CANDS[name]
        ceiling = 1 - cand["label_noise"] * (cand["num_classes"] - 1) \
            / cand["num_classes"]
        row = {"ceiling": round(ceiling, 3)}
        for m in models:
            accs = []
            for s in range(args.seeds):
                t0 = time.time()
                accs.append(run_one(cand, m, s, args.epochs))
                print(f"{name} {m} seed{s}: {accs[-1]:.4f} "
                      f"[{time.time()-t0:.0f}s]", flush=True)
            row[m] = [round(a, 4) for a in accs]
        if "gcn" in row and "gcn2" in row:
            row["gcn2_minus_gcn"] = round(
                sum(row["gcn2"]) / len(row["gcn2"])
                - sum(row["gcn"]) / len(row["gcn"]), 4)
        out[name] = row
        print(json.dumps({name: row}), flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
