"""Reference-protocol accuracy parity suite on the hard SBM presets.

Mirrors the reference's results protocol (``--runs`` repeats, mean +- std;
README.md:53-75 table shape) on the calibrated non-saturated presets
(graph/datasets.py::_SBM_HARD_PRESETS), across the model family x both
update rules — the environment-portable stand-in for the real-dataset
table (no dataset files exist here; VERDICT r1 item 2).

    python scripts/accuracy_suite.py --runs 3 --out docs/accuracy_suite_r02.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("INCAGG_PLATFORM", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--datasets", nargs="+",
                    default=["sbm-arxiv-hard", "sbm-products-hard"])
    ap.add_argument("--models", nargs="+",
                    default=["gcn", "gcn2", "appnp", "sage"])
    ap.add_argument("--hist-dtypes", nargs="+", default=["float32"],
                    help="history-cache dtypes to characterize (VERDICT r4 "
                         "#5: fp8 vs bf16 vs f32 on a hard preset); keys "
                         "gain a -dtype suffix when more than one is given")
    ap.add_argument("--root", default="/tmp",
                    help="dataset root for real npz archives (day-one real-"
                         "data runs: --datasets arxiv products --root /data)")
    ap.add_argument("--out", default="docs/accuracy_suite_r02.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from incagg_gnn_tpu.graph.datasets import get_data
    from incagg_gnn_tpu.models import (APPNP, GAT, GCN, GCN2, PNA,
                                       APPNPConfig, GATConfig, GCNConfig,
                                       GCN2Config, GraphSAGE, PNAConfig,
                                       SAGEConfig, compute_avg_deg)
    from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

    def build(model_name, data, in_c, out_c):
        n = data.num_nodes
        common = dict(num_nodes=n, in_channels=in_c, out_channels=out_c,
                      hidden_channels=64, dropout=0.3)
        if model_name == "gcn":
            return GCN(GCNConfig(num_layers=3, drop_input=False,
                                 batch_norm=True, **common))
        if model_name == "gcn2":
            return GCN2(GCN2Config(num_layers=4, drop_input=False,
                                   batch_norm=True, alpha=0.1, theta=0.5,
                                   **common))
        if model_name == "appnp":
            return APPNP(APPNPConfig(num_layers=3, alpha=0.1, **common))
        if model_name == "sage":
            return GraphSAGE(SAGEConfig(num_layers=3, drop_input=False,
                                        batch_norm=True, **common))
        if model_name == "pna":
            import numpy as _np

            deg = _np.diff(_np.asarray(data.adj_t.rowptr))
            lin, log = compute_avg_deg(deg)
            return PNA(PNAConfig(num_layers=2, drop_input=False,
                                 avg_deg_lin=lin, avg_deg_log=log,
                                 true_vr=True, **common))
        if model_name == "gat":
            return GAT(GATConfig(num_layers=2, hidden_heads=4, out_heads=1,
                                 **common))
        raise ValueError(model_name)

    results = {}
    for ds in args.datasets:
      for model_name in args.models:
        for mode, vr in (("gas", False), ("reverb", True)):
            for hd in args.hist_dtypes:
                accs = []
                for run in range(args.runs):
                    data, in_c, out_c = get_data(args.root, ds, seed=run)
                    model = build(model_name, data, in_c, out_c)
                    tcfg = TrainerConfig(
                        num_parts=16, batch_size=4, vr_update=vr,
                        epochs=args.epochs, lr=0.01, seed=run,
                        log_every=1000, hist_dtype=hd)
                    t0 = time.time()
                    res = Trainer(model, data, tcfg).fit()
                    accs.append(float(res["best_test"]))
                    print(f"{ds} {model_name}-{mode}-{hd} run{run}: "
                          f"{accs[-1]:.4f} [{time.time()-t0:.0f}s]",
                          flush=True)
                key = f"{ds}/{model_name}-{mode}"
                if len(args.hist_dtypes) > 1:
                    key += f"-{hd}"
                results[key] = {
                    "mean": round(float(np.mean(accs)), 4),
                    "std": round(float(np.std(accs)), 4),
                    "runs": accs,
                }
                with open(args.out, "w") as f:
                    json.dump({"protocol": {"runs": args.runs,
                                            "epochs": args.epochs,
                                            "hidden": 64, "num_parts": 16,
                                            "batch_size": 4, "lr": 0.01,
                                            "hist_dtypes": args.hist_dtypes},
                               "results": results}, f, indent=1)
    print("DONE", args.out)


if __name__ == "__main__":
    main()
