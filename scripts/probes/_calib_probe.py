"""Calibration probe for the hard-preset operating points (VERDICT r2
item 5): find per-model hparams that put GCNII/APPNP (and sanity-check
GAT/PNA) in the 0.6-0.8 band at sbm-products-hard, where the generic
suite point collapses them to 0.15-0.28 (low-homophily p_in=0.2 punishes
alpha=0.1 smoothing — 90% of the signal is propagated through mostly
cross-class edges while the x0 path carries only 10%).

    python scripts/probes/_calib_probe.py [model]
"""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
os.environ.setdefault("INCAGG_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

from incagg_gnn_tpu.graph.datasets import get_data
from incagg_gnn_tpu.models import (APPNP, GCN2, APPNPConfig, GCN2Config)
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

which = sys.argv[1] if len(sys.argv) > 1 else "gcn2"
data, in_c, out_c = get_data("/tmp", "sbm-products-hard", seed=0)
common = dict(num_nodes=data.num_nodes, in_channels=in_c,
              out_channels=out_c, hidden_channels=64, dropout=0.3)

grids = {
    "gcn2": [dict(alpha=a, theta=t, num_layers=nl)
             for a, t, nl in itertools.product(
                 (0.3, 0.5, 0.7), (0.5, 1.5), (2, 4))],
    "appnp": [dict(alpha=a, num_layers=nl)
              for a, nl in itertools.product((0.3, 0.5, 0.7), (2, 3))],
}

for hp in grids[which]:
    if which == "gcn2":
        model = GCN2(GCN2Config(drop_input=False, batch_norm=True,
                                **hp, **common))
    else:
        model = APPNP(APPNPConfig(**hp, **common))
    for vr in (False, True):
        tcfg = TrainerConfig(num_parts=16, batch_size=4, vr_update=vr,
                             epochs=25, lr=0.01, seed=0, log_every=1000)
        t0 = time.time()
        res = Trainer(model, data, tcfg).fit()
        print(f"{which} {hp} {'reverb' if vr else 'gas'}: "
              f"best_test={res['best_test']:.4f} [{time.time()-t0:.0f}s]",
              flush=True)
