# Sequential arxiv-scale validation of APPNP / GCNII / GraphSAGE on the real chip.
import json, time
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.models import APPNP, APPNPConfig, GCN2, GCN2Config, GraphSAGE, SAGEConfig
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

data, in_c, out_c = make_sbm(num_nodes=169_343, num_classes=40, num_features=128,
                             avg_degree=13.7, seed=0)
runs = [
    ("APPNP", APPNP, APPNPConfig(num_nodes=data.num_nodes, in_channels=in_c,
        hidden_channels=256, out_channels=out_c, num_layers=5, dropout=0.3, alpha=0.1)),
    ("GCN2", GCN2, GCN2Config(num_nodes=data.num_nodes, in_channels=in_c,
        hidden_channels=256, out_channels=out_c, num_layers=4, dropout=0.3,
        drop_input=False, batch_norm=True, alpha=0.2, theta=0.5)),
    ("GraphSAGE", GraphSAGE, SAGEConfig(num_nodes=data.num_nodes, in_channels=in_c,
        hidden_channels=256, out_channels=out_c, num_layers=3, dropout=0.3,
        drop_input=False, batch_norm=True)),
]
for name, cls, cfg in runs:
    tcfg = TrainerConfig(num_parts=80, batch_size=40, vr_update=True, epochs=3,
                         lr=0.01, seed=42)
    t0 = time.perf_counter()
    tr = Trainer(cls(cfg), data, tcfg)
    tr.fill_history()
    fill_s = time.perf_counter() - t0
    best = 0
    times = []
    for ep in range(3):
        t0 = time.perf_counter(); tr.train_epoch()
        t1 = time.perf_counter(); ev = tr.evaluate(); t2 = time.perf_counter()
        times.append((round(t1-t0,1), round(t2-t1,1)))
        best = max(best, ev["test_acc"])
    print(json.dumps({"model": name, "fill_s": round(fill_s,1),
                      "epochs": times, "best_test": round(best,4)}), flush=True)
