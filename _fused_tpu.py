import json, time
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.models import GCN2, GCN2Config
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig
data, in_c, out_c = make_sbm(num_nodes=1_000_000, num_classes=47, num_features=100, avg_degree=25.0, seed=0)
cfg = GCN2Config(num_nodes=data.num_nodes, in_channels=in_c, hidden_channels=128,
                 out_channels=out_c, num_layers=5, dropout=0.0, drop_input=False,
                 shared_weights=False, alpha=0.1, theta=0.5)
tcfg = TrainerConfig(num_parts=150, batch_size=1, vr_update=True, epochs=3,
                     lr=0.001, seed=42, hist_dtype="bfloat16")
tr = Trainer(GCN2(cfg), data, tcfg)
t0=time.perf_counter(); tr.fill_history(); print(f"fill {time.perf_counter()-t0:.1f}s", flush=True)
for epoch in range(3):
    t0=time.perf_counter(); m = tr.train_epoch(); te=time.perf_counter()-t0
    t0=time.perf_counter(); ev = tr.evaluate(); td=time.perf_counter()-t0
    print(json.dumps({"epoch": epoch, "steps": m["steps"], "train_s": round(te,1),
                      "eval_s": round(td,1), "test": round(ev["test_acc"],4)}), flush=True)
