import json, subprocess, sys, time
# 1) bench
t0=time.perf_counter()
out = subprocess.run([sys.executable, "bench.py"], capture_output=True, text=True, timeout=900)
print("BENCH:", out.stdout.strip().splitlines()[-1] if out.stdout.strip() else out.stderr[-200:], flush=True)
# 2) GAT at arxiv scale (COO path), short
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.models import GAT, GATConfig
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig
data, in_c, out_c = make_sbm(num_nodes=169_343, num_classes=40, num_features=128, avg_degree=13.7, seed=0)
cfg = GATConfig(num_nodes=data.num_nodes, in_channels=in_c, hidden_channels=64,
                out_channels=out_c, num_layers=2, dropout=0.3, hidden_heads=4, out_heads=1)
tcfg = TrainerConfig(num_parts=80, batch_size=40, vr_update=False, epochs=2,
                     lr=0.005, seed=42, loop=False, norm=False)
tr = Trainer(GAT(cfg), data, tcfg)
t0=time.perf_counter(); tr.fill_history(); print(f"GAT fill {time.perf_counter()-t0:.1f}s", flush=True)
for ep in range(2):
    t0=time.perf_counter(); tr.train_epoch(); t1=time.perf_counter()
    ev = tr.evaluate(); t2=time.perf_counter()
    print(json.dumps({"model":"GAT","epoch":ep,"train_s":round(t1-t0,1),"eval_s":round(t2-t1,1),"test":round(ev["test_acc"],4)}), flush=True)
