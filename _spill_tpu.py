import json, time
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.models import GCN, GCNConfig
from incagg_gnn_tpu.train.spill_trainer import SpillVRTrainer
from incagg_gnn_tpu.train.trainer import TrainerConfig
data, in_c, out_c = make_sbm(num_nodes=169_343, num_classes=40, num_features=128, avg_degree=13.7, seed=0)
cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c, hidden_channels=256,
                out_channels=out_c, num_layers=3, dropout=0.3, drop_input=False, batch_norm=True)
tcfg = TrainerConfig(num_parts=80, batch_size=40, vr_update=True, epochs=3, lr=0.01, seed=42)
tr = SpillVRTrainer(GCN(cfg), data, tcfg)
t0=time.perf_counter(); tr.fill_history(); print(f"spill fill {time.perf_counter()-t0:.1f}s", flush=True)
for ep in range(3):
    t0=time.perf_counter(); m = tr.train_epoch(); t1=time.perf_counter()
    ev = tr.evaluate(); t2=time.perf_counter()
    print(json.dumps({"epoch":ep,"train_s":round(t1-t0,1),"eval_s":round(t2-t1,1),"test":round(ev["test_acc"],4)}), flush=True)
