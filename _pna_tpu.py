import json, time
from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.models import PNA, PNAConfig, compute_avg_deg
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig
data, in_c, out_c = make_sbm(num_nodes=50_000, num_classes=16, num_features=64, avg_degree=12.0, seed=0)
lin_d, log_d = compute_avg_deg(data.adj_t.degrees())
cfg = PNAConfig(num_nodes=data.num_nodes, in_channels=in_c, hidden_channels=128,
                out_channels=out_c, num_layers=2, dropout=0.2, drop_input=False,
                batch_norm=True, aggregators=("mean","max","sum"),
                scalers=("identity","amplification"), avg_deg_lin=lin_d, avg_deg_log=log_d)
tcfg = TrainerConfig(num_parts=20, batch_size=5, vr_update=False, epochs=2, lr=0.005,
                     seed=42, loop=False, norm=False)
tr = Trainer(PNA(cfg), data, tcfg)
t0=time.perf_counter(); tr.fill_history(); print(f"PNA fill {time.perf_counter()-t0:.1f}s", flush=True)
for ep in range(2):
    t0=time.perf_counter(); tr.train_epoch(); t1=time.perf_counter()
    ev = tr.evaluate(); t2=time.perf_counter()
    print(json.dumps({"model":"PNA","epoch":ep,"train_s":round(t1-t0,1),"eval_s":round(t2-t1,1),"test":round(ev["test_acc"],4)}), flush=True)
