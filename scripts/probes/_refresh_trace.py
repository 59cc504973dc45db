"""Profile the real products-mid one-dispatch refresh sweep and dump a
perfetto trace (parse with _trace_top.py) — ground truth for where the
4.9 s goes (ROADMAP 'refresh-sweep compute')."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/incagg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from incagg_gnn_tpu.graph.datasets import get_data
from incagg_gnn_tpu.models import GCN2, GCN2Config
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

data, in_c, out_c = get_data("/tmp", "sbm-products-mid", seed=42)
cfg = GCN2Config(num_nodes=data.num_nodes, in_channels=in_c,
                 hidden_channels=128, out_channels=out_c, num_layers=5,
                 dropout=0.0, drop_input=False, batch_norm=False,
                 shared_weights=False, alpha=0.1, theta=0.5)
tcfg = TrainerConfig(num_parts=30, batch_size=1, vr_update=True, seed=42,
                     epochs=1, lr=0.001, hist_dtype="bfloat16",
                     x_dtype="bfloat16")
t0 = time.perf_counter()
tr = Trainer(GCN2(cfg), data, tcfg, log=True)
print(f"build {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
tr.fill_history()
print(f"fill {time.perf_counter()-t0:.1f}s", flush=True)
print("plan:", tr.model._last_refresh_plan, flush=True)

for i in range(2):
    t0 = time.perf_counter()
    tr._refresh(host_logits=False)
    jax.block_until_ready(tr.out_table)
    print(f"refresh[{i}] {time.perf_counter()-t0:.2f}s", flush=True)

out = "/tmp/refresh_trace"
jax.profiler.start_trace(out, create_perfetto_trace=True)
t0 = time.perf_counter()
tr._refresh(host_logits=False)
jax.block_until_ready(tr.out_table)
print(f"refresh[traced] {time.perf_counter()-t0:.2f}s", flush=True)
jax.profiler.stop_trace()
print("trace dir:", out, flush=True)
