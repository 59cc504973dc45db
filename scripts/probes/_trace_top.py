"""Parse a jax perfetto trace (trace.json.gz) and print top device ops by
total duration.  Usage: python _trace_top.py /tmp/refresh_trace"""

import collections
import glob
import gzip
import json
import sys

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refresh_trace"
paths = glob.glob(f"{root}/**/*.json.gz", recursive=True) + glob.glob(
    f"{root}/**/*trace.json", recursive=True)
if not paths:
    sys.exit(f"no perfetto trace under {root}")
import os

path = max(paths, key=os.path.getmtime)
print(f"# parsing {path}", file=sys.stderr)
opener = gzip.open if path.endswith(".gz") else open
with opener(path, "rt") as f:
    data = json.load(f)

events = data["traceEvents"] if isinstance(data, dict) else data
# identify device-side tracks (TPU/XLA ops carry 'dur' on X events)
tot = collections.Counter()
cnt = collections.Counter()
pid_names = {}
for ev in events:
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
for ev in events:
    if ev.get("ph") != "X":
        continue
    pidname = pid_names.get(ev.get("pid"), "")
    if "TPU" not in pidname and "device" not in pidname.lower() \
            and "XLA" not in pidname:
        continue
    name = ev.get("name", "?")
    tot[name] += ev.get("dur", 0)
    cnt[name] += 1

if not tot:  # fall back: every X event
    for ev in events:
        if ev.get("ph") == "X":
            tot[ev.get("name", "?")] += ev.get("dur", 0)
            cnt[ev.get("name", "?")] += 1

print(f"{'total_ms':>10} {'count':>7}  name  (tracks: "
      f"{sorted(set(pid_names.values()))})")
for name, us in tot.most_common(40):
    print(f"{us/1e3:10.2f} {cnt[name]:7d}  {name[:140]}")
