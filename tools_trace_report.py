"""Summarize the newest jax.profiler trace under TRACE_DIR (/tmp/jaxtrace):
module totals and ranked XLA ops. Pairs with tools_profile_trace.py."""
import collections
import glob
import gzip
import json
import os
import sys

OUT = os.environ.get("TRACE_DIR", "/tmp/jaxtrace")
STEPS = int(os.environ.get("STEPS", "16"))

paths = sorted(glob.glob(os.path.join(OUT, "plugins/profile/*/*.trace.json.gz")))
if not paths:
    sys.exit(f"no traces under {OUT}")
path = paths[-1]
print(f"== {path} ==")
with gzip.open(path) as f:
    tr = json.load(f)
ev = tr["traceEvents"]
tids = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
dev = [p for (p, t), n in tids.items() if n == "XLA Ops"]
if not dev:
    sys.exit("no 'XLA Ops' lane (trace empty?)")
pid = dev[0]
agg = collections.Counter()
cnt = collections.Counter()
mod = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and e["pid"] == pid:
        lane = tids.get((e["pid"], e["tid"]), "")
        if lane == "XLA Ops":
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
        elif lane == "XLA Modules":
            mod[e["name"]] += e["dur"]
for n, d in mod.most_common(4):
    print(f"module {d/1e3:9.1f} ms  {n[:80]}")
print(f"{'total ms':>9} {'per-step us':>12} {'count':>6}  op")
for n, d in agg.most_common(30):
    print(f"{d/1e3:9.2f} {d/STEPS:12.1f} {cnt[n]:6d}  {n[:90]}")
print(f"sum {sum(agg.values())/1e3:.1f} ms over {STEPS} steps")
