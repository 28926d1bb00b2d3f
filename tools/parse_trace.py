"""Aggregate a jax.profiler trace.json.gz into top-self-time op rows.

Usage: python tools/parse_trace.py [logdir] [top_n]
Groups TPU-device 'X' events by name prefix (fusion names keep their hlo
op category in the name); prints total us and % of device time.
"""

import collections
import glob
import gzip
import json
import re
import sys

logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scrubvae_profile"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

path = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path, "rt") as f:
    trace = json.load(f)

events = trace["traceEvents"]
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")

dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}
if not dev_pids:
    # fallback: any pid whose name mentions XLA modules
    dev_pids = set(pids)

agg = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    name = e.get("name", "")
    if name.startswith("jit_") or name.startswith("Steps") or name.isdigit():
        continue  # module-level / per-step-number envelopes
    dur = float(e.get("dur", 0.0))
    total += dur
    agg[name] += dur

print(f"trace: {path}")
print(f"pids: { {p: pids.get(p) for p in dev_pids} }")
print(f"device op time total: {total/1e3:.2f} ms across {len(agg)} op names")
for name, dur in agg.most_common(top_n):
    print(f"{dur/1e3:9.3f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:120]}")
