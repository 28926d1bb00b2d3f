"""Parse a captured .xplane.pb into a top-self-time HLO op table.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python tools/parse_profile.py [logdir] [tool]
tool: hlo_stats (default) | op_profile | framework_op_stats
"""

import glob
import json
import sys

logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scrubvae_profile"
tool = sys.argv[2] if len(sys.argv) > 2 else "hlo_stats"

xplanes = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
assert xplanes, f"no xplane under {logdir}"
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

data, _ = rtd.xspace_to_tool_data([xplanes[-1]], tool, {})
if isinstance(data, bytes):
    data = data.decode()

obj = json.loads(data)
if isinstance(obj, dict) and "cols" in obj:
    cols = [c.get("label", c.get("id")) for c in obj["cols"]]
    rows = [[(c or {}).get("v") for c in r["c"]] for r in obj["rows"]]
else:
    # gviz wrapped differently per tool
    print(json.dumps(obj)[:2000])
    sys.exit(0)

print("COLS:", cols)
# pick a time column to sort by
tcol = None
for cand in ("Avg. self time (us)", "Self Time (us)", "self_time_us",
             "Total Self Time (us)", "Self time (us)"):
    if cand in cols:
        tcol = cols.index(cand)
        break
if tcol is None:
    tcol = next(
        (i for i, c in enumerate(cols) if "self" in str(c).lower() and "time" in str(c).lower()),
        None,
    )
if tcol is not None:
    rows.sort(key=lambda r: -(r[tcol] or 0))
total = sum((r[tcol] or 0) for r in rows) if tcol is not None else 0
print(f"total self time: {total:.0f} us over {len(rows)} ops")
for r in rows[:35]:
    print([str(x)[:110] for x in r])
