#!/usr/bin/env python
"""Profile one production-shaped pass on the real TPU and rank XLA op
self-times (span minus children) from the trace-viewer JSON.

Usage: python tools/perf/profile_pass.py [fwd|colors|full] [top_n]

The trace is also loadable in TensorBoard; this parser needs only the
trace-viewer JSON (works through the axon tunnel, CLAUDE.md hazard 6).
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))  # repo root
sys.path.insert(0, _HERE)

from ladder import STAGES  # noqa: E402  (reuses the jitted stage fns)

stage = sys.argv[1] if len(sys.argv) > 1 else "full"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
fn = STAGES[stage]

# compile + warm
float(fn(jax.random.key(0)))

logdir = f"/tmp/r6_trace_{stage}"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
outs = [fn(jax.random.key(i + 1)) for i in range(3)]
for o in outs:
    float(o)
jax.profiler.stop_trace()

paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
assert paths, f"no trace under {logdir}"
with gzip.open(paths[0], "rt") as f:
    trace = json.load(f)

events = trace["traceEvents"]
# find TPU device track pids (process names containing TPU / device)
pid_name = {}
tid_name = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_name[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

dev_pids = {p for p, nm in pid_name.items()
            if "TPU" in nm or "/device" in nm.lower()}
print("device tracks:", {p: pid_name[p] for p in dev_pids}, file=sys.stderr)

# X-events on device tracks, per thread; self-time = dur minus children
by_tid = defaultdict(list)
for e in events:
    if e.get("ph") == "X" and e["pid"] in dev_pids:
        tname = tid_name.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():
            continue
        by_tid[(e["pid"], e["tid"])].append(e)

agg = defaultdict(lambda: [0.0, 0])  # name -> [self_us, count]
total_span = 0.0
for tid, evs in by_tid.items():
    # trace-viewer X-events nest fully within their parents, so a
    # start-time sweep with a stack recovers the nesting; self-time =
    # span minus the summed child spans
    items = sorted(evs, key=lambda e: (e["ts"], -e.get("dur", 0)))
    st = []
    for e in items:
        ts, dur = e["ts"], e.get("dur", 0)
        while st and ts >= st[-1]["ts"] + st[-1].get("dur", 0):
            st.pop()
        if st:
            st[-1]["_child"] = st[-1].get("_child", 0) + dur
        st.append(e)
    for e in items:
        self_us = e.get("dur", 0) - e.get("_child", 0)
        agg[e["name"]][0] += self_us
        agg[e["name"]][1] += 1
        total_span += self_us

rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
print(f"stage={stage} total device self-time {total_span/1e3:.1f} ms "
      f"over 3 passes ({total_span/3e3:.1f} ms/pass)")
for name, (self_us, cnt) in rows[:top_n]:
    print(f"{self_us/3e3:9.2f} ms/pass  x{cnt:5d}  {name[:110]}")
