"""Shared perfetto-trace parsing for the profiling tools.

jax.profiler writes a chrome-trace JSON per capture; the device process
carries per-HLO-op events (module totals live on tid 2)."""

from __future__ import annotations

import collections
import glob
import gzip
import json


def print_top_device_ops(trace_dir: str, top: int = 40) -> None:
    path = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(path))
    ev = d["traceEvents"]
    pid = None
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in str(e.get("args", {}).get("name", "")):
            pid = e["pid"]
    per_op = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e["pid"] == pid and e.get("tid") != 2:
            per_op[e["name"]] += e["dur"]
            total += e["dur"]
    print(f"device total: {total / 1e6:.2f} s over {len(per_op)} distinct ops"
          " (op durations overlap; module wall time is the tid-2 jit event)")
    for name, us in per_op.most_common(top):
        print(f"{us / 1e3:10.1f} ms  {name[:110]}")


def print_scope_rollup(trace_dir: str, scopes) -> None:
    """Aggregate device time by jax.named_scope: each device event whose
    metadata (args strings, which carry the 'jit(fn)/scope/op' HLO op path)
    mentions one of `scopes` is attributed to the FIRST matching scope."""
    path = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(path))
    ev = d["traceEvents"]
    pid = None
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in str(e.get("args", {}).get("name", "")):
            pid = e["pid"]
    per_scope = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e["pid"] != pid or e.get("tid") == 2:
            continue
        blob = e.get("name", "") + " " + " ".join(
            str(v) for v in e.get("args", {}).values())
        total += e["dur"]
        for s in scopes:
            if s in blob:
                per_scope[s] += e["dur"]
                break
        else:
            per_scope["<other>"] += e["dur"]
    print(f"scope rollup (device total {total / 1e6:.2f} s):")
    for name, us in per_scope.most_common():
        print(f"{us / 1e3:10.1f} ms  {name}")
