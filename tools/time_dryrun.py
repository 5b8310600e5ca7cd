#!/usr/bin/env python
"""Measure the GRADED multichip dryrun end-to-end on a cold cache.

The driver runs `__graft_entry__.dryrun_multichip(8)` in a fresh process on a
1-core host with a hard wall-clock budget; rounds 3 and 4 lost their multichip
evidence to compile-time overruns (VERDICT r4 #1). This tool reproduces the
graded conditions — fresh subprocess, process-private cache (the dryrun makes
its own), 8 virtual CPU devices — times it, and fails if it exceeds the
budget.

Usage: python tools/time_dryrun.py [--budget 300] [--full]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=300.0,
                    help="seconds the graded path must fit in (driver ~600)")
    ap.add_argument("--full", action="store_true",
                    help="also time the HIPIE_DRYRUN_FULL=1 legs")
    args = ap.parse_args()

    env = dict(os.environ)
    env.pop("HIPIE_DRYRUN_FULL", None)
    if args.full:
        env["HIPIE_DRYRUN_FULL"] = "1"
    # the dryrun forces jax_platforms=cpu itself; drop any tunnel platform
    env.pop("JAX_PLATFORMS", None)

    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c", CHILD], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=args.budget * 4)
    dt = time.perf_counter() - t0
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-2000:])
    mode = "FULL" if args.full else "graded"
    print(f"\n[time_dryrun] {mode} cold wall time: {dt:.1f}s "
          f"(budget {args.budget:.0f}s)")
    if proc.returncode != 0:
        print(f"[time_dryrun] FAIL rc={proc.returncode}")
        return 1
    if not args.full and dt > args.budget:
        print("[time_dryrun] FAIL: over budget")
        return 2
    print("[time_dryrun] OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
