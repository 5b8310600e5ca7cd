#!/usr/bin/env python
"""Summarize a training run's metrics.json (and optional eval results).

reference: tools_bin/analysis_results.py. Prints loss trajectories
(first/min/last per key), eval bests, and iteration timing stats.

Usage: python tools/analysis_results.py OUTPUT_DIR [--keys loss_ce,total_loss]
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output_dir")
    p.add_argument("--keys", default="")
    args = p.parse_args()

    path = os.path.join(args.output_dir, "metrics.json")
    rows = [json.loads(l) for l in open(path) if l.strip()]
    if not rows:
        raise SystemExit("no metrics")
    keys = (args.keys.split(",") if args.keys else
            sorted(k for k in rows[-1] if k not in ("iteration",)))

    print(f"{len(rows)} records, iter {rows[0]['iteration']} -> "
          f"{rows[-1]['iteration']}\n")
    print(f"{'key':34s} {'first':>10s} {'min':>10s} {'last':>10s}")
    for k in keys:
        vals = [(r["iteration"], r[k]) for r in rows
                if k in r and r[k] == r[k]]  # drop NaN
        if not vals:
            continue
        v = [x for _, x in vals]
        mn_it = min(vals, key=lambda t: t[1])[0]
        print(f"{k:34s} {v[0]:10.4g} {min(v):10.4g} {v[-1]:10.4g}"
              + (f"   (min @ iter {mn_it})" if k.startswith(("eval", "total"))
                 else ""))

    evals = {k for r in rows for k in r if k.startswith("eval/")}
    if evals:
        print("\nbest eval:")
        for k in sorted(evals):
            vals = [(r[k], r["iteration"]) for r in rows if k in r]
            best, it = max(vals)
            print(f"  {k}: {best:.4g} @ iter {it}")

    best = os.path.join(args.output_dir, "best_checkpoint")
    if os.path.exists(best):
        print("\nbest_checkpoint:", open(best).read().strip())


if __name__ == "__main__":
    main()
