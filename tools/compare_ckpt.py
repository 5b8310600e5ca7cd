#!/usr/bin/env python
"""Compare two checkpoints parameter-by-parameter.

reference: tools_bin/compare_ckpt.py (torch .pth diff). Works on orbax
checkpoint dirs (as written by hipie_tpu.train.checkpoint) and on torch
.pth/.pkl files (converted through the same mapping as training init), so a
converted-weights tree can be diffed against a trained one.

Usage: python tools/compare_ckpt.py CKPT_A CKPT_B [--top 20] [--rtol 1e-5]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_params(path: str, preset: str = "r50_coco_panoptic"):
    if path.endswith((".pth", ".pkl")):
        from hipie_tpu import presets
        from hipie_tpu.utils.converter import load_torch_checkpoint
        from hipie_tpu.utils.hipie_converter import convert_hipie_checkpoint
        sd = load_torch_checkpoint(path)
        return convert_hipie_checkpoint(sd, getattr(presets, preset)())
    import orbax.checkpoint as ocp
    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    return restored.get("params", restored)


def flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt_a")
    p.add_argument("ckpt_b")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--rtol", type=float, default=1e-5)
    p.add_argument("--preset", default="r50_coco_panoptic",
                   help="config preset used to map .pth checkpoints")
    args = p.parse_args()

    fa = flatten(load_params(args.ckpt_a, args.preset))
    fb = flatten(load_params(args.ckpt_b, args.preset))
    only_a = sorted(set(fa) - set(fb))
    only_b = sorted(set(fb) - set(fa))
    for k in only_a[:10]:
        print(f"only in A: {k} {fa[k].shape}")
    for k in only_b[:10]:
        print(f"only in B: {k} {fb[k].shape}")
    if len(only_a) > 10 or len(only_b) > 10:
        print(f"... ({len(only_a)} only-A, {len(only_b)} only-B total)")

    diffs = []
    n_equal = n_shape = 0
    for k in sorted(set(fa) & set(fb)):
        a, b = fa[k], fb[k]
        if a.shape != b.shape:
            print(f"SHAPE MISMATCH {k}: {a.shape} vs {b.shape}")
            n_shape += 1
            continue
        a = a.astype(np.float32)
        b = b.astype(np.float32)
        d = float(np.max(np.abs(a - b))) if a.size else 0.0
        rel = d / (float(np.max(np.abs(a))) + 1e-12)
        if rel <= args.rtol:
            n_equal += 1
        else:
            diffs.append((rel, d, k, a.shape))
    diffs.sort(reverse=True)
    print(f"\n{n_equal} params equal (rtol {args.rtol}), {len(diffs)} differ, "
          f"{n_shape} shape mismatches")
    for rel, d, k, shape in diffs[:args.top]:
        print(f"  rel {rel:9.3g}  abs {d:9.3g}  {k} {shape}")


if __name__ == "__main__":
    main()
