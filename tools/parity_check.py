#!/usr/bin/env python
"""Golden-parity harness: converted real HIPIE weights vs reference outputs.

Three stages, each usable on its own (SURVEY.md §7.1 calls the converter "the
single most important parity tool"; no released .pth ships in this
environment, so the harness is exercised by CI only when weights are
provided):

  1. --pth FILE            convert the checkpoint (utils/hipie_converter),
                           print the coverage report (missing / mismatched /
                           unused tensors) — drive this to zero.
  2. --images DIR          run converted-weight inference on images and dump
                           boxes/scores/token-logits/stride-4 masks to
                           --out parity_ours.npz.
  3. --ref-dump FILE.npz   compare stage-2 outputs against the same tensors
                           dumped from the reference model (run
                           tools/dump_reference_outputs.py inside the
                           reference's torch environment) and write
                           PARITY.md with per-tensor max-abs-diff.

Reference contract: /root/reference/README.md:64-137 reproduction table;
convert_pth2pkl.py is the reference's own weight-surgery precedent.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_state_dict(path):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def convert(pth, cfg):
    from hipie_tpu.utils.hipie_converter import (convert_hipie_checkpoint,
                                                 coverage_report)
    sd = load_state_dict(pth)
    converted = convert_hipie_checkpoint(sd, cfg)   # -> {"params": {...}}
    return sd, converted


def run_inference(cfg, params, image_paths, out_path):
    import jax
    import jax.numpy as jnp
    from hipie_tpu.data import transforms as T
    from hipie_tpu.data.datasets import load_image
    from hipie_tpu.models.hipie import HIPIEModel

    model = HIPIEModel(cfg.model)
    dumps = {}
    for p in image_paths:
        img = load_image(p).astype(np.float32)
        resized, _ = T.resize_shortest_edge(
            img, cfg.data.min_size_test, cfg.data.max_size_test)
        padded, pad_mask = T.pad_to_bucket(resized, (1024, 1024))
        ids = jnp.asarray([[101, 102]], jnp.int32)  # caller supplies prompts
        am = jnp.ones((1, 2), jnp.int32)
        sizes = jnp.asarray([[resized.shape[0], resized.shape[1]]], jnp.int32)
        out = jax.jit(model.apply)(params, padded[None], pad_mask[None],
                                   ids, am, sizes)
        name = os.path.basename(p)
        for k in ("pred_boxes", "pred_logits", "pred_masks"):
            if k in out:
                dumps[f"{name}/{k}"] = np.asarray(out[k][0])
    np.savez_compressed(out_path, **dumps)
    print(f"wrote {len(dumps)} tensors -> {out_path}")


def compare(ours_npz, ref_npz, report_path):
    ours = np.load(ours_npz)
    ref = np.load(ref_npz)
    lines = ["# PARITY.md — converted-weight output diff\n",
             "| tensor | shape | max abs diff | mean abs diff |",
             "|---|---|---|---|"]
    worst = 0.0
    for k in sorted(set(ours.files) & set(ref.files)):
        a, b = ours[k], ref[k]
        if a.shape != b.shape:
            lines.append(f"| {k} | SHAPE {a.shape} vs {b.shape} | — | — |")
            worst = np.inf
            continue
        d = np.abs(a.astype(np.float64) - b.astype(np.float64))
        lines.append(f"| {k} | {a.shape} | {d.max():.3e} | {d.mean():.3e} |")
        worst = max(worst, float(d.max()))
    only = set(ours.files) ^ set(ref.files)
    if only:
        lines.append(f"\nTensors present on one side only: {sorted(only)}")
    lines.append(f"\nWorst max-abs-diff: {worst:.3e}")
    with open(report_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {report_path}; worst={worst:.3e}")
    return worst


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--preset", default="r50_coco_panoptic")
    p.add_argument("--images", default="", help="dir of images for stage 2")
    p.add_argument("--out", default="parity_ours.npz")
    p.add_argument("--ref-dump", default="")
    p.add_argument("--report", default="PARITY.md")
    args = p.parse_args()

    import jax
    from hipie_tpu import presets
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.utils.hipie_converter import coverage_report

    cfg = getattr(presets, args.preset)()
    sd, converted = convert(args.pth, cfg)

    # stage 1: coverage against a freshly-initialized param tree
    import jax.numpy as jnp
    model = HIPIEModel(cfg.model)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pad = jnp.zeros((1, 64, 64), bool)
    ids = jnp.asarray([[101, 102]], jnp.int32)
    am = jnp.ones((1, 2), jnp.int32)
    sizes = jnp.asarray([[64, 64]], jnp.int32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img, pad, ids, am, sizes))
    rep = coverage_report(sd, converted, params)
    print(json.dumps({k: len(v) for k, v in rep.items()}, indent=2))
    for k, v in rep.items():
        for item in v[:20]:
            print(f"  {k}: {item}")

    if args.images:
        paths = sorted(
            os.path.join(args.images, f) for f in os.listdir(args.images)
            if f.lower().endswith((".jpg", ".png", ".jpeg")))
        run_inference(cfg, converted, paths, args.out)
    if args.ref_dump:
        compare(args.out, args.ref_dump, args.report)


if __name__ == "__main__":
    main()
