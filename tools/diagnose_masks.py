#!/usr/bin/env python
"""Diagnostic: load a trained checkpoint, run the predictor on TRAIN images,
and report per-instance mask quality vs GT (areas, logit stats, best-IoU per
GT). Used to separate 'masks undertrained' from 'mask pipeline bug' (VERDICT
r3 missing #2).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--config-file", default="configs/smoke_tiny_coco.yaml")
    p.add_argument("--dataset", default="coco_panoptic_train")
    p.add_argument("--max-images", type=int, default=2)
    p.add_argument("--score-thresh", type=float, default=0.1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hipie_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from hipie_tpu.config import load_config
    from hipie_tpu.data.datasets import get_dataset, load_image, \
        decode_segmentation
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.models.text.tokenizer import WordPieceTokenizer
    from hipie_tpu.predictor import HIPIEPredictor
    from hipie_tpu.train.checkpoint import resume_or_load
    from hipie_tpu.train.step import TrainState

    cfg = load_config(args.config_file)
    model = HIPIEModel(cfg.model)
    L = cfg.data.max_text_len
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)),
        jnp.zeros((1, 512, 512), bool), jnp.zeros((1, L), jnp.int32),
        jnp.ones((1, L), jnp.int32), jnp.asarray([[512, 512]]))
    state = TrainState(params, None, 0)
    state, _ = resume_or_load("", state, args.weights, resume=False)
    predictor = HIPIEPredictor(cfg, state.params, WordPieceTokenizer.toy())

    records = get_dataset(args.dataset)
    for rec in records[: args.max_images]:
        img = rec.get("image")
        if img is None:
            img = load_image(rec["file_name"])
        h, w = img.shape[:2]
        res = predictor(img, task="detection",
                        test_categories=rec["class_names"],
                        score_thresh=args.score_thresh)
        inst = res["instances"]
        print(f"\n=== {os.path.basename(rec['file_name'])} ({h}x{w}) "
              f"{len(inst['scores'])} preds above {args.score_thresh} ===")
        print("scores:", np.round(np.asarray(inst["scores"])[:10], 3))
        areas = [int(m.sum()) for m in inst["masks"][:10]]
        print("pred mask areas:", areas)
        print("pred boxes:", np.round(np.asarray(inst["boxes"])[:5], 1))
        gts = []
        for ann in rec.get("annotations", []):
            gt = decode_segmentation(ann, h, w) \
                if ann.get("segmentation") is None or \
                isinstance(ann["segmentation"], dict) else ann["segmentation"]
            gts.append((ann.get("category_id"), np.asarray(gt, bool),
                        np.asarray(ann["bbox"], np.float64)))
        if not gts and rec.get("pan_seg_file"):
            from PIL import Image
            rgb = np.asarray(Image.open(rec["pan_seg_file"]), np.int64)
            ids = rgb[..., 0] + rgb[..., 1] * 256 + rgb[..., 2] * 256 ** 2
            for seg in rec["pan_segments"]:
                m = ids == seg["id"]
                ys, xs = np.nonzero(m)
                bx = (np.array([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                                ys.max() - ys.min() + 1], np.float64)
                      if len(xs) else np.zeros(4))
                tag = "thing" if seg.get("isthing", True) else "stuff"
                gts.append((f"{seg['category_id']}/{tag}", m, bx))
        for k, (cat, gt, bx) in enumerate(gts[:10]):
            best_iou, best_j = 0.0, -1
            for j, m in enumerate(inst["masks"]):
                inter = np.logical_and(m, gt).sum()
                union = np.logical_or(m, gt).sum()
                iou = inter / max(union, 1)
                if iou > best_iou:
                    best_iou, best_j = iou, j
            print(f"gt[{k}] cat={cat} area={int(gt.sum())} "
                  f"box={bx.round(1)} -> best mask IoU {best_iou:.3f} "
                  f"(pred #{best_j})")
        if res.get("panoptic_seg") is not None:
            pano, segs = res["panoptic_seg"]
            print(f"panoptic: {len(segs)} segments, "
                  f"ids: {np.unique(np.asarray(pano))[:10]}")


if __name__ == "__main__":
    main()
