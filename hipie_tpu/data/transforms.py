"""Host-side image/annotation transforms (numpy + cv2).

Behavioral parity target: reference detectron2 transforms as configured by
hipie/data/coco_dataset_mapper_uni.py build_transform_gen (:133-167):
  * test: ResizeShortestEdge(min_size_test, max_size_test).
  * train: ResizeShortestEdge(multi-scale) + RandomFlip, or LSJ = ResizeScale
    (0.1..2.0) + FixedSizeCrop(1024) (:239-243).
  * horizontal flip also swaps left/right words in referring expressions
    (:342-354).

Outputs feed the static-shape device pipeline: images padded to a fixed bucket,
masks downsampled to mask_out_stride with the CondInst center-offset rule
(deformable_detr.py get_target_masks :725-737).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _resize_image(img: np.ndarray, h: int, w: int) -> np.ndarray:
    import cv2

    interp = cv2.INTER_LINEAR
    return cv2.resize(img, (w, h), interpolation=interp)


def resize_shortest_edge(img: np.ndarray, short: int, max_size: int):
    """Returns (resized_img, scale (sy, sx))."""
    h, w = img.shape[:2]
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    return _resize_image(img, nh, nw), (nh / h, nw / w)


def random_resize_scale(rng: np.random.RandomState, img: np.ndarray,
                        min_scale: float, max_scale: float, target: int):
    """detectron2 ResizeScale: random scale of the target size, keep aspect."""
    s = rng.uniform(min_scale, max_scale)
    h, w = img.shape[:2]
    out_scale = min(s * target / h, s * target / w)
    nh, nw = int(h * out_scale), int(w * out_scale)
    return _resize_image(img, max(nh, 1), max(nw, 1)), (nh / h, nw / w)


def fixed_size_crop(rng: np.random.RandomState, img: np.ndarray, size: int,
                    boxes: Optional[np.ndarray] = None,
                    masks: Optional[np.ndarray] = None):
    """Random crop (or pad offset 0) to (size, size); crops annotations too."""
    h, w = img.shape[:2]
    y0 = rng.randint(0, max(h - size, 0) + 1)
    x0 = rng.randint(0, max(w - size, 0) + 1)
    img_c = img[y0:y0 + size, x0:x0 + size]
    out_boxes = boxes            # empty arrays pass through unchanged
    if boxes is not None and len(boxes):
        out_boxes = boxes.copy()
        out_boxes[:, [0, 2]] -= x0
        out_boxes[:, [1, 3]] -= y0
        out_boxes = np.clip(out_boxes, 0, [img_c.shape[1], img_c.shape[0]] * 2)
    out_masks = masks
    if masks is not None and len(masks):
        out_masks = masks[:, y0:y0 + size, x0:x0 + size]
    return img_c, out_boxes, out_masks, (y0, x0)


def hflip(img: np.ndarray, boxes: Optional[np.ndarray] = None,
          masks: Optional[np.ndarray] = None):
    w = img.shape[1]
    img = np.ascontiguousarray(img[:, ::-1])
    if boxes is not None and len(boxes):
        boxes = boxes.copy()
        x0 = boxes[:, 0].copy()
        boxes[:, 0] = w - boxes[:, 2]
        boxes[:, 2] = w - x0
    if masks is not None and len(masks):
        masks = np.ascontiguousarray(masks[:, :, ::-1])
    return img, boxes, masks


def flip_expression(expr: str) -> str:
    """left <-> right swap for flipped referring expressions
    (coco_dataset_mapper_uni.py:342-354)."""
    expr = expr.replace("left", "@").replace("right", "left").replace("@", "right")
    return expr


def pad_to_bucket(img: np.ndarray, bucket_hw: Tuple[int, int]):
    """Pad bottom/right to a static bucket; returns (padded, pad_mask)."""
    h, w = img.shape[:2]
    bh, bw = bucket_hw
    assert h <= bh and w <= bw, f"image {h}x{w} exceeds bucket {bh}x{bw}"
    out = np.zeros((bh, bw) + img.shape[2:], img.dtype)
    out[:h, :w] = img
    mask = np.ones((bh, bw), bool)
    mask[:h, :w] = False
    return out, mask


def size_buckets(h: int, w: int, divisibility: int = 32,
                 buckets: Optional[Sequence[Tuple[int, int]]] = None):
    """Pick the smallest bucket that fits (h, w); default rounds to /32.

    Static buckets bound XLA recompilation: one program per bucket instead of
    one per image shape (the TPU answer to detectron2's ImageList padding).
    """
    if buckets:
        for bh, bw in buckets:
            if h <= bh and w <= bw:
                return bh, bw
        return buckets[-1]
    d = divisibility
    return ((h + d - 1) // d * d, (w + d - 1) // d * d)


def downsample_mask_condinst(masks: np.ndarray, stride: int) -> np.ndarray:
    """GT mask downsampling: pick pixels at stride//2 offset (get_target_masks)."""
    if stride == 1:
        return masks
    s = stride // 2
    return masks[:, s::stride, s::stride]
