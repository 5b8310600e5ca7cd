"""Fixed-shape on-device NMS.

Replaces torchvision `ops.batched_nms` used at reference hipie_img.py:629. The
reference's exact semantics: greedy suppression in descending score order, boxes of
different class ids never suppress each other, IoU threshold 0.7.

TPU-first: a `lax.scan` over score-sorted boxes with a running suppression mask —
N sequential steps of O(N) vector work, fully on device, static shapes. Returns a
keep mask instead of a dynamic index list; downstream top-k treats suppressed rows
as score -inf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hipie_tpu.ops.box_ops import box_iou


def nms_keep_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                  class_ids: jnp.ndarray | None, iou_threshold: float) -> jnp.ndarray:
    """Exact greedy NMS. boxes (N, 4) xyxy, scores (N,), class_ids (N,) or None.

    Returns (N,) bool keep mask (True = survives).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    iou, _ = box_iou(boxes_s, boxes_s)                 # (N, N)
    if class_ids is not None:
        cls_s = class_ids[order]
        same_cls = cls_s[:, None] == cls_s[None, :]
        iou = jnp.where(same_cls, iou, 0.0)

    def body(suppressed, i):
        # box i survives iff not suppressed by any earlier surviving box.
        keep_i = ~suppressed[i]
        row = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & keep_i
        return suppressed | row, keep_i

    suppressed, keep_sorted = jax.lax.scan(body, jnp.zeros(n, bool), jnp.arange(n))
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep
