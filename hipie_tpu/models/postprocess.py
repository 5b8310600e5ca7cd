"""TPU-native inference post-processing: token->class pooling, score fusion, NMS,
top-k instance selection, semantic & panoptic fusion — all static-shape device code.

Behavioral parity target: reference hipie/hipie_img.py:537-878 (inference,
semantic_inference, panoptic_inference, instance_inference) and
convert_grounding_to_od_logits (:1025-1053). Key redesigns for TPU:

  * token->class pooling: the per-class python loop over a {label: token list} dict
    becomes a dense (C, L) positive-map weight matrix -> one matmul (mean pooling)
    or a masked max (TEST.MAX_POOL). Thing/stuff masking (the reference's -9999
    fills) becomes a vectorized where.
  * batched NMS keeps a boolean mask; "filter then topk" becomes "mask to -inf
    then topk" over a fixed (Q, C) score matrix.
  * panoptic fusion: the reference's sequential query loop with stuff-memory dict
    (:473-536) is vectorized: prob-mask argmax, per-query areas via one-hot sums,
    overlap test, first-valid-stuff-per-class primary assignment, cumsum segment
    ids, and a (Q+1) lookup relabel. Exactly reproduces the reference's segment
    numbering because ids are assigned in ascending query order there too.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hipie_tpu.ops.box_ops import box_cxcywh_to_xyxy
from hipie_tpu.ops.nms import nms_keep_mask

NEG_INF = -9999.0


class ClassMaps(NamedTuple):
    """Dense per-dataset class/token layout, built on host from the label set."""

    mean_weights: jnp.ndarray    # (C, L) rows sum to 1 over the class's tokens
    token_mask: jnp.ndarray      # (C, L) bool, True where token belongs to class
    is_thing: jnp.ndarray        # (C,) bool


def grounding_to_od_logits(
    logits: jnp.ndarray,          # (Q, L) raw token logits
    maps: ClassMaps,
    mode: Optional[str] = None,   # None | 'FG' | 'BG'
    max_pool: bool = False,
) -> jnp.ndarray:
    """(Q, L) token logits -> (Q, C) class logits. Masked classes get -9999."""
    logits = logits.astype(jnp.float32)
    if logits.shape[-1] == 1:
        # grounding: the pooled-text head already emits one "class" logit
        # (reference positive_map_label_to_token = {1: [0]}, hipie_img.py:323).
        return logits

    has_tokens = jnp.any(maps.token_mask, axis=-1)          # (C,)
    if max_pool:
        masked = jnp.where(maps.token_mask[None], logits[:, None, :],
                           jnp.finfo(jnp.float32).min)
        scores = jnp.max(masked, axis=-1)
    else:
        scores = logits @ maps.mean_weights.T
        # classes whose prompt tokens fell past max_text_len truncation have
        # all-zero weight rows; a zero dot product would score sigmoid(0)=0.5
        # and outrank real classes — the reference fills such classes with
        # -9999 (convert_grounding_to_od_logits, hipie_img.py:1025).
        scores = jnp.where(has_tokens[None], scores, NEG_INF)
    if mode == "FG":
        scores = jnp.where(maps.is_thing[None], scores, NEG_INF)
    elif mode == "BG":
        scores = jnp.where(maps.is_thing[None], NEG_INF, scores)
    return scores


class InstanceOutput(NamedTuple):
    scores: jnp.ndarray      # (K,)
    classes: jnp.ndarray     # (K,) int32
    boxes: jnp.ndarray       # (K, 4) xyxy, normalized [0, 1]
    mask_logits: jnp.ndarray # (K, H4, W4) stride-4 logits
    keep_fg: jnp.ndarray     # (Q,) bool — NMS survivors among fg queries


def fg_instance_inference(
    token_logits: jnp.ndarray,    # (Q, L) fg query token logits
    boxes_cxcywh: jnp.ndarray,    # (Q, 4) normalized
    mask_logits: jnp.ndarray,     # (Q, H4, W4)
    iou_logits: Optional[jnp.ndarray],  # (Q, 1) or None
    maps: ClassMaps,
    max_detections: int = 100,
    nms_thresh: float = 0.7,
    has_thing: bool = True,
    max_pool: bool = False,
    use_ota_nms: bool = True,
    clip_prob: Optional[jnp.ndarray] = None,   # (Q, C) CLIP-ensembled prob override
) -> InstanceOutput:
    """Reference inference() fg path (hipie_img.py:582-700), one image."""
    cls_logits = grounding_to_od_logits(
        token_logits, maps, mode="FG" if has_thing else None, max_pool=max_pool)
    if clip_prob is not None:
        # CLIP-fused probabilities already include the iou mix with the
        # FG_IOU_A/B exponents (postprocess_clip.fuse_fg_probs; reference
        # hipie_img.py:607-608) — do not re-apply it here.
        prob = clip_prob
    else:
        prob = jax.nn.sigmoid(cls_logits)
        if iou_logits is not None:
            prob = jnp.sqrt(prob * jax.nn.sigmoid(iou_logits.astype(jnp.float32)))

    boxes_xyxy = box_cxcywh_to_xyxy(boxes_cxcywh.astype(jnp.float32))
    if use_ota_nms:
        nms_scores = jnp.max(prob, axis=1)
        nms_cls = jnp.argmax(prob, axis=1)
        keep = nms_keep_mask(boxes_xyxy, nms_scores, nms_cls, nms_thresh)
    else:
        keep = jnp.ones(prob.shape[0], bool)

    flat = jnp.where(keep[:, None], prob, -jnp.inf).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, max_detections)
    c = prob.shape[1]
    q_idx = top_idx // c
    cls_idx = (top_idx % c).astype(jnp.int32)
    return InstanceOutput(
        scores=top_scores,
        classes=cls_idx,
        boxes=boxes_xyxy[q_idx],
        mask_logits=mask_logits[q_idx].astype(jnp.float32),
        keep_fg=keep,
    )


def semantic_inference(mask_cls_prob: jnp.ndarray, mask_logits: jnp.ndarray):
    """(N, C) prob x sigmoid((N, h, w)) -> (C, h, w). reference :870-878."""
    return jnp.einsum("qc,qhw->chw", mask_cls_prob.astype(jnp.float32),
                      jax.nn.sigmoid(mask_logits.astype(jnp.float32)))


class PanopticOutput(NamedTuple):
    panoptic_seg: jnp.ndarray    # (h, w) int32 segment ids, 0 = void
    segment_valid: jnp.ndarray   # (N,) bool — query opened a NEW segment
    segment_ids: jnp.ndarray     # (N,) int32 id assigned to each query (0 = none)
    segment_classes: jnp.ndarray # (N,) int32
    segment_isthing: jnp.ndarray # (N,) bool


def panoptic_inference(
    mask_cls_prob: jnp.ndarray,   # (N, C) transformed class probabilities
    mask_logits: jnp.ndarray,     # (N, h, w)
    is_thing: jnp.ndarray,        # (C,) bool
    object_mask_threshold: float = 0.25,
    overlap_threshold: float = 0.8,
    pad_mask: Optional[jnp.ndarray] = None,   # (h, w) True = padded canvas
) -> PanopticOutput:
    """Vectorized version of reference panoptic_inference (hipie_img.py:473-536)."""
    n = mask_cls_prob.shape[0]
    f32 = jnp.float32
    scores = jnp.max(mask_cls_prob, axis=-1).astype(f32)
    labels = jnp.argmax(mask_cls_prob, axis=-1).astype(jnp.int32)
    probs = jax.nn.sigmoid(mask_logits.astype(f32))
    keep = scores > object_mask_threshold

    prob_masks = jnp.where(keep[:, None, None], scores[:, None, None] * probs, -1.0)
    mask_ids = jnp.argmax(prob_masks, axis=0)                      # (h, w)
    binary = probs >= 0.5

    one_hot = jax.nn.one_hot(mask_ids, n, dtype=f32, axis=0)       # (N, h, w)
    if pad_mask is not None:
        # padded-canvas pixels all tie at prob 0 and argmax awards them to the
        # first kept query, inflating its mask_area and corrupting the overlap
        # test (the reference operates on the unpadded image).
        one_hot = jnp.where(pad_mask[None], 0.0, one_hot)
    mask_area = jnp.sum(one_hot, axis=(1, 2))
    original_area = jnp.sum(binary.astype(f32), axis=(1, 2))
    final_area = jnp.sum(one_hot * binary.astype(f32), axis=(1, 2))
    valid = (keep & (mask_area > 0) & (original_area > 0) & (final_area > 0)
             & (mask_area / jnp.clip(original_area, 1.0) >= overlap_threshold))

    query_isthing = is_thing[labels]
    # first valid stuff query per class becomes the class's primary segment.
    order = jnp.arange(n)
    stuff_valid = valid & ~query_isthing
    big = jnp.int32(n)
    first_stuff = jnp.full((mask_cls_prob.shape[1],), big, jnp.int32)
    first_stuff = first_stuff.at[jnp.where(stuff_valid, labels, 0)].min(
        jnp.where(stuff_valid, order, big))
    primary = stuff_valid & (first_stuff[labels] == order)
    new_segment = valid & (query_isthing | primary)
    seg_ids_new = jnp.cumsum(new_segment.astype(jnp.int32))        # id at query k
    seg_id_per_query = jnp.where(new_segment, seg_ids_new, 0)
    # merged stuff queries inherit their primary's id.
    primary_ids = jnp.zeros(mask_cls_prob.shape[1], jnp.int32).at[
        jnp.where(primary, labels, 0)].max(jnp.where(primary, seg_id_per_query, 0))
    merged = stuff_valid & ~primary
    seg_id_per_query = jnp.where(merged, primary_ids[labels], seg_id_per_query)

    binary_at_pixel = jnp.take_along_axis(binary, mask_ids[None], axis=0)[0]
    panoptic = jnp.where(binary_at_pixel, seg_id_per_query[mask_ids], 0)
    return PanopticOutput(
        panoptic_seg=panoptic.astype(jnp.int32),
        segment_valid=new_segment,
        segment_ids=seg_id_per_query,
        segment_classes=labels,
        segment_isthing=query_isthing,
    )


def transform_probs(cls_logits: jnp.ndarray, temperature: float = 0.06,
                    transform_eval: bool = True) -> jnp.ndarray:
    """sigmoid [-> softmax(sigmoid/T)] score transform (reference :595-596,728-733)."""
    p = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    if transform_eval and cls_logits.shape[-1] > 1:
        p = jax.nn.softmax(p / temperature, axis=-1)
    return p



