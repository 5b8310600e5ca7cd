"""On-device matchers: simOTA dynamic-k and auction-based Hungarian assignment.

Behavioral parity targets:
  * HungarianMatcherVL.forward_ota / dynamic_k_matching — reference
    hipie/models/deformable_detr/matcher.py:102-260: center-prior candidate mask
    (in-box OR in-2.5/32-radius), cost = token-focal-mean + 3*(-GIoU) +
    100*(not in-box-and-center) + 10000*(not candidate), per-GT dynamic top-k by
    summed top-10 IoU, conflict resolution by min cost, repair loop so every GT
    gets a query.
  * HungarianMatcherVL.forward / HungarianMatcherBG (matcher.py:317+,
    matcher_mask.py:70-200): focal class cost vs positive map, L1, GIoU
    [, point-sampled mask focal + dice costs for the Mask2Former-style bg
    matcher], solved by linear assignment.

TPU redesign: everything is fixed shape (N_max padded GTs, validity masks) and
fully on device — no scipy host sync (the reference syncs to CPU 6x per step,
SURVEY.md §3.1). Exact Hungarian is replaced by a forward-auction algorithm with
eps-scaling, which is optimal within n*eps and, in our tests, matches
scipy.optimize.linear_sum_assignment's cost on DETR-scale matrices to <0.1%.

Assignment representation: `assign` (Q,) int32 with the matched GT index or -1 —
a static-shape replacement for the reference's per-image index tuple lists.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hipie_tpu.ops.box_ops import box_cxcywh_to_xyxy, box_iou, generalized_box_iou

BIG = 1e5


def focal_token_cost(prob: jnp.ndarray, positive_map: jnp.ndarray,
                     alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """(Q, L) sigmoid probs x (N, L) normalized positive maps -> (Q, N) class cost.

    The reference takes the MEAN over each GT's positive tokens of
    pos_cost - neg_cost (matcher.py:380-385); with row-normalized positive-map
    weights this is exactly a matmul.
    """
    p = jnp.clip(prob.astype(jnp.float32), 1e-8, 1 - 1e-8)
    neg = (1 - alpha) * (p ** gamma) * (-jnp.log(1 - p))
    pos = alpha * ((1 - p) ** gamma) * (-jnp.log(p))
    return (pos - neg) @ positive_map.astype(jnp.float32).T


def in_boxes_info(pred_boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                  expanded_strides: int = 32, center_radius: float = 2.5):
    """Center-prior candidate masks (matcher.py get_in_boxes_info)."""
    gt_xyxy = box_cxcywh_to_xyxy(gt_boxes)
    cx = pred_boxes[:, 0:1]
    cy = pred_boxes[:, 1:2]
    in_box = ((cx > gt_xyxy[None, :, 0]) & (cx < gt_xyxy[None, :, 2])
              & (cy > gt_xyxy[None, :, 1]) & (cy < gt_xyxy[None, :, 3]))
    r = center_radius / expanded_strides
    in_center = ((cx > gt_boxes[None, :, 0] - r) & (cx < gt_boxes[None, :, 0] + r)
                 & (cy > gt_boxes[None, :, 1] - r) & (cy < gt_boxes[None, :, 1] + r))
    candidate = jnp.any(in_box, 1) | jnp.any(in_center, 1)     # (Q,)
    return candidate, in_box & in_center


def simota_match(
    prob: jnp.ndarray,           # (Q, L) sigmoid token probs
    pred_boxes: jnp.ndarray,     # (Q, 4) cxcywh
    gt_boxes: jnp.ndarray,       # (N, 4) cxcywh (padded)
    positive_map: jnp.ndarray,   # (N, L)
    gt_valid: jnp.ndarray,       # (N,) bool
    topk_candidates: int = 10,
) -> jnp.ndarray:
    """simOTA dynamic-k matching -> (Q,) assigned GT index or -1."""
    q, n = prob.shape[0], gt_boxes.shape[0]
    f32 = jnp.float32
    candidate, in_both = in_boxes_info(pred_boxes, gt_boxes)
    ious, _ = box_iou(box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(gt_boxes))
    cost_class = focal_token_cost(prob, positive_map)
    cost_giou = -generalized_box_iou(box_cxcywh_to_xyxy(pred_boxes),
                                     box_cxcywh_to_xyxy(gt_boxes))
    cost = cost_class + 3.0 * cost_giou + 100.0 * (~in_both).astype(f32)
    cost = cost + jnp.where(candidate[:, None], 0.0, 10000.0)
    cost = jnp.where(gt_valid[None, :], cost, BIG * 10)

    # dynamic-k: per GT, k = clamp(int(sum of top-10 IoUs), 1).
    k_cand = min(q, topk_candidates)
    top_ious, _ = jax.lax.top_k(ious.T, k_cand)                 # (N, k)
    dynamic_ks = jnp.clip(jnp.sum(top_ious, -1).astype(jnp.int32), 1, None)

    # match matrix: query q matched to gt n iff rank of cost among column n < k_n.
    order = jnp.argsort(cost, axis=0)                           # (Q, N)
    ranks = jnp.zeros((q, n), jnp.int32)
    ranks = ranks.at[order, jnp.arange(n)[None, :]].set(
        jnp.broadcast_to(jnp.arange(q)[:, None], (q, n)))
    match = (ranks < dynamic_ks[None, :]) & gt_valid[None, :]

    # conflict resolution: a query matched to >1 GTs keeps only its min-cost GT.
    num_m = match.sum(1)
    best_gt = jnp.argmin(jnp.where(match, cost, BIG * 100), axis=1)
    match = jnp.where(
        (num_m > 1)[:, None],
        jax.nn.one_hot(best_gt, n, dtype=bool) & match, match)

    # repair loop: every valid GT must own >= 1 query; give orphaned GTs their
    # min-cost UNMATCHED query, then re-resolve conflicts; bounded iterations.
    def cond(state):
        match, it = state
        unmatched = gt_valid & (match.sum(0) == 0)
        return jnp.any(unmatched) & (it < n)

    def body(state):
        match, it = state
        q_matched = match.sum(1) > 0
        cost_r = cost + jnp.where(q_matched[:, None], 100000.0, 0.0)
        unmatched_gt = gt_valid & (match.sum(0) == 0)
        pick = jnp.argmin(cost_r, axis=0)                       # (N,) best query per gt
        add = jax.nn.one_hot(pick, q, dtype=bool).T & unmatched_gt[None, :]
        match2 = match | add
        num_m2 = match2.sum(1)
        best2 = jnp.argmin(jnp.where(match2, cost, BIG * 100), axis=1)
        match2 = jnp.where((num_m2 > 1)[:, None],
                           jax.nn.one_hot(best2, n, dtype=bool) & match2, match2)
        return match2, it + 1

    match, _ = jax.lax.while_loop(cond, body, (match, jnp.int32(0)))
    assigned = match.sum(1) > 0
    gt_idx = jnp.argmax(match, axis=1)
    return jnp.where(assigned, gt_idx, -1).astype(jnp.int32)


def auction_assignment(cost: jnp.ndarray, gt_valid: jnp.ndarray,
                       eps: float = 1e-3, max_iters: int = 2000) -> jnp.ndarray:
    """1-1 assignment minimizing cost via forward auction -> (Q,) gt idx or -1.

    cost: (Q, N); each valid GT column ends up owning exactly one query row.
    """
    qn, n = cost.shape
    value = -cost.astype(jnp.float32)                # maximize value
    value = jnp.where(gt_valid[None, :], value, -BIG)
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.where(gt_valid[None, :], cost, 0.0))), 1.0)
    eps_val = eps * scale

    # state: prices (Q,), owner (Q,) gt idx or -1, assigned_gt (N,) bool
    def cond(state):
        prices, owner, assigned, it = state
        return jnp.any(gt_valid & ~assigned) & (it < max_iters)

    def body(state):
        # NOTE: every step of this body is max/argmax/one-hot arithmetic — no
        # sort, no scatter. The body runs inside a (often vmapped) while_loop,
        # where a per-iteration sort or scatter would dominate (measured: the
        # sort-based body cost ~55 ms per (300, 100) auction on v5e).
        prices, owner, assigned, it = state
        # every unassigned valid gt bids simultaneously for its best query.
        net = value.T - prices[None, :]              # (N, Q)
        best_q = jnp.argmax(net, axis=1)             # (N,)
        top1 = jnp.max(net, axis=1)
        is_best = jax.nn.one_hot(best_q, qn, dtype=bool)        # (N, Q)
        top2 = jnp.max(jnp.where(is_best, -jnp.inf, net), axis=1)
        bid = top1 - jnp.where(qn > 1, top2, 0.0) + eps_val
        bidding = gt_valid & ~assigned
        # highest bid per query wins (resolve simultaneous bids by max increment).
        bid_matrix = jnp.where(is_best & bidding[:, None], bid[:, None],
                               -jnp.inf)             # (N, Q)
        win_bid = jnp.max(bid_matrix, axis=0)        # (Q,)
        win_gt = jnp.argmax(bid_matrix, axis=0)
        got_bid = jnp.isfinite(win_bid) & (win_bid > -jnp.inf)
        # displaced gts become unassigned.
        displaced = owner
        new_owner = jnp.where(got_bid, win_gt.astype(jnp.int32), owner)
        newly = jnp.any(jax.nn.one_hot(win_gt, n, dtype=bool)
                        & got_bid[:, None], axis=0)             # (N,)
        was_displaced = got_bid & (displaced >= 0) & (displaced != new_owner)
        freed = jnp.any(jax.nn.one_hot(displaced, n, dtype=bool)
                        & was_displaced[:, None], axis=0)       # (N,)
        assigned = (assigned | newly) & ~(freed & ~newly)
        prices = jnp.where(got_bid, prices + win_bid, prices)
        return prices, new_owner, assigned, it + 1

    prices0 = jnp.zeros(qn, jnp.float32)
    owner0 = jnp.full(qn, -1, jnp.int32)
    assigned0 = jnp.zeros(n, bool)
    _, owner, _, _ = jax.lax.while_loop(cond, body, (prices0, owner0, assigned0, 0))
    return owner


def hungarian_vl_costs(
    prob: jnp.ndarray, pred_boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray, positive_map: jnp.ndarray,
    cost_class: float = 2.0, cost_bbox: float = 5.0, cost_giou: float = 2.0,
    mask_cost: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """HungarianMatcherVL cost matrix (Q, N) (matcher.py:317+ costs only)."""
    c = cost_class * focal_token_cost(prob, positive_map)
    c = c + cost_bbox * jnp.sum(
        jnp.abs(pred_boxes[:, None, :] - gt_boxes[None, :, :]), axis=-1)
    c = c - cost_giou * generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(gt_boxes))
    if mask_cost is not None:
        c = c + mask_cost
    return c


def hungarian_vl_match(
    prob: jnp.ndarray, pred_boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray, positive_map: jnp.ndarray, gt_valid: jnp.ndarray,
    cost_class: float = 2.0, cost_bbox: float = 5.0, cost_giou: float = 2.0,
    mask_cost: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """HungarianMatcherVL costs + auction solve -> (Q,) gt idx or -1."""
    c = hungarian_vl_costs(prob, pred_boxes, gt_boxes, positive_map,
                           cost_class, cost_bbox, cost_giou, mask_cost)
    return auction_assignment(c, gt_valid)


def mask_match_costs(
    rng: jax.Array,
    mask_logits: jnp.ndarray,      # (Q, H, W)
    gt_masks: jnp.ndarray,         # (N, H, W) float 0/1
    num_points: int = 12544,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> jnp.ndarray:
    """Point-sampled sigmoid-CE + dice matching costs (matcher_mask.py:70-200)."""
    from hipie_tpu.losses.point_features import point_sample

    coords = jax.random.uniform(rng, (num_points, 2))
    mp = point_sample(mask_logits, jnp.broadcast_to(
        coords[None], (mask_logits.shape[0],) + coords.shape)).astype(jnp.float32)
    tp = point_sample(gt_masks, jnp.broadcast_to(
        coords[None], (gt_masks.shape[0],) + coords.shape)).astype(jnp.float32)
    # batched sigmoid CE cost: pos part + neg part (Mask2Former formulation).
    pos = jax.nn.softplus(-mp)                        # -log sigmoid(mp)
    neg = jax.nn.softplus(mp)                         # -log(1 - sigmoid(mp))
    ce = (pos @ tp.T + neg @ (1 - tp).T) / num_points
    m = jax.nn.sigmoid(mp)
    numer = 2 * (m @ tp.T)
    denom = m.sum(-1)[:, None] + tp.sum(-1)[None, :]
    dice = 1 - (numer + 1) / (denom + 1)
    return cost_mask * ce + cost_dice * dice


def mask_match_costs_embed(
    rng: jax.Array,
    mask_embeds: jnp.ndarray,      # (Q, C) mask-embedding rows
    pixel_feats: jnp.ndarray,      # (H, W, C) shared mask-feature map
    gt_masks: jnp.ndarray,         # (N, H', W') float 0/1
    num_points: int = 12544,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> jnp.ndarray:
    """mask_match_costs for LINEAR mask heads (MaskDINO: mask = emb . F).

    point_sample is linear, so sampling the feature map once and contracting
    with the embeddings gives the same point logits as materializing the dense
    (Q, H, W) masks and sampling them — without the Q x H x W intermediate
    (matcher_mask.py:70-200 semantics preserved to float-reassociation)."""
    from hipie_tpu.losses.point_features import point_sample

    coords = jax.random.uniform(rng, (num_points, 2))
    fc = jnp.moveaxis(pixel_feats.astype(jnp.float32), -1, 0)   # (C, H, W)
    fp = point_sample(fc, jnp.broadcast_to(
        coords[None], (fc.shape[0],) + coords.shape))           # (C, P)
    mp = mask_embeds.astype(jnp.float32) @ fp                   # (Q, P)
    tp = point_sample(gt_masks, jnp.broadcast_to(
        coords[None], (gt_masks.shape[0],) + coords.shape)).astype(jnp.float32)
    pos = jax.nn.softplus(-mp)
    neg = jax.nn.softplus(mp)
    ce = (pos @ tp.T + neg @ (1 - tp).T) / num_points
    m = jax.nn.sigmoid(mp)
    numer = 2 * (m @ tp.T)
    denom = m.sum(-1)[:, None] + tp.sum(-1)[None, :]
    dice = 1 - (numer + 1) / (denom + 1)
    return cost_mask * ce + cost_dice * dice
