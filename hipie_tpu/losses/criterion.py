"""HIPIE training criterion: token-focal classification, box, IoU-head and
point-sampled mask losses with per-layer deep supervision and DN supervision.

Behavioral parity target: reference
hipie/models/deformable_detr/deformable_detr.py SetCriterion (:311-738) /
DINOCriterion (:740-855) and the fg/bg/gt criterion passes orchestrated in
ddetrs_dn.py coco_forward (:365-748):
  * loss_ce: token-level sigmoid focal loss vs positive maps over valid text
    tokens, / num_boxes (:353-380, segmentation.py:120).
  * loss_boxes: L1 + GIoU on matched pairs, masked/renormalized by is_thing
    (stuff boxes don't contribute), plus IoU-head BCE against the detached
    pairwise IoU (:397-450).
  * loss_masks: point-sampled (112^2 points, x3 uncertainty oversampling,
    importance 0.75) sigmoid focal + dice on matched masks (:452-524).
  * fg pass matched by simOTA (num_boxes = number of matched queries), bg pass
    by Hungarian-with-mask-costs, dn/gt pass by fixed CDN indices; final loss is
    a weighted merge (merge_dict :233, weights FINAL_FG/BG/GT_WEIGHT).

TPU redesign: targets are padded to a static N_max with validity masks;
assignments are (B, Q) gt-index-or-minus-one arrays; matched-query mask
prediction uses a fixed top-K selection so every shape is static. Everything is
vmapped over the batch — no per-image python loops, no host syncs.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hipie_tpu.config import LossConfig
from hipie_tpu.losses.matcher import (
    auction_assignment,
    hungarian_vl_costs,
    hungarian_vl_match,
    mask_match_costs,
    mask_match_costs_embed,
    simota_match,
)
from hipie_tpu.losses.point_features import point_sample, uncertain_point_coords
from hipie_tpu.models.mask_head import dynamic_mask_with_coords
from hipie_tpu.ops.box_ops import (
    box_cxcywh_to_xyxy,
    elementwise_box_iou,
    elementwise_generalized_box_iou,
    generalized_box_iou,
)


class Targets(NamedTuple):
    """Padded per-batch ground truth (static N_max)."""

    labels: jnp.ndarray        # (B, N) int32
    boxes: jnp.ndarray         # (B, N, 4) cxcywh normalized
    masks: jnp.ndarray         # (B, N, Hm, Wm) float 0/1 at mask_out_stride
    positive_map: jnp.ndarray  # (B, N, L)
    is_thing: jnp.ndarray      # (B, N) bool
    valid: jnp.ndarray         # (B, N) bool


def gather_targets(t: Targets, assign: jnp.ndarray):
    """Per-query matched GT fields; assign (B, Q) -> masks of validity."""
    idx = jnp.clip(assign, 0, t.boxes.shape[1] - 1)
    matched = assign >= 0
    take = lambda x: jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)
    return matched, take(t.boxes), take(t.positive_map), \
        jnp.take_along_axis(t.is_thing, idx, axis=1), idx


def loss_labels_vl(logits, assign, targets: Targets, text_mask, num_boxes,
                   alpha=0.25, gamma=2.0):
    """Token sigmoid focal loss vs positive maps (reference loss_labelsVL).

    The focal TARGET is the BINARY token map: the reference binarizes the
    per-instance positive map before it reaches the criterion
    (coco_dataset_mapper_uni.py:395 `anno["positive_map"].bool()`, filled into
    target_classes_onehot at deformable_detr.py:370-376). Targets.positive_map
    carries the row-NORMALIZED map (which the matcher's token-mean class cost
    needs, matcher.py:397 `.mean(-1)`); training against the normalized map
    instead is a real failure mode — focal loss vs soft 1/n_tokens targets is
    minimized by a flat p=1/n on EVERY class's tokens, which froze toy-scale
    eval at class-independent scores (TRAINLOG.md round 4)."""
    b, q, L = logits.shape
    matched, _, pos_map, _, _ = gather_targets(targets, assign)
    tgt = jnp.where(matched[..., None], (pos_map > 0), False).astype(jnp.float32)
    x = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0) - x * tgt + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * tgt + (1 - p) * (1 - tgt)
    loss = ce * ((1 - p_t) ** gamma)
    a_t = alpha * tgt + (1 - alpha) * (1 - tgt)
    loss = a_t * loss
    loss = loss * (text_mask[:, None, :] > 0)
    return loss.sum() / jnp.clip(num_boxes, 1.0)


def loss_boxes(boxes, iou_logits, assign, targets: Targets, num_boxes,
               panoptic_box_loss=True):
    matched, gt_boxes, _, is_thing, _ = gather_targets(targets, assign)
    m = matched.astype(jnp.float32)
    thing = is_thing.astype(jnp.float32) if panoptic_box_loss else jnp.ones_like(m)
    thing = thing * m
    n_pairs = m.sum()
    adj = n_pairs / jnp.clip(thing.sum(), 1e-6)

    src = boxes.astype(jnp.float32)
    tgt = gt_boxes.astype(jnp.float32)
    b, q = m.shape
    l1 = jnp.abs(src - tgt).sum(-1) * thing * adj
    giou = elementwise_generalized_box_iou(
        box_cxcywh_to_xyxy(src), box_cxcywh_to_xyxy(tgt))
    loss_giou = (1.0 - giou) * thing * adj
    out = {
        "loss_bbox": (l1 * m).sum() / jnp.clip(num_boxes, 1.0),
        "loss_giou": (loss_giou * m).sum() / jnp.clip(num_boxes, 1.0),
    }
    if iou_logits is not None:
        ious = jax.lax.stop_gradient(elementwise_box_iou(
            box_cxcywh_to_xyxy(src).reshape(b * q, 4),
            box_cxcywh_to_xyxy(tgt).reshape(b * q, 4)).reshape(b, q))
        logit = iou_logits[..., 0].astype(jnp.float32)
        bce = jnp.maximum(logit, 0) - logit * ious + jnp.log1p(jnp.exp(-jnp.abs(logit)))
        out["loss_boxiou"] = (bce * thing * adj * m).sum() / jnp.clip(n_pairs, 1.0)
    return out


def loss_masks_pointwise(rng, mask_logits, gt_masks, pair_valid, num_boxes,
                         cfg: LossConfig):
    """Point-sampled focal + dice on (B, K, H, W) matched masks.

    Pred and GT are sampled SEPARATELY (not as one stacked gather): the GT
    half carries no parameter gradient, so stacking it into the pred gather
    made the custom-VJP splat backward compute matmuls for cotangent rows
    that are identically zero — half the splat cost for nothing. GT samples
    through a stop-gradient bf16 table (0/1 values are exact in bf16); pred
    uses the fastgrad (bf16-operand splat) variant — the gradient is already
    a Monte-Carlo estimate over cfg.num_points random points."""
    b, k, h, w = mask_logits.shape
    ml = mask_logits.reshape(b * k, h, w).astype(jnp.float32)
    gm = gt_masks.reshape(b * k, *gt_masks.shape[2:])
    coords = uncertain_point_coords(
        rng, jax.lax.stop_gradient(ml), cfg.num_points, cfg.oversample_ratio,
        cfg.importance_sample_ratio, exact_topk=cfg.exact_topk)
    logits = point_sample(ml, coords, fastgrad=True)        # (BK, P)
    labels = jax.lax.stop_gradient(point_sample(
        gm.astype(jnp.bfloat16),
        jax.lax.stop_gradient(coords)))                     # (BK, P) f32
    v = pair_valid.reshape(b * k, 1).astype(jnp.float32)

    # sigmoid focal (alpha=0.25, gamma=2): mean over points, sum over instances,
    # / num_boxes (reference sigmoid_focal_loss_jit usage in loss_masks).
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * labels + (1 - p) * (1 - labels)
    a_t = 0.25 * labels + 0.75 * (1 - labels)
    focal_pt = a_t * ce * ((1 - p_t) ** 2)
    focal = (focal_pt.mean(-1) * v[:, 0]).sum() / jnp.clip(num_boxes, 1.0)

    numer = 2 * (p * labels * v).sum(-1)
    denom = (p * v).sum(-1) + (labels * v).sum(-1)
    dice = (1 - (numer + 1) / (denom + 1)) * v[:, 0]
    dice = dice.sum() / jnp.clip(num_boxes, 1.0)
    return {"loss_mask": focal, "loss_dice": dice}


def select_matched(assign: jnp.ndarray, k: int):
    """Pick up to k matched query slots per image (stable by query index).

    Returns (sel_q (B, k) int32, sel_valid (B, k) bool).
    """
    b, q = assign.shape
    matched = assign >= 0
    key = jnp.where(matched, jnp.arange(q)[None, :], q + jnp.arange(q)[None, :])
    order = jnp.argsort(key, axis=1)[:, :k]
    sel_valid = jnp.take_along_axis(matched, order, axis=1)
    return order.astype(jnp.int32), sel_valid


class CriterionPassOutput(NamedTuple):
    losses: Dict[str, jnp.ndarray]


def predict_matched_masks(
    sel_q, ctrl_params_layer, refs_layer, mask_feats, image_sizes,
    weight_nums, bias_nums, channels, rel_coord=True):
    """Dynamic-conv masks for the selected (B, K) query slots of one layer."""
    ctrl = jnp.take_along_axis(ctrl_params_layer, sel_q[..., None], axis=1)
    refs = jnp.take_along_axis(refs_layer[..., :2], sel_q[..., None], axis=1)
    scale = jnp.stack([image_sizes[:, 1], image_sizes[:, 0]], -1).astype(jnp.float32)
    ref_pix = refs * scale[:, None, :]
    return dynamic_mask_with_coords(
        mask_feats, ref_pix, ctrl, weight_nums, bias_nums, channels,
        mask_feat_stride=8, mask_out_stride=4, rel_coord=rel_coord)


def criterion_pass(
    rng: jax.Array,
    layer_outputs: Dict[str, jnp.ndarray],
    # each (layers, B, Qs, ...) pre-sliced for this pass:
    #   class (L, B, Q, Ltxt), boxes, iou or None, ctrl (L, B, Q, P), refs
    targets: Targets,
    text_mask: jnp.ndarray,
    mask_feats: jnp.ndarray,
    image_sizes: jnp.ndarray,
    cfg: LossConfig,
    weight_nums, bias_nums,
    dyn_channels: int = 8,
    matcher: str = "ota",                   # ota | hungarian | fixed
    fixed_assign: Optional[jnp.ndarray] = None,   # (B, Q) for dn/gt pass
    max_matched: int = 100,
    with_masks: bool = True,
    ota_normalize_by_matches: bool = True,
    pixel_feats: Optional[jnp.ndarray] = None,   # (B, H, W, C) for mask_embeds
) -> Dict[str, jnp.ndarray]:
    """One criterion pass (fg, bg or gt) over all decoder layers.

    The per-layer computation (matching + losses) is identical across layers, so
    it is lax.scan'ed over the stacked layer axis — the body compiles once
    regardless of decoder depth.

    Masks come in three forms: "ctrl"+"refs" (dynamic-conv CondInst head),
    "masks" (dense per-layer logits), or "mask_embeds" (L, B, Q, C) with
    `pixel_feats` — the linear MaskDINO head, where dense logits are built
    ONLY for the <= max_matched selected slots and matching costs are
    evaluated at the sampled points directly (exact: the head is linear, so
    sampling commutes with the embed contraction)."""
    classes = layer_outputs["classes"]
    # class logits may span fewer token channels than the padded text length:
    # grounding pools the language feature to ONE channel (reference
    # hipie_img.py:431, positive_map (1, 1)) — slice the padded positive map
    # and text mask down to the logits' channel count.
    t_cls = classes.shape[-1]
    if targets.positive_map.shape[-1] != t_cls:
        targets = targets._replace(
            positive_map=targets.positive_map[..., :t_cls])
        if text_mask is not None:
            text_mask = text_mask[..., :t_cls]
    boxes = layer_outputs["boxes"]
    ious = layer_outputs.get("ious")
    ctrl = layer_outputs.get("ctrl")
    refs = layer_outputs.get("refs")
    dense_masks = layer_outputs.get("masks")
    mask_embeds = layer_outputs.get("mask_embeds")
    num_layers = classes.shape[0]

    num_gt = targets.valid.sum().astype(jnp.float32)
    keys = jax.random.split(rng, num_layers)
    ksplit = jax.vmap(jax.random.split)(keys)          # (L, 2, key)
    k_match_all, k_pts_all = ksplit[:, 0], ksplit[:, 1]

    # ---- matching for ALL layers up front (vmapped over the layer axis) ----
    # Matching batches perfectly across layers, and the auction solver is a
    # while_loop: running it once vmapped over (L, B) costs max-trip-count
    # iterations instead of L sequential solves inside the scan (the scanned
    # form serialized ~L x ~1k tiny latency-bound loop iterations).
    if matcher == "fixed":
        assign_all = jnp.broadcast_to(fixed_assign[None],
                                      (num_layers,) + fixed_assign.shape)
    elif matcher == "ota":
        assign_all = jax.vmap(
            lambda c, bx: jax.vmap(simota_match, in_axes=(0, 0, 0, 0, 0))(
                jax.nn.sigmoid(c.astype(jnp.float32)), bx,
                targets.boxes, targets.positive_map, targets.valid))(
            classes, boxes)
        assign_all = jax.lax.stop_gradient(assign_all)
    else:  # hungarian with point-sampled mask costs (Mask2Former-style)
        # Build (L, B, Q, N) cost matrices first — with transient per-layer
        # masks when they come from the dynamic-conv head (lax.map keeps peak
        # memory at ONE layer's (B, Q, Hm, Wm); a vmap here would materialize
        # all L layers at once, ~L x the old scan's peak) — then solve all
        # L*B auctions in ONE batched while_loop (max- instead of
        # sum-of-trip-counts across layers).
        def cost_one(cls_i, box_i, tb, pm, ml, gm, key):
            # matching-cost sampling is capped at 2048 points (losses keep the
            # full cfg.num_points=12544): measured on real batches + the
            # 350-iter smoke checkpoint (tools/experiment_match_points.py,
            # 4 batches x 16 seeds), assignments from 2048-pt costs agree with
            # the EXACT dense-cost assignment 91.0% vs 89.4% for the
            # reference's 12544-pt estimator — the cap adds no assignment
            # error beyond the reference's own sampling noise.
            mc = mask_match_costs(key, ml, gm,
                                  num_points=min(cfg.num_points, 2048),
                                  cost_mask=cfg.mask_weight,
                                  cost_dice=cfg.dice_weight)
            return hungarian_vl_costs(
                jax.nn.sigmoid(cls_i.astype(jnp.float32)), box_i, tb, pm,
                cost_class=cfg.class_weight, cost_bbox=cfg.bbox_weight,
                cost_giou=cfg.giou_weight, mask_cost=mc)

        def cost_layer(cls_l, box_l, ml_l, key):
            bkeys = jax.random.split(key, cls_l.shape[0])
            return jax.vmap(cost_one)(
                cls_l, box_l, targets.boxes, targets.positive_map,
                jax.lax.stop_gradient(ml_l), targets.masks, bkeys)

        if mask_embeds is not None:
            def cost_one_e(cls_i, box_i, tb, pm, emb_i, f_i, gm, key):
                mc = mask_match_costs_embed(
                    key, emb_i, f_i, gm,
                    num_points=min(cfg.num_points, 2048),
                    cost_mask=cfg.mask_weight, cost_dice=cfg.dice_weight)
                return hungarian_vl_costs(
                    jax.nn.sigmoid(cls_i.astype(jnp.float32)), box_i, tb, pm,
                    cost_class=cfg.class_weight, cost_bbox=cfg.bbox_weight,
                    cost_giou=cfg.giou_weight, mask_cost=mc)

            pf_sg = jax.lax.stop_gradient(pixel_feats)

            def cost_layer_e(cls_l, box_l, emb_l, key):
                bkeys = jax.random.split(key, cls_l.shape[0])
                return jax.vmap(cost_one_e)(
                    cls_l, box_l, targets.boxes, targets.positive_map,
                    jax.lax.stop_gradient(emb_l), pf_sg, targets.masks, bkeys)

            costs_all = jax.vmap(cost_layer_e)(
                classes, boxes, mask_embeds, k_match_all)
        elif dense_masks is not None:
            costs_all = jax.vmap(cost_layer)(
                classes, boxes, dense_masks, k_match_all)
        else:
            q = classes.shape[2]
            all_q = jnp.broadcast_to(
                jnp.arange(q)[None], classes.shape[1:3]).astype(jnp.int32)

            def layer_step(xs):
                cls_l, box_l, ct, rf, key = xs
                ml_l = predict_matched_masks(
                    all_q, ct, rf, mask_feats, image_sizes,
                    weight_nums, bias_nums, dyn_channels)
                return cost_layer(cls_l, box_l, ml_l, key)

            costs_all = jax.lax.map(
                layer_step, (classes, boxes, ctrl, refs, k_match_all))

        assign_all = jax.lax.stop_gradient(jax.vmap(jax.vmap(
            auction_assignment, in_axes=(0, 0)), in_axes=(0, None))(
            costs_all, targets.valid))

    xs = {
        "cls": classes, "box": boxes,
        "iou": ious if ious is not None else None,
        "ctrl": ctrl, "refs": refs, "masks": dense_masks,
        "mask_embeds": mask_embeds,
        "assign": assign_all, "k_pts": k_pts_all,
    }
    xs = {k: v for k, v in xs.items() if v is not None}

    def layer_losses(x):
        cls_l, box_l = x["cls"], x["box"]
        k_pts = x["k_pts"]
        assign = x["assign"]

        matched_count = (assign >= 0).sum().astype(jnp.float32)
        if matcher == "fixed":
            num_boxes = jnp.clip(matched_count, 1.0)
        elif matcher == "ota" and ota_normalize_by_matches:
            num_boxes = matched_count
        else:
            num_boxes = jnp.clip(num_gt, 1.0)

        out = {"loss_ce": loss_labels_vl(
            cls_l, assign, targets, text_mask, num_boxes,
            alpha=cfg.focal_alpha, gamma=cfg.focal_gamma)}
        out.update(loss_boxes(box_l, x.get("iou"), assign, targets, num_boxes))

        if with_masks and ("ctrl" in x or "masks" in x or "mask_embeds" in x):
            sel_q, sel_valid = select_matched(assign, max_matched)
            # surface silently-dropped mask supervision: simOTA's dynamic-k can
            # match more than max_matched queries (VERDICT r1); monitor via the
            # 'matchdrop' metric and raise model.max_matched_masks if nonzero.
            out["matchdrop"] = jnp.maximum(
                (assign >= 0).sum(axis=1) - max_matched, 0).astype(
                    jnp.float32).sum()
            if "mask_embeds" in x:
                # dense logits ONLY for the selected K slots: selection
                # commutes with the (linear) embed contraction, so this equals
                # selecting rows of the dense (Q, H, W) stack.
                emb_sel = jnp.take_along_axis(
                    x["mask_embeds"].astype(jnp.float32),
                    sel_q[..., None], axis=1)            # (B, K, C)
                pred_masks = jnp.einsum(
                    "bkc,bhwc->bkhw", emb_sel,
                    pixel_feats.astype(jnp.float32))
            elif "masks" in x:
                pred_masks = jnp.take_along_axis(
                    x["masks"], sel_q[..., None, None], axis=1)
            else:
                pred_masks = predict_matched_masks(
                    sel_q, x["ctrl"], x["refs"], mask_feats, image_sizes,
                    weight_nums, bias_nums, dyn_channels)
            gt_idx = jnp.take_along_axis(assign, sel_q, axis=1)
            gt_idx = jnp.clip(gt_idx, 0, targets.masks.shape[1] - 1)
            gt_m = jnp.take_along_axis(
                targets.masks, gt_idx[..., None, None], axis=1)
            ph, pw = pred_masks.shape[2], pred_masks.shape[3]
            gt_m = gt_m[:, :, :ph, :pw]
            gt_m = jnp.pad(gt_m, ((0, 0), (0, 0), (0, ph - gt_m.shape[2]),
                                  (0, pw - gt_m.shape[3])))
            out.update(loss_masks_pointwise(k_pts, pred_masks, gt_m, sel_valid,
                                            num_boxes, cfg))
        return out

    _, stacked = jax.lax.scan(lambda c, x: (c, layer_losses(x)), None, xs)
    losses: Dict[str, jnp.ndarray] = {}
    for name, vals in stacked.items():
        for lid in range(num_layers):
            suffix = "" if lid == num_layers - 1 else f"_{lid}"
            losses[f"{name}{suffix}"] = vals[lid]
    return losses


def encoder_loss_pass(
    enc_class: jnp.ndarray,        # (B, S, K) fp32 logits (K = text len or 1)
    enc_boxes: jnp.ndarray,        # (B, S, 4) sigmoided coords
    targets: Targets,
    text_mask: jnp.ndarray,
    cfg: LossConfig,
    still_cls: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Two-stage encoder-proposal loss (the reference's '_enc'-suffixed losses,
    attached to the gt criterion pass via outputs['enc_outputs'],
    ddetrs_dn.py post_processing :796-799). Hungarian (auction) matching over
    all encoder positions; class + box losses, no masks."""
    b = enc_class.shape[0]
    k = enc_class.shape[-1]
    if still_cls or k == 1:
        # binary objectness: positive map = single always-on channel.
        pm = jnp.ones(targets.positive_map.shape[:2] + (1,), jnp.float32)
        tm = jnp.ones((b, 1), jnp.float32)
    else:
        pm = targets.positive_map
        tm = text_mask
    t = targets._replace(positive_map=pm)

    assign = jax.vmap(
        lambda c, bx, tb, pmap, tv: hungarian_vl_match(
            jax.nn.sigmoid(c.astype(jnp.float32)), bx, tb, pmap, tv,
            cost_class=cfg.class_weight, cost_bbox=cfg.bbox_weight,
            cost_giou=cfg.giou_weight))(
        enc_class, enc_boxes, targets.boxes, pm, targets.valid)
    assign = jax.lax.stop_gradient(assign)
    num_boxes = jnp.clip(targets.valid.sum().astype(jnp.float32), 1.0)
    out = {"loss_ce_enc": loss_labels_vl(enc_class, assign, t, tm, num_boxes,
                                         alpha=cfg.focal_alpha,
                                         gamma=cfg.focal_gamma)}
    lb = loss_boxes(enc_boxes, None, assign, t, num_boxes)
    out.update({f"{kk}_enc": v for kk, v in lb.items()})
    return out


def merge_loss_dicts(dicts: Sequence[Dict[str, jnp.ndarray]],
                     weights: Sequence[float]) -> Dict[str, jnp.ndarray]:
    """Weighted merge (reference ddetrs_dn.py merge_dict :233-243)."""
    out: Dict[str, jnp.ndarray] = {}
    for d, w in zip(dicts, weights):
        for k, v in d.items():
            v = v * w
            out[k] = out.get(k, 0.0) + v
    return out


def apply_weight_dict(losses: Dict[str, jnp.ndarray],
                      cfg: LossConfig) -> jnp.ndarray:
    """Total = sum of weighted losses (reference weight dict hipie_img.py:196-208)."""
    base = {
        "loss_ce": cfg.class_weight, "loss_bbox": cfg.bbox_weight,
        "loss_giou": cfg.giou_weight, "loss_mask": cfg.mask_weight,
        "loss_dice": cfg.dice_weight, "loss_boxiou": cfg.iou_head_weight,
    }
    total = 0.0
    for k, v in losses.items():
        root = k.split("_enc")[0]
        for name, w in base.items():
            if k == name or k.startswith(name + "_"):
                total = total + w * v
                break
    return total
