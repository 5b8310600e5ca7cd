"""Contrastive denoising (CDN) query construction, static-shape.

Behavioral parity target: reference hipie/models/ddetrs_dn.py prepare_for_cdn
(:1176-1349) and compute_gt_indices (:1352-1368):
  * dn groups G = max(1, 2*dn_number // (2*m)) with m the batch's ACTUAL max
    GT count; layout = G x [pos | neg] sections of width m -> ~2*dn_number
    active dn queries in front of the query set regardless of m.
  * label noise: with prob ratio/2 replace the label fed to the label embedding
    by a uniform random class.
  * box noise: per-coordinate random sign and magnitude in [0, scale) for the
    positive section and [scale, 2*scale) for the negative section, applied in
    xyxy half-extent units, clamped to [0, 1], converted back to cxcywh and
    inverse-sigmoided.
  * attention mask: matching queries never see dn queries; dn groups never see
    each other; IMPORTANTLY, the reference supervises BOTH pos and neg sections
    against the GT (compute_gt_indices assigns every section identity indices),
    so `gt_assign` marks every dn slot of a valid GT.

TPU redesign: the slot budget (2*dn_number) is static while the group/section
layout inside it is DYNAMIC (slot -> (s // m, s % m) with m a traced scalar);
invalid slots carry a validity mask, and the whole thing is pure jnp driven by
an explicit rng key.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hipie_tpu.utils.misc import inverse_sigmoid


class CDNQueries(NamedTuple):
    noised_labels: jnp.ndarray  # (B, pad) int32 — embedded by the model's label_enc
    slot_valid: jnp.ndarray     # (B, pad) bool
    refs_unact: jnp.ndarray     # (B, pad, 4) inverse-sigmoid noised boxes
    attn_mask: jnp.ndarray      # (Q_total, Q_total) bool, True = BLOCKED
    gt_assign: jnp.ndarray      # (B, pad) int32 gt index or -1
    pad_size: int
    num_groups: int


def prepare_cdn(
    rng: jax.Array,
    labels: jnp.ndarray,        # (B, N) int32
    boxes: jnp.ndarray,         # (B, N, 4) cxcywh in [0, 1]
    valid: jnp.ndarray,         # (B, N) bool — valid GTs packed at the front
    num_classes: int,
    num_matching_queries: int,  # bg + fg query count after the dn block
    dn_number: int = 100,
    label_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
) -> CDNQueries:
    """Static slot budget P = 2*dn_number; the GROUP COUNT is dynamic.

    The reference derives groups from the batch's ACTUAL max GT count m:
    g = 2*dn_number // (2*m), i.e. an image with 7 objects gets ~14 groups
    (~196 active dn queries). Deriving groups from the static padding N_max
    instead collapsed CDN to one group (~2*m active queries) — ~7x weaker
    denoising supervision (round-2 review). Here slot s maps to
    (section = s // m, gt = s % m) with m a traced scalar: shapes stay
    static, the layout adapts per batch.
    """
    b, n = labels.shape
    # Static slot budget. 2*dn_number matches the reference's active-query
    # count when m <= dn_number; if the static max-GT padding n exceeds
    # dn_number, a single group still needs 2*m slots (m can reach n), so
    # widen the budget to keep every section fully laid out (advisor r1).
    pad = 2 * max(dn_number, n)
    k_label, k_box_sign, k_box_mag, k_flip = jax.random.split(rng, 4)

    counts = valid.sum(-1)
    m = jnp.maximum(counts.max(), 1).astype(jnp.int32)     # dynamic max GTs
    groups = jnp.maximum((2 * dn_number) // (2 * m), 1)    # dynamic
    sections = 2 * groups

    s = jnp.arange(pad)
    sec = s // m                                      # (P,) dynamic values
    gt = (s % m).astype(jnp.int32)
    slot_active = sec < sections                      # unused tail slots

    take = lambda x: jnp.take_along_axis(
        x, jnp.broadcast_to(gt[None], (b, pad)), axis=1)
    slot_labels = take(labels)                        # (B, P)
    slot_boxes = jnp.take_along_axis(
        boxes, jnp.broadcast_to(gt[None, :, None], (b, pad, 4)), axis=1)
    slot_valid = take(valid) & slot_active[None]      # (B, P)

    # label noise
    if label_noise_ratio > 0:
        p = jax.random.uniform(k_label, (b, pad))
        rand_label = jax.random.randint(k_flip, (b, pad), 0, num_classes)
        noised_labels = jnp.where(p < label_noise_ratio * 0.5, rand_label,
                                  slot_labels)
    else:
        noised_labels = slot_labels
    noised_labels = jnp.clip(noised_labels, 0, num_classes - 1)

    # box noise — neg sections (odd section index) get magnitude in [1, 2).
    is_neg = (sec % 2 == 1)[None, :, None]
    sign = jax.random.randint(k_box_sign, (b, pad, 4), 0, 2) * 2.0 - 1.0
    mag = jax.random.uniform(k_box_mag, (b, pad, 4))
    mag = jnp.where(is_neg, mag + 1.0, mag)
    half = jnp.concatenate([slot_boxes[..., 2:] / 2, slot_boxes[..., 2:] / 2], -1)
    xyxy = jnp.concatenate(
        [slot_boxes[..., :2] - slot_boxes[..., 2:] / 2,
         slot_boxes[..., :2] + slot_boxes[..., 2:] / 2], -1)
    noised_xyxy = jnp.clip(xyxy + sign * mag * half * box_noise_scale, 0.0, 1.0)
    noised = jnp.concatenate(
        [(noised_xyxy[..., :2] + noised_xyxy[..., 2:]) / 2,
         noised_xyxy[..., 2:] - noised_xyxy[..., :2]], -1)
    refs_unact = inverse_sigmoid(noised)

    # invalid slots: degenerate refs; content zeroed by the model via slot_valid.
    refs_unact = jnp.where(slot_valid[..., None], refs_unact, 0.0)

    # per-slot gt assignment (both pos and neg sections supervise the gt).
    gt_assign = jnp.where(slot_valid, gt[None], -1).astype(jnp.int32)

    # attention mask over [dn | matching]: matching never sees dn; dn groups
    # see only their own group. Built with dynamic sec values, static shape.
    q_total = pad + num_matching_queries
    mask = jnp.zeros((q_total, q_total), bool)
    mask = mask.at[pad:, :pad].set(True)
    same_group = (sec[:, None] // 2) == (sec[None, :] // 2)
    mask = mask.at[:pad, :pad].set(~same_group)
    return CDNQueries(noised_labels, slot_valid, refs_unact, mask,
                      gt_assign, pad, 0)
