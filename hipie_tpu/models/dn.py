"""Contrastive denoising (CDN) query construction, static-shape.

Behavioral parity target: reference hipie/models/ddetrs_dn.py prepare_for_cdn
(:1176-1349) and compute_gt_indices (:1352-1368):
  * dn groups G = max(1, dn_number // (2 * N_max)); layout = G x [pos | neg]
    sections of width N_max -> pad_size = 2 * G * N_max dn queries in front of
    the query set.
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

TPU redesign: the reference pads to the max GT count in the batch at runtime;
here N_max is static, invalid slots carry a validity mask, and the whole thing
is pure jnp driven by an explicit rng key.
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
    valid: jnp.ndarray,         # (B, N) bool
    num_classes: int,
    num_matching_queries: int,  # bg + fg query count after the dn block
    dn_number: int = 100,
    label_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
) -> CDNQueries:
    b, n = labels.shape
    groups = max(1, dn_number // max(2 * n, 1))
    sections = 2 * groups
    pad = sections * n
    k_label, k_box_sign, k_box_mag, k_flip = jax.random.split(rng, 4)

    # tile gts across sections: (B, sections, N)
    tiled_labels = jnp.broadcast_to(labels[:, None, :], (b, sections, n))
    tiled_boxes = jnp.broadcast_to(boxes[:, None, :, :], (b, sections, n, 4))
    tiled_valid = jnp.broadcast_to(valid[:, None, :], (b, sections, n))

    # label noise
    if label_noise_ratio > 0:
        p = jax.random.uniform(k_label, (b, sections, n))
        rand_label = jax.random.randint(k_flip, (b, sections, n), 0, num_classes)
        noised_labels = jnp.where(p < label_noise_ratio * 0.5, rand_label, tiled_labels)
    else:
        noised_labels = tiled_labels
    noised_labels = jnp.clip(noised_labels, 0, num_classes - 1)

    # box noise — neg sections (odd index) get magnitude in [1, 2).
    is_neg = (jnp.arange(sections) % 2 == 1)[None, :, None, None]
    sign = jax.random.randint(k_box_sign, (b, sections, n, 4), 0, 2) * 2.0 - 1.0
    mag = jax.random.uniform(k_box_mag, (b, sections, n, 4))
    mag = jnp.where(is_neg, mag + 1.0, mag)
    half = jnp.concatenate([tiled_boxes[..., 2:] / 2, tiled_boxes[..., 2:] / 2], -1)
    xyxy = jnp.concatenate(
        [tiled_boxes[..., :2] - tiled_boxes[..., 2:] / 2,
         tiled_boxes[..., :2] + tiled_boxes[..., 2:] / 2], -1)
    noised_xyxy = jnp.clip(xyxy + sign * mag * half * box_noise_scale, 0.0, 1.0)
    noised = jnp.concatenate(
        [(noised_xyxy[..., :2] + noised_xyxy[..., 2:]) / 2,
         noised_xyxy[..., 2:] - noised_xyxy[..., :2]], -1)
    refs_unact = inverse_sigmoid(noised)

    # invalid gt slots: degenerate refs; content zeroed by the model via slot_valid.
    refs_unact = jnp.where(tiled_valid[..., None], refs_unact, 0.0).reshape(b, pad, 4)
    slot_valid = tiled_valid.reshape(b, pad)

    # per-slot gt assignment (both pos and neg sections supervise the gt).
    gt_idx = jnp.broadcast_to(jnp.arange(n)[None, None, :], (b, sections, n))
    gt_assign = jnp.where(tiled_valid, gt_idx, -1).reshape(b, pad).astype(jnp.int32)

    # attention mask over [dn | matching].
    q_total = pad + num_matching_queries
    mask = jnp.zeros((q_total, q_total), bool)
    mask = mask.at[pad:, :pad].set(True)                     # matching can't see dn
    slot_section = jnp.arange(pad) // n
    same_group = (slot_section[:, None] // 2) == (slot_section[None, :] // 2)
    mask = mask.at[:pad, :pad].set(~same_group)              # dn sees own group only
    return CDNQueries(noised_labels.reshape(b, pad), slot_valid, refs_unact, mask,
                      gt_assign, pad, groups)
