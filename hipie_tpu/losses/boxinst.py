"""BoxInst box-supervised mask losses: projection + pairwise color consistency.

Behavioral parity target: reference deformable_detr.py loss_masks_boxinst
(:526-600), compute_project_term (:881-890), compute_pairwise_term (:893-920) and
the host-side color-similarity construction in hipie_img.py unfold_wo_center /
get_images_color_similarity (:1056-1097):
  * projection: dice between per-axis max-projections of mask probs and the GT
    box bitmask.
  * pairwise: -log P(same label) over a k x k dilated neighborhood (center
    removed), counted only where the LAB color similarity >= 0.3 inside the box
    bitmask, linearly warmed up over _warmup_iters.

TPU redesign: unfold becomes a static shift-and-stack (jnp.roll with masking) —
no im2col materialization; the per-image python loop over matched instances
becomes a fixed-K batched gather.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def shift_stack(x: jnp.ndarray, kernel_size: int, dilation: int) -> jnp.ndarray:
    """(..., H, W) -> (..., K^2-1, H, W): dilated neighborhood values, center
    removed; out-of-bounds positions are zero (matches F.unfold zero padding)."""
    h, w = x.shape[-2], x.shape[-1]
    outs = []
    r = kernel_size // 2
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            sy, sx = dy * dilation, dx * dilation
            shifted = jnp.roll(x, (-sy, -sx), axis=(-2, -1))
            ys = jnp.arange(h) + sy
            xs = jnp.arange(w) + sx
            valid = ((ys >= 0) & (ys < h))[:, None] & ((xs >= 0) & (xs < w))[None, :]
            outs.append(jnp.where(valid, shifted, 0.0))
    return jnp.stack(outs, axis=-3)


def images_color_similarity(image_lab: jnp.ndarray, kernel_size: int = 3,
                            dilation: int = 2) -> jnp.ndarray:
    """(H, W, 3) LAB image -> (K^2-1, H, W) exp(-||c_i - c_j|| / 2)."""
    x = jnp.transpose(image_lab, (2, 0, 1)).astype(jnp.float32)   # (3, H, W)
    neigh = shift_stack(x, kernel_size, dilation)                 # (3, K, H, W)
    diff = x[:, None] - neigh
    return jnp.exp(-jnp.linalg.norm(diff, axis=0) * 0.5)


def _dice_coefficient(pred, gt):
    """1 - 2|pg|/( |p|^2 + |g|^2 ) over the last axis."""
    eps = 1e-5
    p = pred.reshape(pred.shape[0], -1)
    g = gt.reshape(gt.shape[0], -1)
    inter = (p * g).sum(-1)
    union = (p ** 2).sum(-1) + (g ** 2).sum(-1) + eps
    return 1.0 - (2 * inter / union)


def project_term(mask_probs: jnp.ndarray, box_bitmasks: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
    """mask_probs, box_bitmasks (N, H, W); dice on x/y max-projections."""
    ly = _dice_coefficient(mask_probs.max(axis=1), box_bitmasks.max(axis=1))
    lx = _dice_coefficient(mask_probs.max(axis=2), box_bitmasks.max(axis=2))
    v = valid.astype(jnp.float32)
    return ((lx + ly) * v).sum() / jnp.clip(v.sum(), 1.0)


def pairwise_term(mask_logits: jnp.ndarray, kernel_size: int = 3,
                  dilation: int = 2) -> jnp.ndarray:
    """(N, H, W) logits -> (N, K^2-1, H, W) -log P(same label)."""
    log_fg = jax.nn.log_sigmoid(mask_logits)
    log_bg = jax.nn.log_sigmoid(-mask_logits)
    fg_n = shift_stack(log_fg, kernel_size, dilation)
    bg_n = shift_stack(log_bg, kernel_size, dilation)
    same_fg = log_fg[:, None] + fg_n
    same_bg = log_bg[:, None] + bg_n
    m = jnp.maximum(same_fg, same_bg)
    return -(jnp.log(jnp.exp(same_fg - m) + jnp.exp(same_bg - m)) + m)


def boxinst_losses(
    mask_logits: jnp.ndarray,        # (N, H, W) matched-query mask logits
    box_bitmasks: jnp.ndarray,       # (N, H, W) GT box-region bitmasks
    color_similarity: jnp.ndarray,   # (N, K^2-1, H, W)
    valid: jnp.ndarray,              # (N,) matched-pair validity
    iteration: jnp.ndarray,          # scalar, for pairwise warmup
    pairwise_color_thresh: float = 0.3,
    warmup_iters: int = 10000,
    kernel_size: int = 3,
    dilation: int = 2,
):
    probs = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    loss_prj = project_term(probs, box_bitmasks.astype(jnp.float32), valid)
    pw = pairwise_term(mask_logits.astype(jnp.float32), kernel_size, dilation)
    weights = ((color_similarity >= pairwise_color_thresh).astype(jnp.float32)
               * box_bitmasks[:, None].astype(jnp.float32)
               * valid[:, None, None, None].astype(jnp.float32))
    loss_pw = (pw * weights).sum() / jnp.clip(weights.sum(), 1.0)
    warm = jnp.clip(iteration.astype(jnp.float32) / warmup_iters, 0.0, 1.0)
    return {"loss_prj": loss_prj, "loss_pairwise": loss_pw * warm}
