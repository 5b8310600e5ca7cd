"""Point-sampled mask loss utilities.

Replaces detectron2/projects/point_rend/point_features.py (point_sample,
get_uncertain_point_coords_with_randomness) with pure-jnp static-shape versions.
Semantics: coords in [0, 1], bilinear, align_corners=False (grid_sample style),
uncertainty = -|logit|, oversample x3, importance ratio 0.75.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample (..., H, W) masks at (..., P, 2) normalized (x, y) coords.

    Matches F.grid_sample(align_corners=False, padding_mode='zeros') with
    grid = 2 * coords - 1.
    """
    h, w = masks.shape[-2], masks.shape[-1]
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat_masks = masks.reshape(masks.shape[:-2] + (h * w,))
        idx = yc * w + xc
        vals = jnp.take_along_axis(flat_masks, idx, axis=-1)
        return vals * wgt * valid.astype(masks.dtype)

    out = corner(y0i, x0i, (1 - ly) * (1 - lx))
    out = out + corner(y0i, x0i + 1, (1 - ly) * lx)
    out = out + corner(y0i + 1, x0i, ly * (1 - lx))
    out = out + corner(y0i + 1, x0i + 1, ly * lx)
    return out


def uncertain_point_coords(
    rng: jax.Array,
    mask_logits: jnp.ndarray,       # (N, H, W)
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jnp.ndarray:
    """Uncertainty-oversampled random point coords (N, P, 2) in [0, 1].

    reference: point_features.py get_uncertain_point_coords_with_randomness with
    uncertainty = -|logit| (calculate_uncertainty in deformable_detr.py).
    """
    n = mask_logits.shape[0]
    k1, k2 = jax.random.split(rng)
    n_sampled = int(num_points * oversample_ratio)
    coords = jax.random.uniform(k1, (n, n_sampled, 2))
    logits = point_sample(mask_logits, coords)
    uncertainty = -jnp.abs(logits)
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    _, idx = jax.lax.top_k(uncertainty, n_unc)
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    rand = jax.random.uniform(k2, (n, n_rand, 2))
    return jnp.concatenate([picked, rand], axis=1)
