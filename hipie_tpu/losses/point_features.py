"""Point-sampled mask loss utilities.

Replaces detectron2/projects/point_rend/point_features.py (point_sample,
get_uncertain_point_coords_with_randomness) with pure-jnp static-shape versions.
Semantics: coords in [0, 1], bilinear, align_corners=False (grid_sample style),
uncertainty = -|logit|, oversample x3, importance ratio 0.75.

TPU note: the obvious formulation — `take_along_axis` over the flattened
(H*W) minor axis — lowers to an elementwise lane gather whose forward AND
scatter-add transpose are catastrophically slow on TPU (measured ~100x the
rest of the train step at 12544 points). `point_sample` therefore uses the
same trick as the MSDA kernel (ops/ms_deform_attn.py): a one-pixel-padded
"quad table" whose row r holds the 4 bilinear corners of base position r, so
every sample is ONE row gather (row-count-bound, ~4e8 rows/s) + a 4-lane
weighted reduce. 51.6 s -> 0.6 s per 256^2 train step (PERFORMANCE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _quad_table(masks2d: jnp.ndarray) -> jnp.ndarray:
    """(G, H, W) -> (G, (H+1)*(W+1), 4): row = 4 bilinear corners at y0,x0."""
    g, h, w = masks2d.shape
    mp = jnp.pad(masks2d, ((0, 0), (1, 1), (1, 1)))
    quad = jnp.stack(
        [mp[:, :-1, :-1], mp[:, :-1, 1:], mp[:, 1:, :-1], mp[:, 1:, 1:]],
        axis=-1)                                     # (G, H+1, W+1, 4)
    return quad.reshape(g, (h + 1) * (w + 1), 4)


def point_sample(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample (..., H, W) masks at (..., P, 2) normalized (x, y) coords.

    Matches F.grid_sample(align_corners=False, padding_mode='zeros') with
    grid = 2 * coords - 1. Leading dims of `masks` and `coords` must agree.
    """
    h, w = masks.shape[-2], masks.shape[-1]
    batch = masks.shape[:-2]
    p = coords.shape[-2]
    dtype = jnp.float32

    table = _quad_table(masks.astype(dtype).reshape((-1,) + (h, w)))
    g = table.shape[0]

    x = coords[..., 0].reshape(g, p) * w - 0.5
    y = coords[..., 1].reshape(g, p) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(dtype)
    ly = (y - y0).astype(dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    in_range = (x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1)
    idx = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
           + (jnp.clip(x0i, -1, w - 1) + 1))         # (G, P) in-table rows
    rows = (idx + (jnp.arange(g, dtype=jnp.int32) * (h + 1) * (w + 1))[:, None]
            ).reshape(-1)

    gathered = jnp.take(table.reshape(-1, 4), rows, axis=0)   # (G*P, 4)
    cw = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                    ly * (1 - lx), ly * lx], axis=-1)         # (G, P, 4)
    cw = cw * in_range[..., None].astype(dtype)
    out = jnp.sum(gathered.reshape(g, p, 4) * cw, axis=-1)
    return out.reshape(batch + (p,))    # fp32


def point_sample_pair(a: jnp.ndarray, b: jnp.ndarray,
                      coords: jnp.ndarray):
    """Sample two same-shaped mask stacks at the SAME coords with one gather.

    Returns (a_sampled, b_sampled); used by the criterion to fetch pred logits
    and GT labels together (halves the gathered row count).
    """
    stacked = jnp.stack([a.astype(jnp.float32), b.astype(jnp.float32)],
                        axis=-3)       # (..., 2, H, W)
    c2 = jnp.broadcast_to(coords[..., None, :, :],
                          coords.shape[:-2] + (2,) + coords.shape[-2:])
    out = point_sample(stacked, c2)
    return out[..., 0, :], out[..., 1, :]


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
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    if n_unc == 0:
        return jax.random.uniform(k2, (n, num_points, 2))
    logits = point_sample(mask_logits, coords)
    uncertainty = -jnp.abs(logits)
    _, idx = jax.lax.top_k(uncertainty, n_unc)
    # row gather (take_along_axis over a 2-lane array is a slow lane gather)
    rows = (idx + (jnp.arange(n, dtype=jnp.int32) * n_sampled)[:, None])
    picked = jnp.take(coords.reshape(n * n_sampled, 2),
                      rows.reshape(-1), axis=0).reshape(n, n_unc, 2)
    if n_rand == 0:
        return picked
    rand = jax.random.uniform(k2, (n, n_rand, 2))
    return jnp.concatenate([picked, rand], axis=1)
