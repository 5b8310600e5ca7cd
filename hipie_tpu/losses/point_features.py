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


def point_sample(masks: jnp.ndarray, coords: jnp.ndarray,
                 fastgrad: bool = False) -> jnp.ndarray:
    """Bilinear-sample (..., H, W) masks at (..., P, 2) normalized (x, y) coords.

    Matches F.grid_sample(align_corners=False, padding_mode='zeros') with
    grid = 2 * coords - 1. Leading dims of `masks` and `coords` must agree.

    Delegates to ops.bilinear.bilinear_sample, whose custom VJP computes the
    mask gradient by MXU-matmul splatting instead of XLA's scatter-add gather
    transpose (~100x faster on TPU at mask-loss shapes; PERFORMANCE.md).
    fastgrad=True picks the bf16-operand splat variant (same forward values).
    """
    from hipie_tpu.ops.bilinear import bilinear_sample, bilinear_sample_fastgrad

    fn = bilinear_sample_fastgrad if fastgrad else bilinear_sample
    h, w = masks.shape[-2], masks.shape[-1]
    batch = masks.shape[:-2]
    p = coords.shape[-2]
    out = fn(masks.reshape((-1, h, w)), coords.reshape((-1, p, 2)))
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
    exact_topk: bool = True,
) -> jnp.ndarray:
    """Uncertainty-oversampled random point coords (N, P, 2) in [0, 1].

    reference: point_features.py get_uncertain_point_coords_with_randomness with
    uncertainty = -|logit| (calculate_uncertainty in deformable_detr.py).

    `exact_topk=False` opts into the cheaper ranking phase: lax.approx_max_k
    (TPU PartialReduce, ~0.95 recall, linear time vs the full VPU sort that
    lax.top_k lowers to when n_unc ~ n/4) over a bf16-sampled table (the 3x
    oversampled gather is HBM-bandwidth-bound; bf16 halves its bytes). The
    selection only steers a Monte-Carlo loss estimator, so the approximation
    is semantically fine — but a round-2 TPU measurement found approx_max_k
    NOT faster at smoke shapes (PERFORMANCE.md "measured out"), so it stays
    opt-in until a prod-scale A/B proves it.
    """
    n = mask_logits.shape[0]
    k1, k2 = jax.random.split(rng)
    n_sampled = int(num_points * oversample_ratio)
    coords = jax.random.uniform(k1, (n, n_sampled, 2))
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    if n_unc == 0:
        return jax.random.uniform(k2, (n, num_points, 2))
    if exact_topk:          # full-parity mode: f32 ranking + exact sort
        logits = point_sample(mask_logits, coords)
        _, idx = jax.lax.top_k(-jnp.abs(logits), n_unc)
    else:
        # stop-grad ranking phase: bf16 table halves the bytes of this
        # gather — the largest in the criterion (3x oversampled) — and
        # |logit| ranking is insensitive to bf16 quantization (the loss
        # phase re-samples in f32).
        logits = point_sample(mask_logits.astype(jnp.bfloat16), coords)
        _, idx = jax.lax.approx_max_k(-jnp.abs(logits), n_unc)
    # row gather (take_along_axis over a 2-lane array is a slow lane gather)
    rows = (idx + (jnp.arange(n, dtype=jnp.int32) * n_sampled)[:, None])
    picked = jnp.take(coords.reshape(n * n_sampled, 2),
                      rows.reshape(-1), axis=0).reshape(n, n_unc, 2)
    if n_rand == 0:
        return picked
    rand = jax.random.uniform(k2, (n, n_rand, 2))
    return jnp.concatenate([picked, rand], axis=1)
