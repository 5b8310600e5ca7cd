"""Small numeric helpers shared across the framework.

Replaces reference projects/HIPIE/hipie/util/misc.py (inverse_sigmoid, NestedTensor
padding) with static-shape jnp equivalents; the NestedTensor concept becomes a plain
(images, mask) pair padded to a static bucket on device.
"""

from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def get_valid_ratio(mask: jnp.ndarray) -> jnp.ndarray:
    """Fraction of non-padded rows/cols per image. mask: (B, H, W) True=PADDING.

    Matches reference deformable_transformer_dino.py get_valid_ratio: returns
    (B, 2) = (ratio_w, ratio_h).
    """
    not_mask = ~mask
    valid_h = jnp.sum(not_mask[:, :, 0].astype(jnp.float32), axis=1)
    valid_w = jnp.sum(not_mask[:, 0, :].astype(jnp.float32), axis=1)
    h = mask.shape[1]
    w = mask.shape[2]
    return jnp.stack([valid_w / w, valid_h / h], axis=-1)


def sine_position_embedding_1d(
    pos: jnp.ndarray, num_feats: int = 128, temperature: float = 10000.0,
    scale: float = 2 * 3.141592653589793, exchange_xy: bool = True,
) -> jnp.ndarray:
    """Sine embedding of normalized positions, last dim of `pos` is coords.

    Mirrors reference deformable_transformer_dino.py get_sine_pos_embed semantics:
    per coordinate produce num_feats dims with interleaved sin/cos; coordinate order
    (x, y) swapped when exchange_xy.
    """
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    x = pos[..., None] * scale / dim_t          # (..., C, num_feats)
    sin = jnp.sin(x[..., 0::2])
    cos = jnp.cos(x[..., 1::2])
    emb = jnp.stack([sin, cos], axis=-1).reshape(x.shape[:-1] + (num_feats,))
    parts = [emb[..., i, :] for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


def cast_params_bf16(params):
    """Cast float params to bfloat16 for inference.

    The model computes in bf16 (model.dtype) but flax stores params fp32, so
    every apply() re-converts the full parameter set on device — for ViT-H
    that is ~5 ms/image of pure f32->bf16 converts of the stacked block
    weights (HLO trace, PERFORMANCE.md). Pre-casting once removes them; the
    fp32 islands (logits, box math, sampling) upcast their small per-use
    operands on the fly. Matches the reference's fp16-autocast inference
    envelope. Do NOT use for training state (optimizer needs fp32 masters).
    """
    import jax
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x

    return jax.tree_util.tree_map(cast, params)
