"""Vision-language early fusion (bidirectional cross-modal attention).

Behavioral parity target: reference hipie/models/deformable_detr/fuse_helper.py:7-179
(BiMultiHeadAttention, BiAttentionBlockForCheckpoint) and vlfusion.py:64-120 (VLFuse).

Semantics reproduced exactly:
  * one joint logits matrix QK^T between vision tokens (queries, scaled) and text
    tokens; softmax over the text dim (with text pad mask, -9e15 fill) updates vision;
    softmax of the transposed logits over the image dim (max-subtracted, NO pad mask —
    the reference applies none on this side) updates text.
  * pre-LN block whose residual base is the NORMALIZED input (fuse_helper.py:170-178
    overwrites v with layer_norm(v) before the residual add — a quirk the released
    weights were trained with).
  * per-branch layer-scale gammas, init 1/num_encoder_layers (vlfusion.py:85).

TPU notes: logits in fp32 (so the reference's ±50000 fp16 clamps are unnecessary);
the whole block is (B, S, 256) x (B, L, 768) dense matmuls — pure MXU work. The image
axis S (~20k tokens) is the sharding axis for sequence parallelism; text L is tiny.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BiMultiHeadAttention(nn.Module):
    v_dim: int = 256
    l_dim: int = 768
    embed_dim: int = 2048
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, v, l, text_mask=None):
        """v: (B, S, v_dim); l: (B, L, l_dim); text_mask: (B, L) 1 = valid."""
        b, s, _ = v.shape
        L = l.shape[1]
        h = self.num_heads
        d = self.embed_dim // h
        scale = d ** -0.5

        q = nn.DenseGeneral((h, d), dtype=self.dtype, name="v_proj")(v) * scale
        k = nn.DenseGeneral((h, d), dtype=self.dtype, name="l_proj")(l)
        val_v = nn.DenseGeneral((h, d), dtype=self.dtype, name="values_v_proj")(v)
        val_l = nn.DenseGeneral((h, d), dtype=self.dtype, name="values_l_proj")(l)

        logits = jnp.einsum("bshd,blhd->bhsl", q, k).astype(jnp.float32)

        # text update: softmax over image tokens, per-row max subtracted, no pad mask.
        logits_t = jnp.swapaxes(logits, -1, -2)            # (B, H, L, S)
        logits_t = logits_t - jax.lax.stop_gradient(jnp.max(logits_t, axis=-1, keepdims=True))
        attn_l = jax.nn.softmax(logits_t, axis=-1).astype(self.dtype)
        out_l = jnp.einsum("bhls,bshd->blhd", attn_l, val_v)

        # vision update: mask text pads, softmax over text tokens.
        if text_mask is not None:
            logits = jnp.where(text_mask[:, None, None, :] > 0, logits, -9e15)
        attn_v = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out_v = jnp.einsum("bhsl,blhd->bshd", attn_v, val_l)

        out_v = nn.DenseGeneral(self.v_dim, axis=(-2, -1), dtype=self.dtype,
                                name="out_v_proj")(out_v)
        out_l = nn.DenseGeneral(self.l_dim, axis=(-2, -1), dtype=self.dtype,
                                name="out_l_proj")(out_l)
        return out_v, out_l


class BiAttentionBlock(nn.Module):
    """Pre-LN bi-attention with layer scale. Returns updated (v, l)."""

    v_dim: int = 256
    l_dim: int = 768
    embed_dim: int = 2048
    num_heads: int = 8
    init_gamma: float = 1.0 / 6.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, v, l, text_mask=None):
        v = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_v")(v)
        l = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_l")(l)
        delta_v, delta_l = BiMultiHeadAttention(
            self.v_dim, self.l_dim, self.embed_dim, self.num_heads,
            dtype=self.dtype, name="attn",
        )(v, l, text_mask)
        gamma_v = self.param("gamma_v", nn.initializers.constant(self.init_gamma), (self.v_dim,))
        gamma_l = self.param("gamma_l", nn.initializers.constant(self.init_gamma), (self.l_dim,))
        # Residual base is the normalized input (reference quirk, see module docstring).
        v = v + gamma_v.astype(v.dtype) * delta_v
        l = l + gamma_l.astype(l.dtype) * delta_l
        return v, l
