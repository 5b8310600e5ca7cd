"""Prediction heads: VL alignment classifier, box MLP, IoU head, helpers.

Behavioral parity targets:
  * VL_Align — reference deformable_detr.py:40-73: logits = (queries · proj(l2norm(text)/2))
    / exp(log_scale) + (l2norm(text) · bias_lang + bias0); bias0 init from focal prior.
  * Still_Classifier — deformable_detr.py:76-82: plain binary linear head (ignores text).
  * FeatureResizer — 768->256 linear + LN used on pooled language features.
  * agg_lang_feat — deformable_transformer.py:28-45 masked mean / max pooling.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class VLAlign(nn.Module):
    """Vision-language dot-product classification head."""

    lang_dim: int = 768
    hidden_dim: int = 256
    log_scale_init: float = 0.0
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, embedding: jnp.ndarray) -> jnp.ndarray:
        """x: (B, Q, hidden); embedding: (B, L, lang_dim). Returns (B, Q, L) fp32."""
        emb = embedding.astype(jnp.float32)
        emb = emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        tokens = nn.Dense(self.hidden_dim, dtype=self.dtype,
                          name="dot_product_projection_text")(
            (emb / 2.0).astype(self.dtype))
        log_scale = self.param("log_scale",
                               nn.initializers.constant(self.log_scale_init), (1,))
        bias_lang = self.param("bias_lang", nn.initializers.zeros, (self.lang_dim,))
        bias0_init = -math.log((1 - self.prior_prob) / self.prior_prob)
        bias0 = self.param("bias0", nn.initializers.constant(bias0_init), (1,))

        token_bias = emb @ bias_lang + bias0                        # (B, L)
        logits = jnp.einsum("bqc,blc->bql", x.astype(jnp.float32),
                            tokens.astype(jnp.float32))
        logits = logits / jnp.exp(log_scale) + token_bias[:, None, :]
        return logits


class StillClassifier(nn.Module):
    """Binary objectness head for encoder proposals (STILL_CLS_FOR_ENCODER)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, embedding=None):
        return nn.Dense(1, dtype=self.dtype, name="body")(x).astype(jnp.float32)


class FeatureResizer(nn.Module):
    """Linear 768 -> d_model + LayerNorm for pooled language features."""

    output_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(x)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layer_norm")(x)


def agg_lang_feat(features: jnp.ndarray, mask: jnp.ndarray,
                  pool_type: str = "average") -> jnp.ndarray:
    """Masked pooling of (B, L, C) text features; mask (B, L) 1 = valid."""
    m = mask.astype(features.dtype)
    if pool_type == "average":
        return (features * m[..., None]).sum(1) / jnp.clip(m.sum(-1)[..., None], 1e-6)
    if pool_type == "max":
        neg = jnp.finfo(jnp.float32).min
        masked = jnp.where(m[..., None] > 0, features.astype(jnp.float32), neg)
        return jnp.max(masked, axis=1).astype(features.dtype)
    raise ValueError(pool_type)
