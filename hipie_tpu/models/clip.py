"""CLIP (ViT + text transformer) and MaskCLIP mask-pooled classification, flax.

Behavioral parity target: reference hipie/open_vocab/clip.py —
  * ClipAdapter (:77-239): frozen open_clip ViT-L-14-336, excluded from the
    train state; prompt-template text embedding builder with cache.
  * MaskCLIP (:243-383): Q extra CLS tokens attend only to in-mask patches
    (mask max-pooled to the patch grid, threshold 0.5; _mask_clip_forward
    :258-286 / encode_image_with_mask :288-332); logits = cosine(mask_embed,
    text_embed) * clamp(exp(logit_scale), 100), ensembled over synonym groups
    (helper.py ensemble_logits_with_labels: mean prob over each group).
  * score fusion with the detector's probabilities happens in
    hipie_tpu/models/postprocess_clip.py (get_clip_logits, hipie_img.py:811-868).

Weights convert from an open_clip checkpoint via
hipie_tpu/utils/converter.py-style name maps (convert_clip below).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPAttention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        # x: (B, T, C); attn_mask: (B, T, T) bool True = BLOCKED.
        h = self.heads
        d = self.dim // h
        q = nn.DenseGeneral((h, d), dtype=self.dtype, name="q_proj")(x)
        k = nn.DenseGeneral((h, d), dtype=self.dtype, name="k_proj")(x)
        v = nn.DenseGeneral((h, d), dtype=self.dtype, name="v_proj")(x)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / math.sqrt(d)
        if attn_mask is not None:
            logits = jnp.where(attn_mask[:, None], jnp.finfo(jnp.float32).min, logits)
        attn = jax.nn.softmax(logits, -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return nn.DenseGeneral(self.dim, axis=(-2, -1), dtype=self.dtype,
                               name="out_proj")(out)


class CLIPBlock(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        x = x + CLIPAttention(self.dim, self.heads, dtype=self.dtype, name="attn")(
            y, attn_mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(self.dim * 4, dtype=self.dtype, name="mlp_fc")(y)
        y = y * jax.nn.sigmoid(1.702 * y)          # quick-gelu (openai CLIP)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_proj")(y)
        return x + y


class CLIPVisual(nn.Module):
    """CLIP ViT visual tower with optional extra mask-CLS tokens (MaskCLIP)."""

    image_size: int = 336
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    output_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 mask_attn: Optional[jnp.ndarray] = None):
        """images: (B, S, S, 3) CLIP-normalized. mask_attn: (B, Q, P) bool,
        True = patch BLOCKED for mask-token q. Returns:
          * mask_attn given  -> (B, Q, output_dim) mask embeddings
          * mask_attn absent -> (B, output_dim) CLS embedding
        """
        b = images.shape[0]
        x = nn.Conv(self.width, (self.patch_size,) * 2, strides=(self.patch_size,) * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(images)
        x = x.reshape(b, -1, self.width)
        n_patch = x.shape[1]
        cls_embed = self.param("class_embedding",
                               nn.initializers.normal(0.02), (self.width,))
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (n_patch + 1, self.width))
        cls_tok = jnp.broadcast_to(cls_embed[None, None], (b, 1, self.width))
        x = jnp.concatenate([cls_tok.astype(self.dtype), x], axis=1) + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)

        attn_mask = None
        n_mask = 0
        if mask_attn is not None:
            n_mask = mask_attn.shape[1]
            x = jnp.concatenate(
                [jnp.broadcast_to(x[:, :1], (b, n_mask, self.width)), x], axis=1)
            t = n_mask + 1 + n_patch
            attn_mask = jnp.zeros((b, t, t), bool)
            # nobody attends TO mask tokens (:318-320)
            attn_mask = attn_mask.at[:, :, :n_mask].set(True)
            # mask tokens see only their in-mask patches (:322)
            attn_mask = attn_mask.at[:, :n_mask, n_mask + 1:].set(mask_attn)

        for i in range(self.layers):
            x = CLIPBlock(self.width, self.heads, dtype=self.dtype,
                          name=f"blocks_{i}")(x, attn_mask)
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.output_dim))
        if mask_attn is not None:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="ln_post")(x[:, :n_mask])
            return x.astype(jnp.float32) @ proj
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        return x.astype(jnp.float32) @ proj


class CLIPText(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        """(B, 77) -> (B, output_dim); causal transformer, EOT token pooled."""
        b, t = input_ids.shape
        x = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = x + pos[:t].astype(self.dtype)
        causal = jnp.triu(jnp.ones((t, t), bool), 1)[None]
        causal = jnp.broadcast_to(causal, (b, t, t))
        for i in range(self.layers):
            x = CLIPBlock(self.width, self.heads, dtype=self.dtype,
                          name=f"blocks_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(input_ids, axis=-1)         # EOT has the highest id
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.output_dim))
        return pooled.astype(jnp.float32) @ proj


def clip_preprocess(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """(B, H, W, 3) in [0, 1] -> CLIP-normalized (B, size, size, 3)."""
    x = jax.image.resize(images, (images.shape[0], size, size, 3), "bilinear")
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


def mask_attn_from_logits(mask_logits: jnp.ndarray, image_size: int,
                          patch_size: int) -> jnp.ndarray:
    """(B, Q, h, w) mask logits -> (B, Q, P) bool, True = patch BLOCKED.

    reference encode_image_with_mask: sigmoid -> resize to image -> max-pool to
    the patch grid -> blocked where max prob < 0.5.
    """
    b, q = mask_logits.shape[:2]
    probs = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    g = image_size // patch_size
    probs = jax.image.resize(probs, (b, q, image_size, image_size), "bilinear")
    pooled = probs.reshape(b, q, g, patch_size, g, patch_size).max((3, 5))
    return (pooled < 0.5).reshape(b, q, g * g)


def ensemble_logits_with_labels(logits: jnp.ndarray,
                                group_sizes: Sequence[int],
                                method: str = "max") -> jnp.ndarray:
    """Synonym-group ensembling of raw logits (helper.py:79-109).

    logits (..., sum(group_sizes)) -> (..., len(group_sizes)); the reference
    default is MAX over each group's logits (helper.py ensemble_method='max');
    'mean' averages the group's logits."""
    outs = []
    start = 0
    for g in group_sizes:
        chunk = logits[..., start:start + g]
        outs.append(chunk.max(-1) if method == "max" else chunk.mean(-1))
        start += g
    return jnp.stack(outs, axis=-1)


class MaskCLIP(nn.Module):
    """Visual tower + mask-pooled logits (frozen; params excluded from training)."""

    visual: CLIPVisual = None
    dtype: Any = jnp.float32

    def setup(self):
        self.vis = self.visual or CLIPVisual(dtype=self.dtype, name="visual")
        self.logit_scale = self.param("logit_scale",
                                      nn.initializers.constant(math.log(1 / 0.07)),
                                      ())

    def __call__(self, images01: jnp.ndarray, mask_logits: jnp.ndarray,
                 text_embed: jnp.ndarray, group_sizes: Sequence[int]):
        """images01 (B, H, W, 3) in [0,1]; mask_logits (B, Q, h, w);
        text_embed (T, C) for sum(group_sizes) == T prompts."""
        v = self.vis
        x = clip_preprocess(images01, v.image_size)
        attn = mask_attn_from_logits(mask_logits, v.image_size, v.patch_size)
        mask_embed = v(x, attn)                                   # (B, Q, C)
        me = mask_embed / jnp.clip(
            jnp.linalg.norm(mask_embed, axis=-1, keepdims=True), 1e-9)
        te = text_embed / jnp.clip(
            jnp.linalg.norm(text_embed, axis=-1, keepdims=True), 1e-9)
        scale = jnp.clip(jnp.exp(self.logit_scale), None, 100.0)
        logits = jnp.einsum("bqc,tc->bqt", me, te) * scale
        return ensemble_logits_with_labels(logits, group_sizes)


def clip_score_fusion(pred_prob: jnp.ndarray, clip_logits: jnp.ndarray,
                      category_overlap: jnp.ndarray, alpha: float = 0.35,
                      beta: float = 0.7, mode: str = "MUL") -> jnp.ndarray:
    """Base/novel geometric score ensemble (hipie_img.py get_clip_logits
    :811-868). pred_prob, clip output probs (Q, C); overlap (C,) 1 = seen in
    training. Returns fused LOGITS (log space, like the reference)."""
    if clip_logits.shape[-1] == 1:
        clip_prob = jax.nn.sigmoid(clip_logits)
    else:
        clip_prob = jax.nn.softmax(clip_logits, -1)
    ov = category_overlap.astype(jnp.float32)
    if mode == "ADD":
        base = jnp.log(pred_prob * (1 - alpha) + clip_prob * alpha + 1e-9) * ov
        novel = jnp.log(pred_prob * (1 - beta) + clip_prob * beta + 1e-9) * (1 - ov)
    else:
        base = jnp.log(jnp.clip(pred_prob ** (1 - alpha) * clip_prob ** alpha,
                                1e-9)) * ov
        novel = jnp.log(jnp.clip(pred_prob ** (1 - beta) * clip_prob ** beta,
                                 1e-9)) * (1 - ov)
    return base + novel


PROMPT_TEMPLATES = [
    "a photo of a {}.",
    "This is a photo of a {}",
    "There is a {} in the scene",
    "There is the {} in the scene",
    "a photo of a {} in the scene",
    "a photo of a small {}.",
    "a photo of a medium {}.",
    "a photo of a large {}.",
]
