"""Core neural-net building blocks shared across all hipie_tpu models.

flax.linen equivalents of the torch primitives the reference composes everywhere
(reference: projects/HIPIE/hipie/models/deformable_detr/deformable_detr.py MLP,
detectron2/layers/batch_norm.py FrozenBatchNorm2d, torch.nn.MultiheadAttention).

Conventions:
  * All images/feature maps are NHWC (TPU-native layout; XLA convs prefer it).
  * Params are stored fp32; `dtype` selects the compute precision (bf16 default in
    model configs). Logits/sampling-sensitive math is explicitly cast to fp32 at the
    call sites that need it.
  * Module/param naming mirrors the reference's module paths loosely so that the
    torch->jax checkpoint converter (hipie_tpu/utils/converter.py) can be a pure
    name-map.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with a precision-aware approximation choice.

    The reference uses torch.nn.GELU() (exact erf) everywhere. On TPU the erf
    expansion does NOT fuse into the surrounding matmuls the way the tanh
    polynomial does: at ViT-H MLP shapes (4096x1280x5120, bf16) exact erf costs
    ~0.7 ms/block extra while tanh is free (tools/microbench_vit_mlp.py, v5e).
    Across ViT-H's 32 blocks that is ~20 ms/image of pure epilogue overhead.

    Numerics: on the main mass (|gelu(x)| >= 0.05) the tanh approximation is
    within ONE bf16 ulp of exact — indistinguishable after output rounding; in
    the tiny-output negative tail (x in ~[-4,-1], |y| < 0.05) the ~3e-4
    absolute error reaches a few ulps of those near-zero values (unit test:
    tests/test_layers.py::test_gelu_tanh_within_bf16_rounding). fp32 compute
    keeps exact erf for bit-parity with the converter/parity harness.

    Override for A/B: HIPIE_GELU=exact|tanh (read at trace time, like
    HIPIE_MSDA_METHOD).
    """
    ov = os.environ.get("HIPIE_GELU", "")
    if ov == "exact":
        return nn.gelu(x, approximate=False)
    if ov == "tanh":
        return nn.gelu(x, approximate=True)
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


class MLP(nn.Module):
    """N-layer perceptron with ReLU, as used for box heads and controllers.

    reference: deformable_detr.py:976-990 (MLP), ddetrs_dn.py:133 controller.
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            dim = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics, folded into a scale+bias at call time.

    reference: detectron2/layers/batch_norm.py FrozenBatchNorm2d — used throughout
    the ResNet backbone. Parameters (weight, bias, running_mean, running_var) are
    stored as non-trainable variables in the `params` collection so the checkpoint
    converter can fill them; gradients through them are simply unused.
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        # frozen buffers: gradients must not flow into them (the optimizer also
        # excludes them — train/optimizer.py frozen_prefixes)
        weight, bias, mean, var = jax.lax.stop_gradient((weight, bias, mean, var))
        scale = weight * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * scale
        return (x * scale.astype(self.dtype) + shift.astype(self.dtype)).astype(x.dtype)


class ConvGN(nn.Module):
    """Conv2D + GroupNorm(32), the reference's input-projection building block.

    reference: deformable_detr.py:221-242 (input_proj: Conv2d 1x1 + GroupNorm(32)).
    Input/output NHWC.
    """

    features: int
    kernel_size: int = 1
    strides: int = 1
    groups: int = 32
    # the reference's MaskDINO FPN lateral/output convs are d2 Conv2d with
    # norm != "" → bias=False (maskdino_encoder.py:316-331); input_proj convs
    # (plain nn.Conv2d) keep their bias.
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # explicit symmetric k//2 padding (torch Conv2d padding=k//2 semantics);
        # "SAME" diverges for strided convs (asymmetric 0/1 pad at even sizes).
        p = self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype, name="gn")(x)
        return x


class MultiHeadAttention(nn.Module):
    """Standard multi-head attention matching torch.nn.MultiheadAttention semantics.

    Used for decoder self-attention (deformable_transformer_dino.py:432-452), ViT
    blocks, BERT layers, and BiMultiHeadAttention is a separate module. Exposes an
    additive attention mask (True = BLOCKED, matching torch's bool attn_mask) and a
    key padding mask (True = PAD).
    """

    num_heads: int
    head_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,                      # (..., Q, C)
        key=None,                   # (..., K, C)
        value=None,
        attn_mask=None,             # (Q, K) or (..., [heads,] Q, K) bool, True = blocked
        key_padding_mask=None,      # (..., K) bool, True = pad
    ):
        if key is None:
            key = query
        if value is None:
            value = key
        c = query.shape[-1]
        h = self.num_heads
        d = self.head_dim or c // h
        out_dim = self.out_dim or c

        q = nn.DenseGeneral((h, d), dtype=self.dtype, name="q_proj")(query)
        k = nn.DenseGeneral((h, d), dtype=self.dtype, name="k_proj")(key)
        v = nn.DenseGeneral((h, d), dtype=self.dtype, name="v_proj")(value)

        logits = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32)
        logits = logits / math.sqrt(d)
        neg = jnp.finfo(jnp.float32).min
        if attn_mask is not None:
            if attn_mask.ndim == 2:
                mask = attn_mask[None, None]
            elif attn_mask.ndim == 3:
                mask = attn_mask[:, None]
            else:
                mask = attn_mask
            logits = jnp.where(mask, neg, logits)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[..., None, None, :], neg, logits)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        out = nn.DenseGeneral(out_dim, axis=(-2, -1), dtype=self.dtype, name="out_proj")(out)
        return out


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual drop). Identity when deterministic.

    reference: timm DropPath used by ViT/Swin/ConvNeXt backbones.
    """

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask.astype(x.dtype) / keep


def sine_position_embedding_2d(
    mask: jnp.ndarray,              # (B, H, W) bool, True = PADDING
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: Optional[float] = None,
    offset: float = -0.5,
) -> jnp.ndarray:
    """Sine/cosine 2D position embedding over the non-padded region.

    reference: hipie/models/deformable_detr/position_encoding.py
    PositionEmbeddingSine (offset=-0.5 variant used by the deformable transformer).
    Returns (B, H, W, 2*num_pos_feats).
    """
    if scale is None:
        scale = 2 * math.pi
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(pos_x.shape[:3] + (-1,))
    pos_y = pos_y.reshape(pos_y.shape[:3] + (-1,))
    return jnp.concatenate([pos_y, pos_x], axis=-1)
