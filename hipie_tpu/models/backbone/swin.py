"""Swin Transformer backbone, flax/NHWC.

Behavioral parity target: reference hipie/backbone/swin.py:498-770
(D2SwinTransformer): patch embed 4x4, 4 stages with patch merging, windowed
W-MSA/SW-MSA (window 7, shifted by 3), relative position bias table, returns
res2..res5-style maps (strides 4/8/16/32; HIPIE uses res3-5).

TPU notes: window partition/shift are reshapes + jnp.roll (static); attention
batches all windows into one (B*nW, 49, C) matmul; rel-pos bias is a table
lookup precomputed per window size.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hipie_tpu.layers import DropPath, gelu
from hipie_tpu.models.backbone.vit import window_partition, window_unpartition


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class SwinAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: (nW*B, ws*ws, C); attn_mask: (nW, ws*ws, ws*ws) additive or None."""
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * (d ** -0.5)
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * self.window_size - 1) ** 2, h))
        idx = jnp.asarray(relative_position_index(self.window_size))
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        logits = logits + bias[None].astype(jnp.float32)
        if attn_mask is not None:
            nw = attn_mask.shape[0]
            logits = logits.reshape(b // nw, nw, h, n, n) + \
                attn_mask[None, :, None].astype(jnp.float32)
            logits = logits.reshape(b, h, n, n)
        attn = jax.nn.softmax(logits, -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        """x: (B, H, W, C)."""
        b, H, W, c = x.shape
        ws = self.window_size
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        yw, padded = window_partition(y, ws)
        attn_mask = None
        if self.shift > 0:
            hp, wp = padded
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -self.shift), slice(-self.shift, None)):
                for wslice in (slice(0, -ws), slice(-ws, -self.shift),
                               slice(-self.shift, None)):
                    img_mask[:, hs, wslice] = cnt
                    cnt += 1
            mw = img_mask.reshape(1, hp // ws, ws, wp // ws, ws, 1)
            mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
            am = (mw[:, None, :] != mw[:, :, None]) * -100.0
            attn_mask = jnp.asarray(am, jnp.float32)
        yw = yw.reshape(yw.shape[0], ws * ws, c)
        yw = SwinAttention(self.dim, self.num_heads, ws, dtype=self.dtype,
                           name="attn")(yw, attn_mask)
        y = window_unpartition(yw.reshape(-1, ws, ws, c), ws, padded, (H, W))
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + DropPath(self.drop_path, name="dp1")(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, deterministic)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    drop_path_rate: float = 0.2
    out_features: Tuple[str, ...] = ("res3", "res4", "res5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        outputs = {}
        bi = 0
        dim = self.embed_dim
        for s, depth in enumerate(self.depths):
            for i in range(depth):
                x = SwinBlock(dim, self.num_heads[s], self.window_size,
                              shift=0 if i % 2 == 0 else self.window_size // 2,
                              drop_path=dpr[bi], dtype=self.dtype,
                              name=f"stage{s}_block{i}")(x, deterministic)
                bi += 1
            name = f"res{s + 2}"
            if name in self.out_features:
                outputs[name] = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                             name=f"out_norm{s}")(x)
            if s < len(self.depths) - 1:
                # patch merging: 2x2 -> 4C -> LN -> Dense(2C)
                b, h, w, c = x.shape
                hp, wp = h // 2 * 2, w // 2 * 2
                x = x[:, :hp, :wp]
                x = x.reshape(b, hp // 2, 2, wp // 2, 2, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"merge_norm{s}")(x)
                x = nn.Dense(2 * dim, use_bias=False, dtype=self.dtype,
                             name=f"merge_reduce{s}")(x)
                dim *= 2
        return outputs


def swin_feature_channels(embed_dim: int = 96) -> Dict[str, int]:
    return {f"res{i + 2}": embed_dim * (2 ** i) for i in range(4)}


SWIN_VARIANTS = {
    # name: (embed_dim, depths, num_heads, window) — reference
    # hipie/backbone/swin.py:498-770 D2SwinTransformer configs
    "swin_tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24), 7),
    "swin_small": (96, (2, 2, 18, 2), (3, 6, 12, 24), 7),
    "swin_base": (128, (2, 2, 18, 2), (4, 8, 16, 32), 12),
    "swin_large": (192, (2, 2, 18, 2), (6, 12, 24, 48), 12),
}
