"""ViTDet backbone (plain ViT + windowed attention + simple feature pyramid), flax/NHWC.

Behavioral parity target: reference projects/HIPIE/hipie/backbone/vit.py:233-466 (ViT/D2ViT)
and hipie/backbone/utils.py (window partition, decomposed relative position). Key facts
reproduced from the reference:

  * patch 16, abs pos embed interpolated from the 224-pretrain grid (cls token dropped),
    decomposed relative position bias added inside every attention block.
  * `window_block_indexes=[0,1,3,4,6,7,9,10]` REGARDLESS of depth (vit.py:416-426) — so
    for ViT-H (depth 32) blocks 2,5,8,11 and 12..31 all run global attention. We keep
    this quirk (configurable) because the released weights were trained with it.
  * simple feature pyramid from the single stride-16 map: res3 = 2x transposed conv
    (embed//2 ch), res4 = identity, res5 = 2x2 maxpool (vit.py:343-349).

TPU-first design notes:
  * NHWC throughout; window partition is pure reshape/transpose (static shapes), so all
    blocks batch into big (B*nW, 196, C) matmuls on the MXU.
  * Attention logits and rel-pos addition run in fp32; everything else in the configured
    compute dtype (bf16).
  * Optional `remat` wraps each block in jax.checkpoint (reference uses fairscale
    checkpoint_wrapper, vit.py:327).
  * Model-parallel sharding: attention heads and MLP hidden dim carry logical sharding
    constraints on the `model` mesh axis (applied by hipie_tpu/parallel/sharding.py at
    the param level; activations follow from XLA propagation).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hipie_tpu.layers import DropPath, gelu


def resize_abs_pos(pos_embed: jnp.ndarray, has_cls_token: bool, hw: Tuple[int, int]) -> jnp.ndarray:
    """Interpolate (1, N[+1], C) pretrain pos embed to an (H, W) grid -> (1, H, W, C)."""
    h, w = hw
    if has_cls_token:
        pos_embed = pos_embed[:, 1:]
    n = pos_embed.shape[1]
    size = int(round(math.sqrt(n)))
    assert size * size == n, f"pos embed length {n} is not square"
    grid = pos_embed.reshape(1, size, size, -1)
    if (size, size) != (h, w):
        grid = jax.image.resize(grid.astype(jnp.float32), (1, h, w, grid.shape[-1]), "bicubic")
    return grid


def window_partition(x: jnp.ndarray, ws: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C) with zero padding to multiples of ws."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(x: jnp.ndarray, ws: int, padded_hw: Tuple[int, int], hw: Tuple[int, int]):
    hp, wp = padded_hw
    h, w = hw
    b = x.shape[0] // (hp // ws * wp // ws)
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Slice/interpolate a (2*L-1, head_dim) rel-pos table to (q_size, k_size, dim)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32), (max_rel_dist, rel_pos.shape[1]), "linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_hw, k_hw):
    """Add decomposed rel-pos bias (ViTDet) to attention logits.

    attn: (B, q_h*q_w, k_h*k_w) fp32; q: (B, q_h*q_w, dim).
    """
    q_h, q_w = q_hw
    k_h, k_w = k_hw
    rh = get_rel_pos(q_h, k_h, rel_pos_h).astype(q.dtype)   # (q_h, k_h, dim)
    rw = get_rel_pos(q_w, k_w, rel_pos_w).astype(q.dtype)
    b = q.shape[0]
    r_q = q.reshape(b, q_h, q_w, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = attn.reshape(b, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(b, q_h * q_w, k_h * k_w)


class ViTAttention(nn.Module):
    """ViTDet attention with fused qkv projection and optional decomposed rel-pos.

    Large global blocks route through the fused Pallas flash kernel
    (ops/pallas/vit_attention_kernel.py) which folds the decomposed rel-pos
    bias into the QK^T contraction and never materializes the (heads, N, N)
    logits; small/windowed blocks use the plain XLA path.
    """

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, nh, hd)
        q, k, v = [jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)).reshape(b * nh, h * w, hd)
                   for i in range(3)]

        rel_pos_h = rel_pos_w = None
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd))
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd))

        use_flash = (
            self.dtype == jnp.bfloat16 and self.use_rel_pos
            and h * w >= 1024 and (h * w) % 256 == 0
            and jax.default_backend() == "tpu"
        )
        # HIPIE_VIT_ATTN=xla|flash: in-program A/B override (read at trace
        # time, like HIPIE_MSDA_METHOD) — standalone microbenches mislead on
        # this platform, so kernel comparisons run through the full bench.
        _ov = os.environ.get("HIPIE_VIT_ATTN", "")
        if _ov == "xla":
            use_flash = False
        elif _ov == "flash" and jax.default_backend() == "tpu":
            use_flash = self.use_rel_pos and (h * w) % 256 == 0
        if use_flash:
            from hipie_tpu.ops.pallas.vit_attention_kernel import vit_global_attention

            rh = get_rel_pos(h, h, rel_pos_h).astype(q.dtype)     # (h, h, hd)
            rw = get_rel_pos(w, w, rel_pos_w).astype(q.dtype)
            r_q = q.reshape(b * nh, h, w, hd)
            rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh).reshape(b * nh, h * w, h)
            rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw).reshape(b * nh, h * w, w)
            out = vit_global_attention(q, k, v, rel_h, rel_w, hd ** -0.5)
        else:
            # logits stay in the compute dtype (bf16): the reference runs the
            # ViT under fp16 AMP, so bf16 here is at least as precise while
            # halving the dominant HBM traffic.
            attn = jnp.einsum("bqd,bkd->bqk", q, k) * (hd ** -0.5)
            if self.use_rel_pos:
                attn = add_decomposed_rel_pos(
                    attn, q, rel_pos_h, rel_pos_w, (h, w), (h, w))
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bqk,bkd->bqd", attn, v)
        out = out.reshape(b, nh, h * w, hd).transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    use_rel_pos: bool = True
    window_size: int = 0            # 0 = global attention
    input_size: Tuple[int, int] = (64, 64)
    dtype: Any = jnp.float32

    def _drop_path(self, y, rate, deterministic):
        if deterministic:
            return y
        keep = 1.0 - rate
        rng = self.make_rng("dropout")
        shape = (y.shape[0],) + (1,) * (y.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        # compute the keep-rescale in f32 then cast: dividing y (bf16) by the
        # f32 traced `keep` would promote the residual to f32 and break the
        # scan carry dtype (bf16 in / f32 out).
        scale = (mask.astype(jnp.float32) / jnp.maximum(keep, 1e-6)).astype(y.dtype)
        return y * scale

    @nn.compact
    def __call__(self, x, deterministic: bool = True, drop_path_rate=None):
        rate = self.drop_path if drop_path_rate is None else drop_path_rate
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            hw = (y.shape[1], y.shape[2])
            y, padded = window_partition(y, self.window_size)
            size = (self.window_size, self.window_size)
        else:
            size = self.input_size
        y = ViTAttention(
            self.dim, self.num_heads, use_rel_pos=self.use_rel_pos,
            input_size=size, dtype=self.dtype, name="attn",
        )(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, padded, hw)
        x = shortcut + self._drop_path(y, rate, deterministic)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")(y)
        y = gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + self._drop_path(y, rate, deterministic)


class _ViTBlockScanBody(nn.Module):
    """Scan body for a contiguous run of same-window-size ViT blocks: the 20
    global blocks of ViT-H compile once instead of 20 times."""

    dim: int
    num_heads: int
    mlp_ratio: float
    use_rel_pos: bool
    window_size: int
    input_size: Tuple[int, int]
    deterministic: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rate):
        x = ViTBlock(
            dim=self.dim, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            use_rel_pos=self.use_rel_pos, window_size=self.window_size,
            input_size=self.input_size, dtype=self.dtype, name="block",
        )(x, self.deterministic, rate)
        return x, None


class ViTDet(nn.Module):
    """Plain-ViT detection backbone. Input NHWC image, output {res3, res4, res5}."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    window_size: int = 14
    window_block_indexes: Tuple[int, ...] = (0, 1, 3, 4, 6, 7, 9, 10)
    use_rel_pos: bool = True
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    out_features: Tuple[str, ...] = ("res3", "res4", "res5")
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), dtype=self.dtype,
                    name="patch_embed")(x)
        n_pre = (self.pretrain_img_size // self.patch_size) ** 2
        n_pos = n_pre + 1 if self.pretrain_use_cls_token else n_pre
        pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02), (1, n_pos, self.embed_dim))
        x = x + resize_abs_pos(
            pos_embed, self.pretrain_use_cls_token, (x.shape[1], x.shape[2])
        ).astype(self.dtype)

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        # group contiguous same-window-size blocks and nn.scan each run.
        runs = []         # (start, length, window_size)
        i = 0
        while i < self.depth:
            ws = self.window_size if i in self.window_block_indexes else 0
            j = i
            while j < self.depth and \
                    (self.window_size if j in self.window_block_indexes else 0) == ws:
                j += 1
            runs.append((i, j - i, ws))
            i = j
        input_size = (self.img_size // self.patch_size,) * 2
        for start, length, ws in runs:
            body = _ViTBlockScanBody
            if self.remat:
                body = nn.remat(_ViTBlockScanBody)
            scan = nn.scan(body, variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True},
                           length=length)
            rates = jnp.asarray(dpr[start:start + length], jnp.float32)
            x, _ = scan(
                dim=self.embed_dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, use_rel_pos=self.use_rel_pos,
                window_size=ws, input_size=input_size,
                deterministic=deterministic, dtype=self.dtype,
                name=f"run_{start}",
            )(x, rates)

        outputs = {}
        if "res3" in self.out_features:
            outputs["res3"] = nn.ConvTranspose(
                self.embed_dim // 2, (2, 2), strides=(2, 2), dtype=self.dtype, name="fpn1")(x)
        if "res4" in self.out_features:
            outputs["res4"] = x
        if "res5" in self.out_features:
            outputs["res5"] = nn.max_pool(x, (2, 2), strides=(2, 2))
        return outputs


VIT_VARIANTS = {
    # name: (embed_dim, depth, num_heads, drop_path) — reference vit.py:386-398
    "vit_base": (768, 12, 12, 0.1),
    "vit_large": (1024, 24, 16, 0.4),
    "vit_huge": (1280, 32, 16, 0.5),
}


def vit_feature_channels(embed_dim: int):
    return {"res3": embed_dim // 2, "res4": embed_dim, "res5": embed_dim}
