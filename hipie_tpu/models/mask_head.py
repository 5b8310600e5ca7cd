"""CondInst-style dynamic-convolution mask head with FPN fusion.

Behavioral parity target: reference hipie/models/ddetrs_dn.py —
  * MaskHeadSmallConv (:1581-1689): FPN-fuse the three encoder memory maps
    (strides 8/16/32): top-down nearest-upsample adds, 3x3 convs (no norm),
    then two 3x3 convs reduce 256 -> 64 -> 8 mask-feature channels at stride 8.
  * dynamic_mask_with_coords (:1411-1502): per-query relative coordinates
    (reference point in valid-image pixels minus stride-8 grid locations,
    UN-normalized), concat with the 8 mask-feature channels, then a 3-layer
    per-query 1x1 conv stack whose weights come from the controller MLP
    (parse_dynamic_params :1806-1830), and aligned bilinear x2 upsample to
    stride 4 (aligned_bilinear :1832-1855).

TPU-first: the per-query grouped 1x1 convs become batched einsums over a FIXED
query count (B, Q, HW, C) — pure MXU batched matmuls, no groups, no dynamic
shapes. Relative-coordinate maps are built by broadcasting. aligned_bilinear
(align_corners=True, factor 2) is implemented exactly as interleaved pixel /
midpoint rows+cols with edge padding, matching the reference's pad/interp/crop
sequence numerically.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def dynamic_conv_param_sizes(in_channels: int, channels: int, num_layers: int,
                             rel_coord: bool) -> Tuple[List[int], List[int]]:
    """(weight_nums, bias_nums) for the controller output split.

    reference: ddetrs_dn.py:112-130. in_channels = hidden_dim // 32 (mask feature
    channels), channels = dynamic_mask_channels (8).
    """
    weight_nums, bias_nums = [], []
    for l in range(num_layers):
        if l == 0:
            cin = in_channels + 2 if rel_coord else in_channels
            weight_nums.append(cin * channels)
            bias_nums.append(channels)
        elif l == num_layers - 1:
            weight_nums.append(channels * 1)
            bias_nums.append(1)
        else:
            weight_nums.append(channels * channels)
            bias_nums.append(channels)
    return weight_nums, bias_nums


def aligned_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Upsample (B, H, W, C) by `factor` with the reference's aligned scheme.

    Equivalent to: replicate-pad bottom/right by 1, bilinear align_corners=True to
    (f*H+1, f*W+1), replicate-pad top/left by f//2, crop to (f*H, f*W).
    """
    if factor == 1:
        return x
    b, h, w, c = x.shape

    def upsample_axis(arr, axis, n):
        # align_corners=True from n+1 points to f*n+1 points: src coord = j / f.
        j = jnp.arange(factor * n + 1)
        j0 = j // factor
        t = (j % factor).astype(arr.dtype) / factor
        a0 = jnp.take(arr, jnp.clip(j0, 0, n), axis=axis)
        a1 = jnp.take(arr, jnp.clip(j0 + 1, 0, n), axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = -1
        return a0 + (a1 - a0) * t.reshape(shape)

    # replicate-pad bottom/right by 1 (so index n is valid).
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    x = upsample_axis(x, 1, h)
    x = upsample_axis(x, 2, w)
    # replicate-pad top/left by factor//2, crop to (f*h, f*w).
    p = factor // 2
    x = jnp.pad(x, ((0, 0), (p, 0), (p, 0), (0, 0)), mode="edge")
    return x[:, : factor * h, : factor * w]


class MaskFeatureHead(nn.Module):
    """FPN-fuse stride-8/16/32 encoder maps into stride-8 mask features."""

    dim: int = 256                   # transformer hidden dim
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: [stride8, stride16, stride32] NHWC maps with `dim` channels.

        Returns (fused_fpn (B, H8, W8, dim), mask_feats (B, H8, W8, dim // 32)).
        """
        f8, f16, f32 = feats

        def conv(x, ch, name):
            return nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name=name)(x)

        def up_nearest(x, hw):
            return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]), "nearest")

        y = nn.relu(conv(f32, self.dim, "lay3"))
        y = f16 + up_nearest(y, f16.shape[1:3])
        y = nn.relu(conv(y, self.dim, "lay4"))
        y = f8 + up_nearest(y, f8.shape[1:3])
        fused = nn.relu(conv(y, self.dim, "jia_dcn"))
        m = nn.relu(conv(fused, self.dim // 4, "lay1"))
        m = nn.relu(conv(m, self.dim // 32, "lay2"))
        return fused, m


def dynamic_mask_with_coords(
    mask_feats: jnp.ndarray,        # (B, H8, W8, Cm) stride-8 mask features
    reference_points: jnp.ndarray,  # (B, Q, 2) in VALID-image pixel coords
    controller_params: jnp.ndarray, # (B, Q, num_params)
    weight_nums: Sequence[int],
    bias_nums: Sequence[int],
    channels: int,
    mask_feat_stride: int = 8,
    mask_out_stride: int = 4,
    rel_coord: bool = True,
) -> jnp.ndarray:
    """Per-query dynamic 1x1 conv stack -> (B, Q, H4, W4) mask logits (stride 4)."""
    b, h, w, cm = mask_feats.shape
    q = reference_points.shape[1]
    num_layers = len(weight_nums)
    f32 = jnp.float32

    # stride-8 grid locations in image pixels (x, y), center offset = stride // 2.
    xs = jnp.arange(w, dtype=f32) * mask_feat_stride + mask_feat_stride // 2
    ys = jnp.arange(h, dtype=f32) * mask_feat_stride + mask_feat_stride // 2
    locs = jnp.stack(
        [jnp.broadcast_to(xs[None, :], (h, w)), jnp.broadcast_to(ys[:, None], (h, w))],
        axis=-1,
    ).reshape(h * w, 2)

    feats = mask_feats.reshape(b, h * w, cm).astype(f32)
    if rel_coord:
        rel = reference_points.astype(f32)[:, :, None, :] - locs[None, None]  # (B,Q,HW,2)
        x = jnp.concatenate(
            [rel, jnp.broadcast_to(feats[:, None], (b, q, h * w, cm))], axis=-1)
    else:
        x = jnp.broadcast_to(feats[:, None], (b, q, h * w, cm))

    # split controller params into per-layer weights/biases.
    params = controller_params.astype(f32)
    sizes = list(weight_nums) + list(bias_nums)
    offsets = [sum(sizes[: i + 1]) for i in range(len(sizes) - 1)]
    splits = list(jnp.split(params, offsets, axis=-1))
    w_splits, b_splits = splits[:num_layers], splits[num_layers:]
    for l in range(num_layers):
        c_out = channels if l < num_layers - 1 else 1
        wl = w_splits[l].reshape(b, q, c_out, -1)                 # (B, Q, Cout, Cin)
        bl = b_splits[l].reshape(b, q, 1, c_out)
        x = jnp.einsum("bqhc,bqoc->bqho", x, wl) + bl
        if l < num_layers - 1:
            x = nn.relu(x)

    logits = x.reshape(b * q, h, w, 1)
    logits = aligned_bilinear(logits, mask_feat_stride // mask_out_stride)
    oh, ow = logits.shape[1], logits.shape[2]
    return logits.reshape(b, q, oh, ow)
