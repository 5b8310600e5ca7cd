"""Backbone zoo + masked-backbone wrapper.

Replaces reference hipie/backbone/masked_backbone.py:10-44 (MaskedBackbone: run d2
backbone, downsample the padding mask per level) and
hipie/models/deformable_detr/backbone.py:112-129 (Joiner: attach sine position
embeddings per level).

TPU-native: the pad mask is a static-shape (B, H, W) bool array; per-level masks are
computed by strided slicing (exact equivalent of F.interpolate(mask, nearest) for
power-of-two strides), and sine embeddings are computed on device inside jit.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from hipie_tpu.config import BackboneConfig
from hipie_tpu.layers import sine_position_embedding_2d
from hipie_tpu.models.backbone.resnet import ResNet, TinyCNN, resnet_feature_channels
from hipie_tpu.models.backbone.vit import VIT_VARIANTS, ViTDet, vit_feature_channels


def build_backbone(cfg: BackboneConfig, dtype: Any):
    """Returns (flax module mapping NHWC image -> {resN: NHWC}, {resN: channels})."""
    name = cfg.name
    if name == "resnet50" or name.startswith("resnet"):
        depth = cfg.resnet_depth
        mod = ResNet(depth=depth, out_features=cfg.out_features,
                     freeze_at=cfg.frozen_stages + 1, dtype=dtype, name="backbone")
        chans = {k: v for k, v in resnet_feature_channels(depth).items()
                 if k in cfg.out_features}
        return mod, chans
    if name in VIT_VARIANTS:
        embed_dim, depth, num_heads, drop_path = VIT_VARIANTS[name]
        mod = ViTDet(
            img_size=cfg.vit_img_size, patch_size=cfg.vit_patch_size,
            embed_dim=embed_dim, depth=depth, num_heads=num_heads,
            drop_path_rate=drop_path, window_size=cfg.vit_window_size,
            use_rel_pos=cfg.vit_use_rel_pos, out_features=cfg.out_features,
            remat=cfg.vit_remat, dtype=dtype, name="backbone",
        )
        chans = {k: v for k, v in vit_feature_channels(embed_dim).items()
                 if k in cfg.out_features}
        return mod, chans
    if name.startswith("swin"):
        from hipie_tpu.models.backbone.swin import (SWIN_VARIANTS,
                                                    SwinTransformer,
                                                    swin_feature_channels)
        variant = name if name in SWIN_VARIANTS else "swin_tiny"
        embed, depths, heads, window = SWIN_VARIANTS[variant]
        mod = SwinTransformer(embed_dim=embed, depths=depths, num_heads=heads,
                              window_size=window, out_features=cfg.out_features,
                              dtype=dtype, name="backbone")
        chans = {k: v for k, v in swin_feature_channels(embed).items()
                 if k in cfg.out_features}
        return mod, chans
    if name.startswith("convnext"):
        from hipie_tpu.models.backbone.convnext import (CONVNEXT_VARIANTS,
                                                        ConvNeXt,
                                                        convnext_feature_channels)
        variant = name[len("convnext_"):] if "_" in name else "tiny"
        if variant not in CONVNEXT_VARIANTS:
            variant = "tiny"
        mod = ConvNeXt(variant=variant, out_features=cfg.out_features,
                       dtype=dtype, name="backbone")
        chans = {k: v for k, v in convnext_feature_channels(variant).items()
                 if k in cfg.out_features}
        return mod, chans
    if name == "resnet_tiny":
        mod = TinyCNN(width=8, out_features=cfg.out_features, dtype=dtype, name="backbone")
        return mod, {"res3": 16, "res4": 32, "res5": 64}
    raise ValueError(f"unknown backbone {name}")


FEATURE_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32, "res6": 64}


def downsample_mask(mask: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Nearest-downsample a (B, H, W) bool pad mask by an integer stride."""
    return mask[:, ::stride, ::stride]


def masked_features(
    features: Dict[str, jnp.ndarray],
    pad_mask: jnp.ndarray,               # (B, H, W) bool, True = PADDING
    num_pos_feats: int = 128,
) -> List[Tuple[str, jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Attach per-level pad masks + sine pos embeddings.

    Returns [(name, feat NHWC, mask (B,h,w), pos (B,h,w,2*num_pos_feats))] sorted by
    stride ascending (res3, res4, res5, ...).
    """
    out = []
    for name in sorted(features, key=lambda n: FEATURE_STRIDES[n]):
        feat = features[name]
        stride = FEATURE_STRIDES[name]
        m = downsample_mask(pad_mask, stride)
        # Feature maps may round sizes differently from strided slicing; crop/pad.
        h, w = feat.shape[1], feat.shape[2]
        m = m[:, :h, :w]
        if m.shape[1] < h or m.shape[2] < w:
            m = jnp.pad(m, ((0, 0), (0, h - m.shape[1]), (0, w - m.shape[2])),
                        constant_values=True)
        pos = sine_position_embedding_2d(m, num_pos_feats=num_pos_feats)
        out.append((name, feat, m, pos))
    return out
