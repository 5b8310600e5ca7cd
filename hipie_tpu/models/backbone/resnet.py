"""ResNet backbone (d2-style bottleneck ResNet-50) in flax, NHWC.

reference: detectron2/modeling/backbone/resnet.py (BasicStem + BottleneckBlock,
out_features res3/res4/res5 per projects/HIPIE/hipie/config.py:239, FrozenBN
throughout, FREEZE_AT=2 freezing stem+res2).

TPU notes: convs run in the configured compute dtype (bf16) and NHWC layout so XLA
maps them directly onto the MXU; FrozenBN folds into a fused scale+bias. Freezing is
implemented with stop_gradient at the res2 boundary (the network is sequential, so
this exactly reproduces "stem+res2 frozen").
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hipie_tpu.layers import FrozenBatchNorm


class BottleneckBlock(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dilation: int = 1
    has_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype, name="conv1_norm")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.bottleneck_channels, (3, 3), strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype, name="conv2_norm")(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="conv3_norm")(out)

        if self.has_shortcut:
            sc = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, self.stride),
                         use_bias=False, dtype=self.dtype, name="shortcut")(x)
            sc = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="shortcut_norm")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """d2 ResNet with FrozenBN. Returns {'res2'..'res5': NHWC feature maps}."""

    depth: int = 50
    stem_channels: int = 64
    base_channels: int = 256        # res2 output channels
    out_features: Tuple[str, ...] = ("res3", "res4", "res5")
    freeze_at: int = 2              # 0 = none, 1 = stem, 2 = stem+res2 (d2 default)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        blocks_per_stage = {
            18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
            101: (3, 4, 23, 3), 152: (3, 8, 36, 3),
        }[self.depth]

        x = x.astype(self.dtype)
        # Stem: 7x7/2 conv + FrozenBN + relu + 3x3/2 maxpool.
        x = nn.Conv(self.stem_channels, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv1")(x)
        x = FrozenBatchNorm(self.stem_channels, dtype=self.dtype, name="stem_conv1_norm")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        outputs: Dict[str, jnp.ndarray] = {}
        out_ch = self.base_channels
        bottleneck_ch = self.base_channels // 4
        for stage_idx, num_blocks in enumerate(blocks_per_stage):
            name = f"res{stage_idx + 2}"
            stride = 1 if stage_idx == 0 else 2
            for i in range(num_blocks):
                x = BottleneckBlock(
                    out_channels=out_ch,
                    bottleneck_channels=bottleneck_ch,
                    stride=stride if i == 0 else 1,
                    has_shortcut=(i == 0),
                    dtype=self.dtype,
                    name=f"{name}_{i}",
                )(x)
            if self.freeze_at >= stage_idx + 2:
                x = jax.lax.stop_gradient(x)
            if name in self.out_features:
                outputs[name] = x
            out_ch *= 2
            bottleneck_ch *= 2
        return outputs


class TinyCNN(nn.Module):
    """Miniature 3-level CNN standing in for ResNet in unit tests.

    Produces res3/res4/res5-shaped outputs (strides 8/16/32) with `width` channels
    doubling per level, so the whole HIPIE stack can be exercised on CPU quickly.
    """

    width: int = 16
    out_features: Tuple[str, ...] = ("res3", "res4", "res5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        outputs = {}
        ch = self.width
        x = nn.Conv(ch, (3, 3), strides=(4, 4), padding="SAME", dtype=self.dtype, name="stem")(x)
        x = nn.relu(x)
        for i, name in enumerate(["res3", "res4", "res5"]):
            ch *= 2
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype,
                        name=f"layer{i}")(x)
            x = nn.relu(x)
            if name in self.out_features:
                outputs[name] = x
        return outputs


BACKBONE_FEATURE_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}


def resnet_feature_channels(depth: int, base_channels: int = 256) -> Dict[str, int]:
    return {f"res{i + 2}": base_channels * (2 ** i) for i in range(4)}
