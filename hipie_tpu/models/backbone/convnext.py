"""ConvNeXt backbone, flax/NHWC.

Behavioral parity target: reference hipie/backbone/convnext.py:60-264
(D2ConvNeXt): 4x4 stem, 4 stages of depthwise-7x7 + LN + pointwise MLP blocks
with layer scale, per-output LayerNorm heads, strides 4/8/16/32.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from hipie_tpu.layers import DropPath, gelu

CONVNEXT_VARIANTS = {
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        shortcut = x
        y = nn.Conv(self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        y = y * gamma.astype(y.dtype)
        return shortcut + DropPath(self.drop_path, name="dp")(y, deterministic)


class ConvNeXt(nn.Module):
    variant: str = "tiny"
    drop_path_rate: float = 0.0
    out_features: Tuple[str, ...] = ("res3", "res4", "res5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        depths, dims = CONVNEXT_VARIANTS[self.variant]
        x = x.astype(self.dtype)
        total = sum(depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        outputs = {}
        bi = 0
        for s in range(4):
            if s == 0:
                x = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                            name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"down_norm{s}")(x)
                x = nn.Conv(dims[s], (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down_conv{s}")(x)
            for i in range(depths[s]):
                x = ConvNeXtBlock(dims[s], drop_path=dpr[bi], dtype=self.dtype,
                                  name=f"stage{s}_block{i}")(x, deterministic)
                bi += 1
            name = f"res{s + 2}"
            if name in self.out_features:
                outputs[name] = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                             name=f"out_norm{s}")(x)
        return outputs


def convnext_feature_channels(variant: str = "tiny") -> Dict[str, int]:
    dims = CONVNEXT_VARIANTS[variant][1]
    return {f"res{i + 2}": dims[i] for i in range(4)}
