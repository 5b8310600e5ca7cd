"""Swin / ConvNeXt weight converters + smoke configs (VERDICT r1 missing #9).

The patch-merging channel-order test builds the torch concat order in numpy
and checks our reshape path with converted (permuted) weights produces the
SAME output — the subtle part of the Swin conversion.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _ln(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def test_swin_patch_merge_order_parity():
    from hipie_tpu.utils.converter import convert_swin

    r = np.random.RandomState(0)
    c = 8
    x = r.randn(1, 4, 4, c).astype(np.float32)

    # torch PatchMerging: cat([x(0::2,0::2), x(1::2,0::2), x(0::2,1::2),
    # x(1::2,1::2)]) -> LN -> Linear(4c, 2c)
    cat_t = np.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                            x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
    w_norm = r.rand(4 * c).astype(np.float32) + 0.5
    b_norm = r.randn(4 * c).astype(np.float32)
    w_red = r.randn(2 * c, 4 * c).astype(np.float32)   # torch (out, in)
    ref = _ln(cat_t, w_norm, b_norm) @ w_red.T

    # our order: reshape (2(dy), 2(dx)) -> [(0,0),(0,1),(1,0),(1,1)]
    b, h, w_, _ = x.shape
    xo = x.reshape(b, 2, 2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, 2, 2, 4 * c)

    sd = {"layers.0.downsample.norm.weight": w_norm,
          "layers.0.downsample.norm.bias": b_norm,
          "layers.0.downsample.reduction.weight": w_red,
          "patch_embed.proj.weight": r.randn(c, 3, 4, 4).astype(np.float32),
          "patch_embed.proj.bias": np.zeros(c, np.float32),
          "patch_embed.norm.weight": np.ones(c, np.float32),
          "patch_embed.norm.bias": np.zeros(c, np.float32)}
    conv = convert_swin(sd, depths=(0,))
    mn = conv["merge_norm0"]
    mr = conv["merge_reduce0"]
    ours = _ln(xo, mn["scale"], mn["bias"]) @ mr["kernel"]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_convert_swin_applies():
    from hipie_tpu.models.backbone.swin import SwinTransformer
    from hipie_tpu.utils.converter import convert_swin

    r = np.random.RandomState(0)
    depths, heads, embed, ws = (1, 1), (2, 4), 16, 4
    sd = {"patch_embed.proj.weight": r.randn(embed, 3, 4, 4).astype(np.float32),
          "patch_embed.proj.bias": r.randn(embed).astype(np.float32),
          "patch_embed.norm.weight": np.ones(embed, np.float32),
          "patch_embed.norm.bias": np.zeros(embed, np.float32)}
    dim = embed
    for s, d in enumerate(depths):
        for i in range(d):
            p = f"layers.{s}.blocks.{i}"
            sd[f"{p}.norm1.weight"] = np.ones(dim, np.float32)
            sd[f"{p}.norm1.bias"] = np.zeros(dim, np.float32)
            sd[f"{p}.norm2.weight"] = np.ones(dim, np.float32)
            sd[f"{p}.norm2.bias"] = np.zeros(dim, np.float32)
            sd[f"{p}.attn.qkv.weight"] = r.randn(3 * dim, dim).astype(np.float32)
            sd[f"{p}.attn.qkv.bias"] = r.randn(3 * dim).astype(np.float32)
            sd[f"{p}.attn.proj.weight"] = r.randn(dim, dim).astype(np.float32)
            sd[f"{p}.attn.proj.bias"] = r.randn(dim).astype(np.float32)
            sd[f"{p}.attn.relative_position_bias_table"] = r.randn(
                (2 * ws - 1) ** 2, heads[s]).astype(np.float32)
            sd[f"{p}.mlp.fc1.weight"] = r.randn(4 * dim, dim).astype(np.float32)
            sd[f"{p}.mlp.fc1.bias"] = r.randn(4 * dim).astype(np.float32)
            sd[f"{p}.mlp.fc2.weight"] = r.randn(dim, 4 * dim).astype(np.float32)
            sd[f"{p}.mlp.fc2.bias"] = r.randn(dim).astype(np.float32)
        if s == 0:
            sd[f"layers.{s}.downsample.norm.weight"] = np.ones(4 * dim, np.float32)
            sd[f"layers.{s}.downsample.norm.bias"] = np.zeros(4 * dim, np.float32)
            sd[f"layers.{s}.downsample.reduction.weight"] = r.randn(
                2 * dim, 4 * dim).astype(np.float32)
            dim *= 2
    sd["norm0.weight"] = np.ones(embed, np.float32)
    sd["norm0.bias"] = np.zeros(embed, np.float32)
    sd["norm1.weight"] = np.ones(2 * embed, np.float32)
    sd["norm1.bias"] = np.zeros(2 * embed, np.float32)

    params = convert_swin(sd, depths)
    mod = SwinTransformer(embed_dim=embed, depths=depths, num_heads=heads,
                          window_size=ws, out_features=("res2", "res3"))
    x = jnp.asarray(r.randn(1, 32, 32, 3).astype(np.float32))
    out = mod.apply({"params": params}, x)
    assert out["res2"].shape == (1, 8, 8, embed)
    assert out["res3"].shape == (1, 4, 4, 2 * embed)
    assert np.isfinite(np.asarray(out["res3"])).all()


def test_convert_convnext_applies():
    from hipie_tpu.models.backbone.convnext import ConvNeXt
    from hipie_tpu.utils.converter import convert_convnext

    r = np.random.RandomState(0)
    depths = (1, 1, 1, 1)
    dims = (96, 192, 384, 768)
    sd = {"downsample_layers.0.0.weight": r.randn(dims[0], 3, 4, 4).astype(np.float32),
          "downsample_layers.0.0.bias": r.randn(dims[0]).astype(np.float32),
          "downsample_layers.0.1.weight": np.ones(dims[0], np.float32),
          "downsample_layers.0.1.bias": np.zeros(dims[0], np.float32)}
    for s in range(1, 4):
        sd[f"downsample_layers.{s}.0.weight"] = np.ones(dims[s - 1], np.float32)
        sd[f"downsample_layers.{s}.0.bias"] = np.zeros(dims[s - 1], np.float32)
        sd[f"downsample_layers.{s}.1.weight"] = r.randn(
            dims[s], dims[s - 1], 2, 2).astype(np.float32)
        sd[f"downsample_layers.{s}.1.bias"] = r.randn(dims[s]).astype(np.float32)
    for s in range(4):
        p = f"stages.{s}.0"
        sd[f"{p}.dwconv.weight"] = r.randn(dims[s], 1, 7, 7).astype(np.float32)
        sd[f"{p}.dwconv.bias"] = r.randn(dims[s]).astype(np.float32)
        sd[f"{p}.norm.weight"] = np.ones(dims[s], np.float32)
        sd[f"{p}.norm.bias"] = np.zeros(dims[s], np.float32)
        sd[f"{p}.pwconv1.weight"] = r.randn(4 * dims[s], dims[s]).astype(np.float32)
        sd[f"{p}.pwconv1.bias"] = r.randn(4 * dims[s]).astype(np.float32)
        sd[f"{p}.pwconv2.weight"] = r.randn(dims[s], 4 * dims[s]).astype(np.float32)
        sd[f"{p}.pwconv2.bias"] = r.randn(dims[s]).astype(np.float32)
        sd[f"{p}.gamma"] = np.full(dims[s], 1e-6, np.float32)
        sd[f"norm{s}.weight"] = np.ones(dims[s], np.float32)
        sd[f"norm{s}.bias"] = np.zeros(dims[s], np.float32)

    params = convert_convnext(sd, depths)
    # our module needs a 'dp' (DropPath) submodule entry? it has no params.
    mod = ConvNeXt(variant="tiny_test", out_features=("res3", "res4", "res5"))
    # register the 1-block variant for the test
    from hipie_tpu.models.backbone.convnext import CONVNEXT_VARIANTS
    CONVNEXT_VARIANTS["tiny_test"] = (depths, dims)
    x = jnp.asarray(r.randn(1, 64, 64, 3).astype(np.float32))
    out = mod.apply({"params": params}, x)
    assert out["res5"].shape == (1, 2, 2, dims[3])
    assert np.isfinite(np.asarray(out["res5"])).all()


def test_swin_convnext_presets_build():
    from hipie_tpu import presets
    cfg = presets.swin_large_coco_panoptic()
    assert cfg.model.backbone.name == "swin_large"
    cfg2 = presets.convnext_large_coco_panoptic()
    assert cfg2.model.backbone.name == "convnext_large"
    from hipie_tpu.models.backbone import build_backbone
    mod, chans = build_backbone(cfg.model.backbone, jnp.float32)
    assert chans["res5"] == 192 * 8
    mod2, chans2 = build_backbone(cfg2.model.backbone, jnp.float32)
    assert chans2["res5"] == 1536
