"""Numerics tests for core layers against torch reference semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.fast  # curated inner-loop tier (tests/conftest.py)


def test_aligned_bilinear_matches_reference_algorithm():
    """Reproduce the reference aligned_bilinear (ddetrs_dn.py:1832-1855) in torch
    and compare."""
    import torch
    import torch.nn.functional as F

    def torch_aligned_bilinear(tensor, factor):
        h, w = tensor.shape[2:]
        tensor = F.pad(tensor, pad=(0, 1, 0, 1), mode="replicate")
        oh, ow = factor * h + 1, factor * w + 1
        tensor = F.interpolate(tensor, size=(oh, ow), mode="bilinear",
                               align_corners=True)
        tensor = F.pad(tensor, pad=(factor // 2, 0, factor // 2, 0), mode="replicate")
        return tensor[:, :, : oh - 1, : ow - 1]

    from hipie_tpu.models.mask_head import aligned_bilinear

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 7, 5).astype(np.float32)
    for factor in (1, 2, 4):
        ref = torch_aligned_bilinear(torch.from_numpy(x), factor).numpy()
        got = aligned_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), factor)
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, atol=1e-5, err_msg=f"factor={factor}")


def test_multihead_attention_matches_torch():
    import torch

    torch.manual_seed(0)
    c, h = 32, 4
    mha = torch.nn.MultiheadAttention(c, h, batch_first=True).eval()

    from hipie_tpu.layers import MultiHeadAttention
    from hipie_tpu.utils.converter import t_mha

    sd = {f"x.{k}": v.detach().numpy() for k, v in mha.state_dict().items()}
    params = {"params": t_mha(sd, "x", h)}

    rng = np.random.RandomState(1)
    q = rng.randn(2, 5, c).astype(np.float32)
    k = rng.randn(2, 7, c).astype(np.float32)
    attn_mask = np.zeros((5, 7), bool)
    attn_mask[0, 3:] = True

    with torch.no_grad():
        ref, _ = mha(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(k),
                     attn_mask=torch.from_numpy(attn_mask))
    got = MultiHeadAttention(h).apply(
        params, jnp.asarray(q), jnp.asarray(k), attn_mask=jnp.asarray(attn_mask))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5, rtol=1e-4)


def test_frozen_bn():
    from hipie_tpu.layers import FrozenBatchNorm

    m = FrozenBatchNorm(4)
    params = {"params": {
        "weight": jnp.array([1.0, 2.0, 1.0, 0.5]),
        "bias": jnp.array([0.0, 1.0, -1.0, 0.0]),
        "running_mean": jnp.array([0.5, 0.0, 1.0, 2.0]),
        "running_var": jnp.array([1.0, 4.0, 0.25, 1.0]),
    }}
    x = jnp.ones((1, 2, 2, 4))
    got = m.apply(params, x)
    expected = (np.ones(4) - np.array([0.5, 0.0, 1.0, 2.0])) / np.sqrt(
        np.array([1.0, 4.0, 0.25, 1.0]) + 1e-5) * np.array([1.0, 2.0, 1.0, 0.5]) \
        + np.array([0.0, 1.0, -1.0, 0.0])
    np.testing.assert_allclose(np.asarray(got)[0, 0, 0], expected, rtol=1e-5)


def test_nms_matches_naive():
    from hipie_tpu.ops.nms import nms_keep_mask

    rng = np.random.RandomState(3)
    n = 50
    xy = rng.rand(n, 2) * 0.6
    wh = rng.rand(n, 2) * 0.4 + 0.05
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    cls = rng.randint(0, 3, n)

    def naive(boxes, scores, cls, thr):
        order = np.argsort(-scores)
        keep = np.ones(n, bool)
        for ii, i in enumerate(order):
            if not keep[i]:
                continue
            for j in order[ii + 1:]:
                if cls[i] != cls[j] or not keep[j]:
                    continue
                xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
                xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
                inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
                a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / (a1 + a2 - inter) > thr:
                    keep[j] = False
        return keep

    ref = naive(boxes, scores, cls, 0.5)
    got = np.asarray(nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                   jnp.asarray(cls), 0.5))
    np.testing.assert_array_equal(got, ref)


def test_sine_position_embedding_matches_torch_reference():
    """vs the reference PositionEmbeddingSine (position_encoding.py:20-57)."""
    import torch

    def torch_pos(mask_np, num_pos_feats=8):
        mask = torch.from_numpy(mask_np)
        not_mask = ~mask
        y_embed = not_mask.cumsum(1, dtype=torch.float32)
        x_embed = not_mask.cumsum(2, dtype=torch.float32)
        eps = 1e-6
        scale = 2 * np.pi
        y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale
        dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
        dim_t = 10000 ** (2 * (dim_t // 2) / num_pos_feats)
        pos_x = x_embed[:, :, :, None] / dim_t
        pos_y = y_embed[:, :, :, None] / dim_t
        pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=4).flatten(3)
        pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=4).flatten(3)
        return torch.cat((pos_y, pos_x), dim=3).numpy()

    from hipie_tpu.layers import sine_position_embedding_2d

    mask = np.zeros((1, 6, 5), bool)
    mask[:, 4:, :] = True
    ref = torch_pos(mask)
    got = np.asarray(sine_position_embedding_2d(jnp.asarray(mask), num_pos_feats=8))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_gelu_tanh_within_bf16_rounding():
    """layers.gelu uses the tanh approximation under bf16 compute; assert the
    approximation error stays below one bf16 ulp of the exact value, i.e. the
    two are indistinguishable after output rounding (PERFORMANCE.md round 5:
    exact erf costs ~0.7 ms per ViT-H MLP block, tanh is free)."""
    import jax
    from hipie_tpu.layers import gelu

    x = jnp.asarray(np.linspace(-6, 6, 4001), jnp.float32)
    exact = np.asarray(jax.nn.gelu(x, approximate=False))
    tanh = np.asarray(jax.nn.gelu(x, approximate=True))
    # bf16 ulp at magnitude |exact|: 2^-8 relative, with a small absolute
    # floor for the near-zero tail.
    ulp = np.maximum(np.abs(exact) * 2.0**-8, 1e-4)
    err = np.abs(exact - tanh)
    # main mass (|gelu| >= 0.05): within ONE bf16 ulp — indistinguishable
    # after output rounding.
    main = np.abs(exact) >= 0.05
    assert (err[main] <= ulp[main]).all(), float((err / ulp)[main].max())
    # negative tail (|gelu| < 0.05, x in ~[-4, -1]): the approximation's
    # ~3e-4 absolute error is a few ulps of these tiny values; bound it.
    assert (err <= 5.0 * ulp).all(), float((err / ulp).max())

    # and the module-level switch under bf16 compute: the tanh-bf16 output
    # sits within the same few-ulp band of the TRUE (f32 exact) value that
    # any bf16 evaluation occupies (intermediate bf16 rounding alone moves
    # either path a couple of ulps).
    xb = x.astype(jnp.bfloat16)
    got = np.asarray(gelu(xb).astype(jnp.float32))
    true = np.asarray(jax.nn.gelu(xb.astype(jnp.float32), approximate=False))
    band = np.maximum(np.abs(true) * 2.0**-8, 1e-3)
    assert (np.abs(got - true) <= 4.0 * band).all(), \
        float((np.abs(got - true) / band).max())
