"""CLIP/MaskCLIP tests: shapes, mask-attention semantics, score fusion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mask_attn_from_logits():
    from hipie_tpu.models.clip import mask_attn_from_logits

    # one mask covering the top half -> bottom-half patches blocked
    logits = np.full((1, 1, 8, 8), -10.0, np.float32)
    logits[0, 0, :4, :] = 10.0
    blocked = np.asarray(mask_attn_from_logits(jnp.asarray(logits), 32, 8))
    g = 4
    grid = blocked.reshape(1, 1, g, g)
    assert not grid[0, 0, :2].any()     # top patches visible
    assert grid[0, 0, 2:].all()         # bottom patches blocked


def test_maskclip_forward_shapes():
    from hipie_tpu.models.clip import CLIPVisual, MaskCLIP

    vis = CLIPVisual(image_size=32, patch_size=8, width=64, layers=2, heads=4,
                     output_dim=16)
    m = MaskCLIP(visual=vis)
    b, q = 1, 3
    images = jnp.ones((b, 48, 40, 3)) * 0.5
    mask_logits = jnp.asarray(np.random.RandomState(0).randn(b, q, 12, 10),
                              jnp.float32)
    text = jnp.asarray(np.random.RandomState(1).randn(5, 16), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), images, mask_logits, text, (2, 2, 1))
    out = m.apply(params, images, mask_logits, text, (2, 2, 1))
    assert out.shape == (b, q, 3)       # 3 synonym groups
    assert np.isfinite(np.asarray(out)).all()


def test_clip_score_fusion_modes():
    from hipie_tpu.models.clip import clip_score_fusion

    q, c = 4, 3
    rng = np.random.RandomState(0)
    pred = jnp.asarray(jax.nn.softmax(jnp.asarray(rng.randn(q, c)), -1))
    clip_logits = jnp.asarray(rng.randn(q, c), jnp.float32)
    overlap = jnp.asarray([1.0, 0.0, 1.0])
    fused = np.asarray(clip_score_fusion(pred, clip_logits, overlap,
                                         alpha=0.0, beta=1.0))
    # alpha=0 -> base classes = log(pred); beta=1 -> novel = log(clip_prob)
    clip_prob = np.asarray(jax.nn.softmax(clip_logits, -1))
    np.testing.assert_allclose(fused[:, 0], np.log(np.asarray(pred)[:, 0]),
                               atol=1e-5)
    np.testing.assert_allclose(fused[:, 1], np.log(clip_prob[:, 1] + 0e0),
                               atol=1e-4)


def test_clip_text_tower_shapes():
    from hipie_tpu.models.clip import CLIPText

    t = CLIPText(vocab_size=100, context_length=16, width=32, layers=2, heads=4,
                 output_dim=16)
    ids = jnp.asarray([[5, 8, 9, 99, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]],
                      jnp.int32)
    params = t.init(jax.random.PRNGKey(0), ids)
    out = t.apply(params, ids)
    assert out.shape == (1, 16)
