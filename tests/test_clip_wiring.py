"""End-to-end open-vocab CLIP wiring: tokenizer, converter, scorer cache, and
the clip-fused inference path (VERDICT r1 missing item #2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hipie_tpu.models.clip import CLIPText, CLIPVisual
from hipie_tpu.models.postprocess_clip import (
    CLIPScorer, category_overlap_mask, prompt_labels)
from hipie_tpu.models.text.clip_tokenizer import CLIPTokenizer


def tiny_scorer():
    from hipie_tpu.config import ClipConfig
    vis = CLIPVisual(image_size=32, patch_size=8, width=32, layers=2, heads=2,
                     output_dim=16)
    txt = CLIPText(vocab_size=600, context_length=77, width=32, layers=2,
                   heads=2, output_dim=16)
    return CLIPScorer(ClipConfig(enabled=True), CLIPTokenizer.toy(),
                      visual=vis, text=txt)


def test_clip_tokenizer_mechanics():
    tok = CLIPTokenizer.toy()
    ids = tok(["a photo of a dog.", "a photo of a person."])
    assert ids.shape == (2, 77)
    assert (ids[:, 0] == tok.sot).all()
    # eot present exactly once per row
    assert ((ids == tok.eot).sum(1) == 1).all()
    # identical words tokenize identically across contexts
    a = tok.encode_text("dog")
    b = tok.encode_text("the dog")
    assert a[-1] == b[-1]
    # truncation forces eot last
    long = tok(["dog " * 200])
    assert long[0, -1] == tok.eot


def test_prompt_labels_and_overlap():
    labels = [["person"], ["dog", "puppy"], ["warpdrive"]]
    p = prompt_labels(labels, "photo")
    assert p[1] == ["a photo of a dog.", "a photo of a puppy."]
    ov = category_overlap_mask(labels, train_vocab=["person", "dog,hound"])
    np.testing.assert_array_equal(ov, [1.0, 1.0, 0.0])


def test_convert_clip_roundtrip():
    """Synthetic open_clip-layout state dict converts and applies."""
    from hipie_tpu.utils.converter import convert_clip

    r = np.random.RandomState(0)
    W, L, H = 32, 2, 2
    sd = {}
    sd["visual.conv1.weight"] = r.randn(W, 3, 8, 8).astype(np.float32)
    sd["visual.class_embedding"] = r.randn(W).astype(np.float32)
    sd["visual.positional_embedding"] = r.randn(17, W).astype(np.float32)
    sd["visual.proj"] = r.randn(W, 16).astype(np.float32)
    for ln in ["visual.ln_pre", "visual.ln_post", "ln_final"]:
        sd[f"{ln}.weight"] = np.ones(W, np.float32)
        sd[f"{ln}.bias"] = np.zeros(W, np.float32)
    for side, n in [("visual.transformer", L), ("transformer", L)]:
        for i in range(n):
            p = f"{side}.resblocks.{i}"
            sd[f"{p}.ln_1.weight"] = np.ones(W, np.float32)
            sd[f"{p}.ln_1.bias"] = np.zeros(W, np.float32)
            sd[f"{p}.ln_2.weight"] = np.ones(W, np.float32)
            sd[f"{p}.ln_2.bias"] = np.zeros(W, np.float32)
            sd[f"{p}.attn.in_proj_weight"] = r.randn(3 * W, W).astype(np.float32)
            sd[f"{p}.attn.in_proj_bias"] = r.randn(3 * W).astype(np.float32)
            sd[f"{p}.attn.out_proj.weight"] = r.randn(W, W).astype(np.float32)
            sd[f"{p}.attn.out_proj.bias"] = r.randn(W).astype(np.float32)
            sd[f"{p}.mlp.c_fc.weight"] = r.randn(4 * W, W).astype(np.float32)
            sd[f"{p}.mlp.c_fc.bias"] = r.randn(4 * W).astype(np.float32)
            sd[f"{p}.mlp.c_proj.weight"] = r.randn(W, 4 * W).astype(np.float32)
            sd[f"{p}.mlp.c_proj.bias"] = r.randn(W).astype(np.float32)
    sd["token_embedding.weight"] = r.randn(600, W).astype(np.float32)
    sd["positional_embedding"] = r.randn(77, W).astype(np.float32)
    sd["text_projection"] = r.randn(W, 16).astype(np.float32)
    sd["logit_scale"] = np.asarray(2.0, np.float32)

    conv = convert_clip(sd, visual_layers=L, visual_heads=H,
                        text_layers=L, text_heads=H)
    vis = CLIPVisual(image_size=32, patch_size=8, width=W, layers=L, heads=H,
                     output_dim=16)
    txt = CLIPText(vocab_size=600, width=W, layers=L, heads=H, output_dim=16)
    img = jnp.zeros((1, 32, 32, 3))
    out_v = vis.apply({"params": conv["visual"]}, img)
    assert out_v.shape == (1, 16) and np.isfinite(np.asarray(out_v)).all()
    ids = jnp.zeros((2, 77), jnp.int32).at[:, 1].set(5)
    out_t = txt.apply({"params": conv["text"]}, ids)
    assert out_t.shape == (2, 16) and np.isfinite(np.asarray(out_t)).all()


def test_scorer_cache_and_clip_fn():
    scorer = tiny_scorer()
    labels = [["person"], ["dog", "cat"]]
    te1, gs1 = scorer.build_text_embed(labels)
    te2, gs2 = scorer.build_text_embed(labels)
    assert te1 is te2 and gs1 == (1, 2)       # cached
    assert te1.shape == (3, 16)

    clip_fn, overlap = scorer.make_clip_fn(labels)
    img01 = jnp.asarray(np.random.RandomState(0).rand(1, 40, 48, 3), jnp.float32)
    masks = jnp.asarray(np.random.RandomState(1).randn(1, 5, 10, 12), jnp.float32)
    logits = jax.jit(clip_fn)(img01, masks)
    assert logits.shape == (5, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_inference_clip_fusion_changes_scores():
    """hipie_inference with clip_fn produces different (finite) scores."""
    from hipie_tpu.config import tiny_test_config
    from hipie_tpu.models.hipie import HIPIEModel, hipie_inference
    from hipie_tpu.models.postprocess import ClassMaps

    cfg = tiny_test_config()
    model = HIPIEModel(cfg.model)
    b, H, W, L = 1, 64, 64, 16
    images = jnp.linspace(0, 255, b * H * W * 3).reshape(b, H, W, 3)
    pad = jnp.zeros((b, H, W), bool)
    ids = jnp.arange(L)[None].astype(jnp.int32) % 16
    am = jnp.ones((b, L), jnp.int32)
    sizes = jnp.array([[H, W]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad, ids, am, sizes)
    out = model.apply(params, images, pad, ids, am, sizes)

    C = 3
    mw = np.zeros((C, L), np.float32); tm = np.zeros((C, L), bool)
    for c in range(C):
        mw[c, 2 * c + 1] = 1.0; tm[c, 2 * c + 1] = True
    maps = ClassMaps(jnp.asarray(mw), jnp.asarray(tm),
                     jnp.asarray([True, True, False]))

    scorer = tiny_scorer()
    labels = [["person"], ["dog"], ["warpdrive"]]
    clip_fn, overlap = scorer.make_clip_fn(labels, train_vocab=["person", "dog"])
    images01 = images / 255.0

    base = hipie_inference(out, maps, cfg.test, cfg.model)
    fused = hipie_inference(out, maps, cfg.test, cfg.model,
                            clip_fn=clip_fn, clip_overlap=overlap,
                            images01=images01)
    assert np.isfinite(np.asarray(fused.scores)).all()
    assert fused.sem_seg.shape == base.sem_seg.shape
    assert not np.allclose(np.asarray(fused.scores), np.asarray(base.scores))
