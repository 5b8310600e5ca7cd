"""Tiny end-to-end model tests: jit-compiled forward + fused inference on the
miniature config (SURVEY.md §4: single-device golden-path smoke tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hipie_tpu.config import tiny_test_config
from hipie_tpu.models.hipie import HIPIEModel, hipie_inference
from hipie_tpu.models.postprocess import ClassMaps


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_test_config()
    model = HIPIEModel(cfg.model)
    b, H, W, L = 1, 64, 64, 16
    images = jnp.linspace(0, 255, b * H * W * 3).reshape(b, H, W, 3)
    pad = jnp.zeros((b, H, W), bool).at[:, 48:, :].set(True)
    ids = jnp.arange(L)[None].astype(jnp.int32) % 16
    am = jnp.ones((b, L), jnp.int32)
    sizes = jnp.array([[48, 64]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad, ids, am, sizes)
    return cfg, model, params, (images, pad, ids, am, sizes)


def _maps(L=16, C=5):
    mw = np.zeros((C, L), np.float32)
    tm = np.zeros((C, L), bool)
    for c in range(C):
        mw[c, 2 * c + 1] = 1.0
        tm[c, 2 * c + 1] = True
    return ClassMaps(jnp.array(mw), jnp.array(tm),
                     jnp.array([True, True, False, False, True]))


def test_forward_shapes(tiny_model):
    cfg, model, params, args = tiny_model
    out = jax.jit(lambda p, *a: model.apply(p, *a))(params, *args)
    q = (cfg.model.transformer.num_queries
         + cfg.model.transformer.num_bg_queries)
    assert out["pred_logits"].shape == (1, q, 16)
    assert out["pred_boxes"].shape == (1, q, 4)
    assert out["pred_masks"].shape[1] == q
    assert out["maskdino"]["pred_masks"].shape[1] == cfg.model.maskdino.num_queries
    # boxes in [0, 1]
    assert float(out["pred_boxes"].min()) >= 0.0
    assert float(out["pred_boxes"].max()) <= 1.0


def test_inference_fusion(tiny_model):
    cfg, model, params, args = tiny_model
    maps = _maps()
    pad_s4 = args[1][0][::4, ::4]

    def full(p, *a):
        out = model.apply(p, *a)
        return hipie_inference(out, maps, cfg.test, cfg.model, pad_mask_s4=pad_s4)

    res = jax.jit(full)(params, *args)
    assert res.scores.shape == (cfg.test.detections_per_image,)
    assert res.boxes.shape == (cfg.test.detections_per_image, 4)
    assert res.sem_seg.shape[0] == 5
    assert res.panoptic.shape == res.sem_seg.shape[1:]
    # scores sorted descending
    s = np.asarray(res.scores)
    assert np.all(np.diff(s) <= 1e-6)
    # panoptic ids consistent with segment table
    nseg = int(np.asarray(res.segment_valid).sum())
    assert int(np.asarray(res.panoptic).max()) <= nseg


def test_grounding_task(tiny_model):
    cfg, model, params, args = tiny_model
    images, pad, ids, am, sizes = args
    out = jax.jit(lambda p: model.apply(
        p, images, pad, ids, am, sizes, task="grounding"))(params)
    # grounding classifies against the pooled text feature -> 1 "class" token
    assert out["pred_logits"].shape[-1] == 1


def test_forward_deterministic(tiny_model):
    cfg, model, params, args = tiny_model
    f = jax.jit(lambda p, *a: model.apply(p, *a)["pred_logits"])
    a = np.asarray(f(params, *args))
    b = np.asarray(f(params, *args))
    np.testing.assert_array_equal(a, b)


def test_decoupled_tgt_grounding_uses_language():
    """STILL_TGT_FOR_BOTH=False: grounding queries take the pooled-language
    content (reference deformable_transformer_dino.py:258-275)."""
    from hipie_tpu.config import apply_overrides, tiny_test_config

    cfg = apply_overrides(tiny_test_config(),
                          {"model.transformer.still_tgt_for_both": False})
    model = HIPIEModel(cfg.model)
    b, H, W, L = 1, 64, 64, 16
    images = jnp.linspace(0, 255, b * H * W * 3).reshape(b, H, W, 3)
    pad = jnp.zeros((b, H, W), bool)
    ids = jnp.arange(L)[None].astype(jnp.int32) % 16
    am = jnp.ones((b, L), jnp.int32)
    sizes = jnp.array([[H, W]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad, ids, am, sizes)
    out_det = model.apply(params, images, pad, ids, am, sizes, task="detection")
    out_gnd = model.apply(params, images, pad, ids, am, sizes, task="grounding")
    # with decoupled content the two tasks produce genuinely different logits
    assert not np.allclose(np.asarray(out_det["pred_logits"]),
                           np.asarray(out_gnd["pred_logits"]), atol=1e-4)
    assert np.isfinite(np.asarray(out_gnd["pred_logits"])).all()


def test_precomputed_lang_hidden_equals_inline(tiny_model):
    """Passing precomputed class-prompt embeddings (the BASELINE.json
    'precomputed and replicated' deployment shape) must be bit-identical to
    encoding the same ids inline."""
    cfg, model, params, (images, pad, ids, am, sizes) = tiny_model
    inline = model.apply(params, images, pad, ids, am, sizes)
    hidden = model.apply(params, ids, am, method=HIPIEModel.encode_text)
    pre = model.apply(params, images, pad, ids, am, sizes, lang_hidden=hidden)
    leaves_a = jax.tree_util.tree_leaves(inline)
    leaves_b = jax.tree_util.tree_leaves(pre)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
