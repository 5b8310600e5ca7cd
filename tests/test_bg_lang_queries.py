"""Language-derived background queries at inference (VERDICT r1 missing #3).

reference: hipie_img.py:336 + prepare_bg_queries_lan (:1014-1024) — one query
per stuff class built from BERT token embeddings through the shared resizer;
inference slices [bg_lang | bg | fg] (:560-573).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hipie_tpu.config import apply_overrides, tiny_test_config
from hipie_tpu.models.hipie import HIPIEModel, hipie_inference
from hipie_tpu.models.postprocess import ClassMaps


def _setup(bg_from_lang: bool):
    cfg = tiny_test_config()
    cfg = apply_overrides(cfg, {"model.bg_query_from_lang": bg_from_lang})
    model = HIPIEModel(cfg.model)
    b, H, W, L = 1, 64, 64, 16
    images = jnp.linspace(0, 255, b * H * W * 3).reshape(b, H, W, 3)
    pad = jnp.zeros((b, H, W), bool)
    ids = jnp.arange(L)[None].astype(jnp.int32) % 16
    am = jnp.ones((b, L), jnp.int32)
    sizes = jnp.array([[H, W]])
    return cfg, model, (images, pad, ids, am, sizes)


def _maps(L=16):
    C = 4
    mw = np.zeros((C, L), np.float32); tm = np.zeros((C, L), bool)
    for c in range(C):
        mw[c, 2 * c + 1] = 1.0; tm[c, 2 * c + 1] = True
    return ClassMaps(jnp.asarray(mw), jnp.asarray(tm),
                     jnp.asarray([True, True, False, False]))


def test_bg_lang_queries_change_query_count_and_run():
    cfg, model, args = _setup(True)
    maps = _maps()
    stuff = ~np.asarray(maps.is_thing)
    blw = jnp.asarray(np.asarray(maps.mean_weights)[stuff])   # (2, L)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    out_plain = model.apply(params, *args)
    out_lang = model.apply(params, *args, bg_lang_weights=blw)
    nq = cfg.model.transformer.num_queries + cfg.model.transformer.num_bg_queries
    assert out_plain["pred_logits"].shape[1] == nq
    assert out_lang["pred_logits"].shape[1] == nq + 2
    # the shared resizer is used: no new params were needed for the lang path
    assert np.isfinite(np.asarray(out_lang["pred_logits"])).all()


@pytest.mark.parametrize("use_bg_for_pano", [True, False])
def test_inference_both_pano_modes_with_bg_lang(use_bg_for_pano):
    cfg, model, args = _setup(True)
    cfg = apply_overrides(cfg, {"test.use_bg_for_pano": use_bg_for_pano})
    maps = _maps()
    stuff = ~np.asarray(maps.is_thing)
    blw = jnp.asarray(np.asarray(maps.mean_weights)[stuff])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    out = model.apply(params, *args, bg_lang_weights=blw)
    res = hipie_inference(out, maps, cfg.test, cfg.model, n_bg_lang=2)
    assert np.isfinite(np.asarray(res.scores)).all()
    assert res.sem_seg is not None and res.panoptic is not None
    assert np.isfinite(np.asarray(res.sem_seg)).all()
