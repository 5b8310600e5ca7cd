"""Predictor API end-to-end on the tiny config: detection + grounding + parts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hipie_tpu.config import apply_overrides, tiny_test_config
from hipie_tpu.models.hipie import HIPIEModel
from hipie_tpu.models.text.tokenizer import WordPieceTokenizer
from hipie_tpu.predictor import HIPIEPredictor, PartSegmDemo, parse_def_string


@pytest.fixture(scope="module")
def predictor():
    cfg = tiny_test_config()
    cfg = apply_overrides(cfg, {
        "data.min_size_test": 48, "data.max_size_test": 64,
        "data.max_text_len": 16,
        "model.text.max_query_len": 16,
    })
    tok = WordPieceTokenizer.toy(words=["person", "dog", "sky", "grass",
                                        "head", "tail"])
    model = HIPIEModel(cfg.model)
    L = 16
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64), bool), jnp.zeros((1, L), jnp.int32),
        jnp.ones((1, L), jnp.int32), jnp.asarray([[64, 64]]))
    return HIPIEPredictor(cfg, params, tok, bucket=(64, 64))


def test_parse_def_string():
    names, things = parse_def_string(["person", "sky:stuff", "dog"])
    assert names == ["person", "sky", "dog"]
    assert things == [True, False, True]


def test_detection_call(predictor):
    img = (np.random.RandomState(0).rand(50, 60, 3) * 255).astype(np.uint8)
    res = predictor(img, test_categories=["person", "dog", "sky:stuff"],
                    score_thresh=-1.0)
    inst = res["instances"]
    assert inst["boxes"].shape[1] == 4
    assert inst["masks"].shape[1:] == (50, 60)
    assert len(inst["scores"]) == len(inst["classes"]) == len(inst["masks"])
    pan, segments = res["panoptic_seg"]
    assert pan.shape == (50, 60)
    for s in segments:
        assert set(s) == {"id", "category_id", "isthing"}
    assert res["sem_seg"].shape == (50, 60)


def test_grounding_call(predictor):
    img = (np.random.RandomState(1).rand(40, 48, 3) * 255).astype(np.uint8)
    res = predictor(img, task="grounding", expressions="the dog")
    assert len(res["instances"]["scores"]) == 1
    assert res["instances"]["masks"].shape == (1, 40, 48)


def test_part_segm_demo(predictor):
    img = (np.random.RandomState(2).rand(50, 60, 3) * 255).astype(np.uint8)
    demo = PartSegmDemo(predictor, part_labels=["head", "tail"])
    res = demo.forward_panoptic(img, ["person", "dog"], ["sky"], do_part=True)
    parts = res["parts"]
    assert parts["part_sem_seg"].shape == (50, 60)
    assert len(parts["instance_part_maps"]) == len(res["instances"]["masks"])
    ref = demo.forward_reference(img, "the dog", part="head")
    assert "part_mask" in ref or len(ref["instances"]["masks"]) == 0


def test_async_predictor_matches_sync(predictor):
    """AsyncPredictor must return the same results as direct calls, in
    submission order (reference predictor.py AsyncPredictor semantics)."""
    import numpy as np
    from hipie_tpu.predictor import AsyncPredictor

    rng = np.random.RandomState(3)
    images = [rng.randint(0, 255, (48, 64, 3), np.uint8) for _ in range(3)]
    cats = ["person", "sky:stuff"]

    sync = [predictor(im, test_categories=cats) for im in images]
    ap = AsyncPredictor(predictor, workers=2)
    out = list(ap.map(images, test_categories=cats))
    ap.shutdown()
    assert len(out) == len(sync)
    for a, b in zip(out, sync):
        np.testing.assert_allclose(a["instances"]["scores"],
                                   b["instances"]["scores"], rtol=1e-5)
        np.testing.assert_array_equal(a["panoptic_seg"][0], b["panoptic_seg"][0])
