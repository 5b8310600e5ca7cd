"""make_inline_eval_fn + Trainer EvalHook/BestCheckpointer integration.

VERDICT r2 missing #5 / task 6: the inline eval path was wired into
tools/train_net.py but had no unit test — a signature drift or metadata miss
would only surface mid-training-run.  Reference semantics:
engine/defaults.py:461 (EvalHook calling a closure every TEST.EVAL_PERIOD)
and engine/hooks.py BestCheckpointer (track a metric, keep model_best).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hipie_tpu.config import apply_overrides, tiny_test_config
from hipie_tpu.models.hipie import HIPIEModel
from hipie_tpu.models.text.tokenizer import WordPieceTokenizer

DS = "_test_inline_eval"


def _register_eval_dataset():
    import hipie_tpu.data.datasets as D

    rng = np.random.RandomState(5)

    def mkrec(i):
        h, w = 48, 64
        mask = np.zeros((h, w), np.uint8)
        mask[8:28, 10:40] = 1
        return {
            "image": (rng.rand(h, w, 3) * 255).astype(np.uint8),
            "image_id": i,
            "class_names": ["person", "sky"],
            "class_is_thing": [True, False],
            "annotations": [{
                "category_id": 0,
                "bbox": [10.0, 8.0, 40.0, 28.0],
                "area": 600.0,
                "segmentation": mask,
                "iscrowd": 0,
            }],
        }

    D.register_dataset(DS, lambda: [mkrec(i) for i in range(2)])


@pytest.fixture(scope="module")
def setup():
    _register_eval_dataset()
    cfg = apply_overrides(tiny_test_config(), {
        "data.test_dataset": DS,
        "data.min_size_test": 48, "data.max_size_test": 64,
        "data.max_text_len": 16,
        "test.eval_max_images": 2,
        "test.eval_period": 2,
        "test.best_metric": "bbox/AP",
        "solver.warmup_iters": 0,
    })
    tok = WordPieceTokenizer.toy(words=["person", "sky"])
    model = HIPIEModel(cfg.model)
    return cfg, tok, model


def test_inline_eval_fn_runs(setup):
    from hipie_tpu.evaluation.evaluator import make_inline_eval_fn

    cfg, tok, model = setup
    L = 16
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64), bool), jnp.zeros((1, L), jnp.int32),
        jnp.ones((1, L), jnp.int32), jnp.asarray([[64, 64]]))

    eval_fn = make_inline_eval_fn(cfg, model, tok)
    results = eval_fn(params)
    assert results["images"] == 2
    for key in ("bbox/AP", "segm/AP"):
        assert key in results and np.isfinite(results[key]), sorted(results)
    # reuse across calls (the predictor is built once; params are swapped)
    results2 = eval_fn(params)
    assert results2["bbox/AP"] == results["bbox/AP"]


def test_trainer_fires_eval_and_best_checkpoint(setup, tmp_path):
    """2-iteration training run with eval_period=2: the trainer must call the
    inline eval fn, record eval/* scalars, and write model_best +
    best_checkpoint (BestCheckpointer)."""
    from hipie_tpu.data.loader import TrainLoader
    from hipie_tpu.data.mapper import HIPIEMapper
    from hipie_tpu.evaluation.evaluator import make_inline_eval_fn
    from hipie_tpu.train.step import TrainBatch, create_train_state, \
        make_train_step
    from hipie_tpu.train.trainer import Trainer

    cfg, tok, model = setup
    cfg = apply_overrides(cfg, {
        "output_dir": str(tmp_path),
        "data.train_datasets": [DS],
        "data.dataset_ratios": [1.0],
        "data.lsj_crop": True, "data.crop_size": 64,
        "solver.ims_per_batch": 1,
        "solver.max_iter": 2,
        "solver.checkpoint_period": 1000,
    })
    mapper = HIPIEMapper(cfg.data, tok, is_train=True, max_gt=4, seed=0)
    loader = TrainLoader(cfg.data, mapper, batch_size=1, seed=0)
    _, first = next(iter(loader))
    first = TrainBatch(**first)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), first)
    steps = {t: make_train_step(model, cfg, tx, task=t)
             for t in sorted(set(loader.tasks))}
    eval_fn = make_inline_eval_fn(cfg, model, tok)
    trainer = Trainer(cfg, model, state, tx, steps, loader,
                      eval_fn=eval_fn, log_period=1)
    trainer.train()

    eval_keys = [k for k in trainer.storage._latest if k.startswith("eval/")]
    assert "eval/bbox/AP" in eval_keys, eval_keys
    assert os.path.isdir(os.path.join(str(tmp_path), "model_best"))
    marker = open(os.path.join(str(tmp_path), "best_checkpoint")).read()
    assert "bbox/AP" in marker and "iter=2" in marker, marker
