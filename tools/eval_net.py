#!/usr/bin/env python
"""Evaluation CLI: run a dataset through the predictor and print metrics.

reference: projects/HIPIE/train_net.py --eval-only path (Trainer.test +
inference_on_dataset + the evaluator zoo).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="coco_2017_val")
    p.add_argument("--preset", default="r50_coco_panoptic")
    p.add_argument("--config-file", default="", help="YAML config (overrides --preset)")
    p.add_argument("--weights", default="")
    p.add_argument("--vocab", default="")
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--tasks", default="bbox,segm")
    args = p.parse_args()

    import jax

    from hipie_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from hipie_tpu import presets
    from hipie_tpu.data.datasets import get_dataset
    from hipie_tpu.evaluation.evaluator import (
        evaluate_detection_dataset, evaluate_refcoco_dataset)
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.models.text.tokenizer import WordPieceTokenizer
    from hipie_tpu.predictor import HIPIEPredictor
    from hipie_tpu.train.checkpoint import resume_or_load
    from hipie_tpu.train.step import TrainState

    from hipie_tpu.config import load_config
    cfg = (load_config(args.config_file) if args.config_file
           else getattr(presets, args.preset)())
    tok = (WordPieceTokenizer.from_vocab_file(args.vocab) if args.vocab
           else WordPieceTokenizer.toy())
    model = HIPIEModel(cfg.model)
    L = cfg.data.max_text_len
    # init size must give the encoder more tokens than the two-stage top-k
    # (900 proposals) — 512^2 -> 5440 tokens at strides 8..64.
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)),
        jnp.zeros((1, 512, 512), bool), jnp.zeros((1, L), jnp.int32),
        jnp.ones((1, L), jnp.int32), jnp.asarray([[512, 512]]))
    if args.weights:
        state = TrainState(params, None, 0)
        state, _ = resume_or_load("", state, args.weights, resume=False)
        params = state.params
    predictor = HIPIEPredictor(cfg, params, tok)

    from hipie_tpu.data.datasets import DATASET_METADATA
    from hipie_tpu.evaluation.evaluator import evaluate_semseg_dataset

    records = get_dataset(args.dataset)
    max_images = args.max_images or None
    metadata = DATASET_METADATA.get(args.dataset, {})
    ev_type = metadata.get("evaluator_type", "coco")
    if "refcoco" in args.dataset:
        results = evaluate_refcoco_dataset(predictor, records, max_images)
    elif ev_type == "sem_seg":
        results = evaluate_semseg_dataset(predictor, records, metadata,
                                          max_images)
    else:
        meta = records[0]
        tasks = args.tasks.split(",")
        if ev_type == "panoptic" and "panoptic" not in tasks:
            tasks = tasks + ["panoptic"]
        results = evaluate_detection_dataset(
            predictor, records, len(meta["class_names"]),
            meta["class_is_thing"], tasks=tasks,
            max_images=max_images)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
