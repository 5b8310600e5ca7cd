#!/usr/bin/env python
"""Demo CLI: run panoptic / referring / part segmentation on an image.

reference: projects/HIPIE/demo.py + predictor.py (VisualizationDemo). Writes a
visualization (instance masks + panoptic overlay) next to the input.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def colorize(seg: np.ndarray) -> np.ndarray:
    rng = np.random.RandomState(0)
    palette = rng.randint(0, 255, (seg.max() + 2, 3), np.uint8)
    palette[0] = 0
    return palette[seg]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="")
    p.add_argument("--task", default="detection",
                   choices=["detection", "grounding"])
    p.add_argument("--expression", default="")
    p.add_argument("--categories", default="person,car,sky:stuff,road:stuff",
                   help="comma-separated, ':stuff' suffix for stuff classes")
    p.add_argument("--preset", default="r50_coco_panoptic")
    p.add_argument("--weights", default="")
    p.add_argument("--vocab", default="")
    p.add_argument("--confidence", type=float, default=0.5)
    args = p.parse_args()

    import cv2
    import jax

    from hipie_tpu import presets
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.models.text.tokenizer import WordPieceTokenizer
    from hipie_tpu.predictor import HIPIEPredictor
    from hipie_tpu.train.checkpoint import resume_or_load
    from hipie_tpu.train.step import TrainState

    cfg = getattr(presets, args.preset)()
    tok = (WordPieceTokenizer.from_vocab_file(args.vocab) if args.vocab
           else WordPieceTokenizer.toy())
    model = HIPIEModel(cfg.model)

    img = cv2.imread(args.input)[:, :, ::-1]
    h, w = img.shape[:2]
    import jax.numpy as jnp
    L = cfg.data.max_text_len
    init_args = (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64), bool),
                 jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
                 jnp.asarray([[64, 64]]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *init_args)
    if args.weights:
        state = TrainState(params, None, 0)
        state, _ = resume_or_load("", state, args.weights, resume=False)
        params = state.params

    predictor = HIPIEPredictor(cfg, params, tok)
    if args.task == "grounding":
        res = predictor(img, task="grounding", expressions=args.expression,
                        score_thresh=-1)
    else:
        res = predictor(img, test_categories=args.categories.split(","),
                        score_thresh=args.confidence)

    vis = img.copy().astype(np.float32)
    for i, m in enumerate(res["instances"]["masks"]):
        color = np.random.RandomState(i).randint(0, 255, 3)
        vis[m] = 0.5 * vis[m] + 0.5 * color
    out_path = args.output or os.path.splitext(args.input)[0] + "_vis.jpg"
    cv2.imwrite(out_path, vis[:, :, ::-1].astype(np.uint8))
    print(f"wrote {out_path}; {len(res['instances']['scores'])} instances")
    if "panoptic_seg" in res:
        pan, segs = res["panoptic_seg"]
        pan_path = os.path.splitext(out_path)[0] + "_pan.png"
        cv2.imwrite(pan_path, colorize(pan)[:, :, ::-1])
        print(f"wrote {pan_path}; {len(segs)} segments")


if __name__ == "__main__":
    main()
