#!/usr/bin/env python
"""Visualize mapper outputs (augmented image + GT boxes/masks + prompt) for
debugging the data pipeline.

reference: the debug harness baked into the model at
projects/HIPIE/hipie/models/ddetrs_dn.py:1539-1578 (debug_data: dumps per-rank
GT visualizations and exits). Here it is a standalone tool over the SAME
mapper the trainer uses, so what you see is exactly what the train step gets
(LSJ crop, hflip, detection->grounding prompt, positive maps).

Usage:
  HIPIE_DATASETS=... python tools/debug_data.py \
      --config-file configs/smoke_tiny_coco.yaml --n 4 --out /tmp/debug_data
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--dataset", default="")
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--out", default="/tmp/debug_data")
    p.add_argument("--vocab", default="")
    args = p.parse_args()

    import cv2

    from hipie_tpu.config import load_config
    from hipie_tpu.data.datasets import get_dataset
    from hipie_tpu.data.loader import materialize_record
    from hipie_tpu.data.mapper import HIPIEMapper
    from hipie_tpu.models.text.tokenizer import WordPieceTokenizer

    cfg = load_config(args.config_file)
    tok = (WordPieceTokenizer.from_vocab_file(args.vocab) if args.vocab
           else WordPieceTokenizer.toy())
    mapper = HIPIEMapper(cfg.data, tok, is_train=True,
                         max_gt=cfg.model.max_insts_num, seed=0)
    name = args.dataset or cfg.data.train_datasets[0]
    records = get_dataset(name)
    os.makedirs(args.out, exist_ok=True)

    for i in range(min(args.n, len(records))):
        ex = mapper(materialize_record(records[i]))
        if ex is None:
            continue
        img = np.asarray(ex.image).astype(np.uint8).copy()
        h, w = img.shape[:2]
        valid = np.asarray(ex.valid)
        boxes = np.asarray(ex.boxes)         # cxcywh normalized to valid size
        masks = np.asarray(ex.masks)
        vh, vw = ex.image_size
        for j in np.where(valid)[0]:
            color = tuple(int(c) for c in
                          np.random.RandomState(j).randint(64, 255, 3))
            cx, cy, bw, bh = boxes[j]
            x0 = int((cx - bw / 2) * vw)
            y0 = int((cy - bh / 2) * vh)
            x1 = int((cx + bw / 2) * vw)
            y1 = int((cy + bh / 2) * vh)
            cv2.rectangle(img, (x0, y0), (x1, y1), color, 2)
            m = masks[j]
            m4 = cv2.resize(m.astype(np.float32), (w, h),
                            interpolation=cv2.INTER_NEAREST) > 0.5
            img[m4] = (0.6 * img[m4] + 0.4 * np.array(color)).astype(np.uint8)
        prompt = getattr(ex.prompt_spec, "prompt", "")
        path = os.path.join(args.out, f"gt_{i:03d}.jpg")
        cv2.imwrite(path, img[:, :, ::-1])
        print(f"{path}  valid={int(valid.sum())}  prompt={str(prompt)[:90]!r}")


if __name__ == "__main__":
    main()
