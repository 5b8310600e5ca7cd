#!/usr/bin/env python
"""Probe: why are eval class scores flat? Loads a trained checkpoint, runs the
model on a train image, and prints (a) raw token-logit structure per query,
(b) pooled class logits, (c) text-embedding distinctness across class token
positions, (d) best box-IoU queries vs their class logits.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--config-file", default="configs/overfit_tiny.yaml")
    p.add_argument("--dataset", default="coco_panoptic_train")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hipie_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from hipie_tpu.config import load_config
    from hipie_tpu.data.datasets import get_dataset, load_image
    from hipie_tpu.data.prompts import build_prompt_spec
    from hipie_tpu.data import transforms as T
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.models.text.tokenizer import WordPieceTokenizer
    from hipie_tpu.train.checkpoint import resume_or_load
    from hipie_tpu.train.step import TrainState

    cfg = load_config(args.config_file)
    model = HIPIEModel(cfg.model)
    L = cfg.data.max_text_len
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)),
        jnp.zeros((1, 512, 512), bool), jnp.zeros((1, L), jnp.int32),
        jnp.ones((1, L), jnp.int32), jnp.asarray([[512, 512]]))
    state = TrainState(params, None, 0)
    state, _ = resume_or_load("", state, args.weights, resume=False)
    params = state.params
    tok = WordPieceTokenizer.toy()

    records = get_dataset(args.dataset)
    rec = records[0]
    img = rec.get("image")
    if img is None:
        img = load_image(rec["file_name"])
    names = rec["class_names"]
    is_thing = rec.get("class_is_thing", [True] * len(names))
    spec = build_prompt_spec(names, is_thing, tok, L)
    print("prompt:", repr(spec.prompt))
    print("input_ids[:40]:", spec.input_ids[:40])
    for c, nm in enumerate(names):
        toks = np.where(spec.token_mask[c])[0]
        print(f"  class {c} {nm!r}: tokens {toks.tolist()}")

    # --- text embedding distinctness ---------------------------------------
    hidden = model.apply(params, jnp.asarray(spec.input_ids[None]),
                         jnp.asarray(spec.attention_mask[None]),
                         method=lambda m, i, a: m.encode_text(i, a))
    h = np.asarray(hidden[0], np.float32)      # (L, D)
    nrm = h / (np.linalg.norm(h, axis=-1, keepdims=True) + 1e-6)
    # representative token per class = first token of its span
    reps = [int(np.where(spec.token_mask[c])[0][0]) for c in range(len(names))]
    sim = nrm[reps] @ nrm[reps].T
    print("\ntext-embed cosine sim between class rep tokens:")
    print(np.round(sim, 3))
    print("hidden std per rep token:", np.round(h[reps].std(-1), 3))

    # --- full forward -------------------------------------------------------
    resized, _ = T.resize_shortest_edge(img.astype(np.float32),
                                        cfg.data.min_size_test, cfg.data.max_size_test)
    h_, w_ = resized.shape[:2]
    padded, pad_mask = T.pad_to_bucket(resized, tuple(cfg.test.test_size))
    out = jax.jit(lambda p, *a: model.apply(p, *a, task="detection"))(
        params, jnp.asarray(padded[None]), jnp.asarray(pad_mask[None]),
        jnp.asarray(spec.input_ids[None]), jnp.asarray(spec.attention_mask[None]),
        jnp.asarray([[h_, w_]]))
    n_bg = cfg.model.transformer.num_bg_queries
    tok_logits = np.asarray(out["pred_logits"][0], np.float32)[n_bg:]   # (Q, L)
    boxes = np.asarray(out["pred_boxes"][0], np.float32)[n_bg:]
    ious = out.get("pred_boxious")
    iou_l = np.asarray(ious[0], np.float32)[n_bg:, 0] if ious is not None else None

    valid_tok = np.asarray(spec.attention_mask, bool)
    tl_valid = tok_logits[:, valid_tok]
    print("\ntoken-logit stats over queries (valid tokens only):")
    print("  global mean %.3f std %.3f" % (tl_valid.mean(), tl_valid.std()))
    print("  per-query std across tokens: mean %.4f max %.4f" % (
        tl_valid.std(axis=1).mean(), tl_valid.std(axis=1).max()))

    cls_logits = tok_logits @ spec.mean_weights.T                    # (Q, C)
    prob = 1 / (1 + np.exp(-cls_logits))
    if iou_l is not None:
        prob = np.sqrt(prob * (1 / (1 + np.exp(-iou_l[:, None]))))
    top = np.argsort(-prob.max(1))[:8]
    print("\ntop queries by fused score:")
    for q in top:
        print(f"  q{q}: probs {np.round(prob[q], 3)} box {np.round(boxes[q], 3)}"
              + (f" iou_logit {iou_l[q]:.2f}" if iou_l is not None else ""))

    # --- GT-box-aligned queries ---------------------------------------------
    from hipie_tpu.ops.box_ops import box_cxcywh_to_xyxy
    gt = []
    for ann in rec.get("annotations", []):
        x, y, bw, bh = ann["bbox"]
        gt.append((ann["category_id"], np.array([x, y, x + bw, y + bh]) / [w_ * img.shape[1] / w_, h_ * img.shape[0] / h_] [0:1] * 0 + np.array([x, y, x + bw, y + bh])))
    # normalized pred boxes -> pixel xyxy on original image
    pb = np.asarray(box_cxcywh_to_xyxy(jnp.asarray(boxes)))
    pb_pix = pb * np.array([img.shape[1], img.shape[0], img.shape[1], img.shape[0]])

    def iou_xyxy(a, b):
        ix1, iy1 = np.maximum(a[0], b[0]), np.maximum(a[1], b[1])
        ix2, iy2 = np.minimum(a[2], b[2]), np.minimum(a[3], b[3])
        iw, ih = max(0, ix2 - ix1), max(0, iy2 - iy1)
        inter = iw * ih
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / max(ua, 1e-6)

    print("\nbest-box-IoU query per GT:")
    for cid, gbox in gt:
        ious_ = np.array([iou_xyxy(gbox, pb_pix[q]) for q in range(len(pb_pix))])
        q = int(ious_.argmax())
        print(f"  gt cat={cid}: best q{q} boxIoU {ious_[q]:.3f} "
              f"probs {np.round(prob[q], 3)} (gt-class prob {prob[q, cid]:.3f})"
              + (f" iou_logit {iou_l[q]:.2f}" if iou_l is not None else ""))


if __name__ == "__main__":
    main()
