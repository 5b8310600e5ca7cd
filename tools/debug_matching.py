#!/usr/bin/env python
"""Debug: run the fg simOTA matching on a REAL training batch with a trained
checkpoint and print per-GT match counts. Chasing matchdrop >> n_gt *
topk_candidates (which should be impossible for simOTA)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    weights = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hipie_overfit/model_0000400"

    import jax
    import jax.numpy as jnp

    from hipie_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from hipie_tpu.config import load_config
    from hipie_tpu.data.mapper import HIPIEMapper
    from hipie_tpu.data.loader import TrainLoader
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.models.text.tokenizer import WordPieceTokenizer
    from hipie_tpu.train.checkpoint import resume_or_load
    from hipie_tpu.train.step import TrainBatch, TrainState
    from hipie_tpu.losses.matcher import simota_match

    cfg = load_config("configs/smoke_tiny_coco.yaml")
    tok = WordPieceTokenizer.toy()
    model = HIPIEModel(cfg.model)
    mapper = HIPIEMapper(cfg.data, tok, is_train=True,
                         max_gt=cfg.model.max_insts_num, seed=cfg.seed)
    loader = TrainLoader(cfg.data, mapper, 2, seed=cfg.seed)
    _, first = next(iter(loader))
    batch = TrainBatch(**first)
    t = batch.targets
    print("padded N:", t.labels.shape, "valid per image:",
          np.asarray(t.valid).sum(1), "is_thing:",
          (np.asarray(t.valid) & np.asarray(t.is_thing)).sum(1))

    L = cfg.data.max_text_len
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)),
        jnp.zeros((1, 512, 512), bool), jnp.zeros((1, L), jnp.int32),
        jnp.ones((1, L), jnp.int32), jnp.asarray([[512, 512]]))
    state = TrainState(params, None, 0)
    state, _ = resume_or_load("", state, weights, resume=False)

    out = jax.jit(lambda p, b: model.apply(
        p, b.images, b.pad_mask, b.input_ids, b.lang_mask, b.image_sizes,
        task="detection", train=False))(state.params, batch)

    mc = cfg.model
    n_bg = mc.transformer.num_bg_queries
    n_bgl = mc.transformer.num_bg_lang_queries if mc.bg_query_from_lang else 0
    # eval-mode forward has no dn pad; fg queries sit after bg slots
    start_fg = n_bgl + n_bg
    cls = np.asarray(out["pred_logits"][:, start_fg:])
    box = np.asarray(out["pred_boxes"][:, start_fg:])
    print("fg Q:", cls.shape[1])

    fg_valid = np.asarray(t.valid) & np.asarray(t.is_thing)
    for i in range(cls.shape[0]):
        a = np.asarray(simota_match(
            jax.nn.sigmoid(jnp.asarray(cls[i], jnp.float32)),
            jnp.asarray(box[i]), t.boxes[i], t.positive_map[i],
            jnp.asarray(fg_valid[i])))
        matched = a >= 0
        print(f"img{i}: matched={matched.sum()}")
        vals, counts = np.unique(a[matched], return_counts=True)
        for v, c in zip(vals, counts):
            print(f"  gt{v}: {c} queries (valid={fg_valid[i][v]}, "
                  f"box={np.asarray(t.boxes[i][v]).round(3)})")


if __name__ == "__main__":
    main()
