#!/usr/bin/env python
"""Quantify the matcher's point-sampled mask-cost budget: 2048 vs 12544 points.

The reference samples TRAIN_NUM_POINTS=12544 random points when computing the
Hungarian matching costs (hipie/models/maskdino/matcher.py:70-200 +
maskdino yaml TRAIN_NUM_POINTS); hipie_tpu caps the MATCHING cost sampling at
2048 points (losses/criterion.py cost_one) while keeping the full 12544 for
the losses themselves. This experiment measures, on REAL batches (tiny-COCO
through the actual data pipeline) and REAL semi-trained predictions (the
TRAINLOG 350-iter smoke checkpoint), whether the cheaper estimator changes
the assignments:

  * assignment agreement of each setting vs the EXACT (dense, every-pixel)
    cost matrix, over many sampling seeds;
  * seed-to-seed assignment stability within a setting;
  * relative RMS error of the sampled mask-cost matrices vs dense.

Run: HIPIE_DATASETS=/tmp/tiny_coco python tools/experiment_match_points.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def dense_mask_costs(mask_logits, gt_masks, cost_mask=5.0, cost_dice=5.0):
    """Exact (all-pixel) version of losses/matcher.py mask_match_costs."""
    import jax
    import jax.numpy as jnp
    from hipie_tpu.losses.point_features import point_sample

    q, hm, wm = mask_logits.shape
    gh, gw = gt_masks.shape[1:]
    # evaluate both at the GT grid's pixel centers (== the limit the sampled
    # estimator converges to).
    ys = (jnp.arange(gh) + 0.5) / gh
    xs = (jnp.arange(gw) + 0.5) / gw
    coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
    mp = point_sample(mask_logits, jnp.broadcast_to(
        coords[None], (q,) + coords.shape)).astype(jnp.float32)
    tp = gt_masks.reshape(gt_masks.shape[0], -1).astype(jnp.float32)
    n = coords.shape[0]
    pos = jax.nn.softplus(-mp)
    neg = jax.nn.softplus(mp)
    ce = (pos @ tp.T + neg @ (1 - tp).T) / n
    m = jax.nn.sigmoid(mp)
    numer = 2 * (m @ tp.T)
    denom = m.sum(-1)[:, None] + tp.sum(-1)[None, :]
    dice = 1 - (numer + 1) / (denom + 1)
    return cost_mask * ce + cost_dice * dice


def main():
    import jax
    import jax.numpy as jnp

    from hipie_tpu.config import load_config
    from hipie_tpu.data.loader import TrainLoader
    from hipie_tpu.data.mapper import HIPIEMapper
    from hipie_tpu.losses.matcher import (auction_assignment,
                                          hungarian_vl_costs,
                                          mask_match_costs)
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.models.text.tokenizer import WordPieceTokenizer
    from hipie_tpu.train.checkpoint import resume_or_load
    from hipie_tpu.train.step import TrainBatch, TrainState

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "smoke_tiny_coco.yaml"))
    tok = WordPieceTokenizer.toy()
    model = HIPIEModel(cfg.model)
    mapper = HIPIEMapper(cfg.data, tok, is_train=True,
                         max_gt=cfg.model.max_insts_num, seed=3)
    loader = TrainLoader(cfg.data, mapper, 2, seed=3)

    it = iter(loader)
    _, first = next(it)
    batch = TrainBatch(**first)

    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch.images, batch.pad_mask, batch.input_ids,
        batch.lang_mask, batch.image_sizes, train=True)
    ckpt = os.environ.get("CKPT", "/tmp/hipie_trainrun/model_0000350")
    if os.path.isdir(ckpt):
        state = TrainState(params, None, 0)
        state, _ = resume_or_load("", state, ckpt, resume=False)
        params = state.params
        print(f"# loaded checkpoint {ckpt}")
    else:
        print("# WARNING: no checkpoint found, using random init")

    def _fwd(p, b):
        return model.apply(
            p, b.images, b.pad_mask, b.input_ids, b.lang_mask, b.image_sizes,
            task="detection", train=True,
            rngs={"dropout": jax.random.PRNGKey(1)})

    fwd = jax.jit(_fwd)

    n_batches = int(os.environ.get("N_BATCHES", "4"))
    n_seeds = int(os.environ.get("N_SEEDS", "16"))
    settings = {"pts2048": 2048, "pts12544": 12544}

    def assign_for(costs_mask, cls_b, box_b, t, b):
        c = hungarian_vl_costs(
            jax.nn.sigmoid(cls_b.astype(jnp.float32)), box_b,
            t.boxes[b], t.positive_map[b],
            cost_class=4.0, cost_bbox=5.0, cost_giou=2.0,
            mask_cost=costs_mask)
        return np.asarray(auction_assignment(c, t.valid[b]))

    agree_dense = {k: [] for k in settings}
    agree_pairwise = {k: [] for k in settings}
    cost_rel_rmse = {k: [] for k in settings}
    n_pairs_total = 0

    for bi in range(n_batches):
        out = fwd(params, batch)
        md = out["maskdino"]
        t = batch.targets
        for b in range(batch.images.shape[0]):
            nv = int(np.asarray(t.valid[b]).sum())
            if nv == 0:
                continue
            # train mode emits mask embeddings; rebuild the dense final-layer
            # masks (exactly equal: the head is linear in the features).
            ml = jax.lax.stop_gradient(jnp.einsum(
                "qc,hwc->qhw", md["pred_mask_embed"][b].astype(jnp.float32),
                md["mask_features"][b].astype(jnp.float32)))  # (Q, Hm, Wm)
            gm = t.masks[b]
            cls_b = md["pred_logits"][b]
            box_b = md["pred_boxes"][b]
            cd = dense_mask_costs(ml, gm)
            a_dense = assign_for(cd, cls_b, box_b, t, b)
            cd_np = np.asarray(cd)[:, :nv]
            matched_dense = a_dense >= 0
            n_pairs_total += nv
            for name, npts in settings.items():
                assigns = []
                for s in range(n_seeds):
                    key = jax.random.PRNGKey(1000 * bi + 10 * b + s)
                    cm = mask_match_costs(key, ml, gm, num_points=npts)
                    a = assign_for(cm, cls_b, box_b, t, b)
                    assigns.append(a)
                    # agreement counted over queries matched under EITHER
                    either = matched_dense | (a >= 0)
                    agree_dense[name].append(
                        (a[either] == a_dense[either]).mean()
                        if either.any() else 1.0)
                    cm_np = np.asarray(cm)[:, :nv]
                    denom = np.abs(cd_np).mean() + 1e-9
                    cost_rel_rmse[name].append(
                        np.sqrt(((cm_np - cd_np) ** 2).mean()) / denom)
                for i in range(len(assigns)):
                    for j in range(i + 1, len(assigns)):
                        e = (assigns[i] >= 0) | (assigns[j] >= 0)
                        agree_pairwise[name].append(
                            (assigns[i][e] == assigns[j][e]).mean()
                            if e.any() else 1.0)
        try:
            _, nxt = next(it)
            batch = TrainBatch(**nxt)
        except StopIteration:
            break

    print(f"\n# {n_batches} real batches x {n_seeds} seeds, "
          f"{n_pairs_total} GT instances total")
    print(f"{'setting':>10} | {'agree vs dense':>14} | "
          f"{'seed-seed agree':>15} | {'cost relRMSE':>12}")
    for name in settings:
        print(f"{name:>10} | {np.mean(agree_dense[name]):14.4f} | "
              f"{np.mean(agree_pairwise[name]):15.4f} | "
              f"{np.mean(cost_rel_rmse[name]):12.5f}")


if __name__ == "__main__":
    main()
