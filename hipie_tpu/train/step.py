"""Jitted training step: CDN prep -> model forward -> fg/bg/gt + MaskDINO
criterion passes -> weighted total -> AdamW update. Designed to run under a
("data", "model") mesh with data-sharded batches and TP-sharded params.

Behavioral parity target: the training orchestration of reference
ddetrs_dn.py coco_forward (:264-748) + hipie_img.py forward train branch
(:287-313) + train_net.py optimizer wrapper (:166-244). Structural notes:
  * query layout [dn | bg | fg]; fg matched by simOTA, bg (stuff) by
    Hungarian-with-mask-costs, dn slots by fixed CDN indices.
  * pass weights FINAL_FG/BG/GT_WEIGHT = 1.0 / 0.0 / 1.0 (r50.yaml:27-29).
  * MaskDINO branch supervised by its own criterion (class 4 / mask 5 / dice 5 /
    box 5 / giou 2, maskdino yaml) on all targets, plus interm (two-stage init)
    and seg-DN (noised-box, language-label-encoded) supervision.
  * encoder-proposal (_enc) losses ride the gt pass, as in the reference.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hipie_tpu.config import HIPIEConfig
from hipie_tpu.losses.criterion import (
    Targets,
    apply_weight_dict,
    criterion_pass,
    encoder_loss_pass,
    merge_loss_dicts,
)
from hipie_tpu.models.dn import prepare_cdn
from hipie_tpu.models.mask_head import dynamic_conv_param_sizes
from hipie_tpu.train.bg_lang import prepare_bg_lang_queries
from hipie_tpu.train.optimizer import build_optimizer


class TrainBatch(NamedTuple):
    images: jnp.ndarray         # (B, H, W, 3)
    pad_mask: jnp.ndarray       # (B, H, W) True = pad
    input_ids: jnp.ndarray      # (B, L)
    lang_mask: jnp.ndarray      # (B, L)
    image_sizes: jnp.ndarray    # (B, 2)
    targets: Targets


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_loss_fn(model, cfg: HIPIEConfig, task: str = "detection"):
    mc = cfg.model
    lc = mc.loss
    md_lc = dataclasses.replace(
        lc, class_weight=4.0, bbox_weight=5.0, giou_weight=2.0,
        mask_weight=5.0, dice_weight=5.0)
    weight_nums, bias_nums = dynamic_conv_param_sizes(
        mc.transformer.d_model // 32, mc.mask_head.dynamic_mask_channels,
        mc.mask_head.num_dynamic_layers, mc.mask_head.use_rel_coord)
    n_bg = mc.transformer.num_bg_queries
    n_bgl = (mc.transformer.num_bg_lang_queries
             if mc.bg_query_from_lang else 0)
    n_match = mc.transformer.num_queries + n_bg + n_bgl
    max_matched = mc.max_matched_masks

    def loss_fn(params, batch: TrainBatch, rng: jax.Array):
        t = batch.targets
        k_dn, k_fg, k_bg, k_gt, k_md, k_bgl = jax.random.split(rng, 6)
        cdn = None
        dn_kwargs = {}
        bgl = None
        if n_bgl > 0:
            bgl = prepare_bg_lang_queries(
                k_bgl, t.labels, t.positive_map, t.is_thing, t.valid,
                batch.lang_mask, mc.num_classes, n_bgl)
            dn_kwargs["bg_lang_weights"] = bgl.weights
        if mc.dn.enabled:
            cdn = prepare_cdn(
                k_dn, t.labels, t.boxes, t.valid, mc.num_classes, n_match,
                dn_number=mc.dn.dn_number,
                label_noise_ratio=mc.dn.label_noise_ratio,
                box_noise_scale=mc.dn.box_noise_scale)
            dn_kwargs.update(dn_labels=cdn.noised_labels,
                             dn_valid=cdn.slot_valid,
                             dn_refs_unact=cdn.refs_unact,
                             self_attn_mask=cdn.attn_mask)
        md_dn = None
        if mc.maskdino.enabled and mc.dn.enabled:
            k_dn2 = jax.random.fold_in(k_dn, 7)
            md_dn = prepare_cdn(
                k_dn2, t.labels, t.boxes, t.valid, mc.num_classes,
                mc.maskdino.num_queries, dn_number=mc.maskdino.dn_queries,
                label_noise_ratio=0.0,
                box_noise_scale=mc.maskdino.noise_scale)
            dn_kwargs.update(maskdino_dn_refs=md_dn.refs_unact,
                             maskdino_dn_valid=md_dn.slot_valid,
                             maskdino_attn_mask=md_dn.attn_mask)
        out = model.apply(
            params, batch.images, batch.pad_mask, batch.input_ids,
            batch.lang_mask, batch.image_sizes, task=task, train=True,
            rngs={"dropout": jax.random.fold_in(rng, 7)},
            **dn_kwargs)

        # query layout [dn | bg_lang | bg | fg] (reference ddetrs_dn.py
        # :446-448: start_bg_lang=pad, start_bg=pad+num_bg_lang, fg after both)
        pad = cdn.pad_size if cdn is not None else 0
        start_bgl = pad
        start_bg = pad + n_bgl
        start_fg = start_bg + n_bg

        def slice_layers(s, e, with_iou):
            lo = {
                "classes": out["outputs_class"][:, :, s:e],
                "boxes": out["outputs_coord"][:, :, s:e],
                "ctrl": out["ctrl_params"][:, :, s:e],
                "refs": out["layer_refs"][:, :, s:e],
            }
            if with_iou and "outputs_iou" in out:
                lo["ious"] = out["outputs_iou"][:, :, s:e]
            return lo

        common = dict(
            text_mask=batch.lang_mask, mask_feats=out["mask_feats"],
            image_sizes=batch.image_sizes, cfg=lc,
            weight_nums=weight_nums, bias_nums=bias_nums,
            dyn_channels=mc.mask_head.dynamic_mask_channels,
            max_matched=max_matched)

        fg_targets = t._replace(valid=t.valid & t.is_thing)
        bg_targets = t._replace(valid=t.valid & ~t.is_thing)

        passes, weights = [], []
        if lc.final_fg_weight != 0.0:
            with jax.named_scope("crit_fg"):
                passes.append(criterion_pass(
                    k_fg, slice_layers(start_fg, None, True), fg_targets,
                    matcher="ota" if lc.matcher == "ota" else "hungarian",
                    **common))
            weights.append(lc.final_fg_weight)
        if lc.final_bg_weight != 0.0:
            if bgl is not None:
                # bg_lang pass REPLACES the bg pass weight (reference
                # ddetrs_dn.py:719-726 appends the bg_lang losses at the bg
                # weight and zeroes all_weights[1]; it still runs the bg pass
                # at weight 0 — skipped here, same gradients).
                with jax.named_scope("crit_bg_lang"):
                    passes.append(criterion_pass(
                        jax.random.fold_in(k_bg, 1),
                        slice_layers(start_bgl, start_bg, False), bg_targets,
                        matcher="fixed", fixed_assign=bgl.assign, **common))
            else:
                with jax.named_scope("crit_bg"):
                    passes.append(criterion_pass(
                        k_bg, slice_layers(start_bg, start_fg, False),
                        bg_targets, matcher="hungarian", **common))
            weights.append(lc.final_bg_weight)
        # encoder-proposal loss: the top-k selection feeding the decoder is
        # stop_gradient-ed, so without this pass the two-stage heads would get
        # ZERO gradient (reference attaches enc_outputs to the gt pass,
        # ddetrs_dn.py :700-704 — weighted like it, but computed regardless of
        # whether CDN is enabled).
        with jax.named_scope("crit_enc"):
            enc_losses = encoder_loss_pass(
                out["enc_outputs_class"],
                jax.nn.sigmoid(out["enc_outputs_coord_unact"]),
                t, batch.lang_mask, lc,
                still_cls=mc.still_cls_for_encoder)
        if cdn is not None and lc.final_gt_weight != 0.0:
            with jax.named_scope("crit_gt_dn"):
                losses_gt = criterion_pass(
                    k_gt, slice_layers(0, pad, False), t,
                    matcher="fixed", fixed_assign=cdn.gt_assign, **common)
            losses_gt.update(enc_losses)
            passes.append(losses_gt)
            weights.append(lc.final_gt_weight)
        else:
            passes.append(enc_losses)
            weights.append(lc.final_gt_weight or 1.0)
        merged = merge_loss_dicts(passes, weights)
        total = apply_weight_dict(merged, lc)

        metrics = {k: v for k, v in merged.items() if "_" not in k[5:]}
        if mc.maskdino.enabled and "maskdino" in out:
            md = out["maskdino"]
            # training emits mask EMBEDDINGS + the shared pixel-feature map
            # (emit_embeds=True): the criterion samples/selects from the linear
            # head instead of dense per-layer (Q, H4, W4) logits.
            md_pixel_feats = md["mask_features"]
            md_layers = {
                "classes": jnp.stack(md["aux"]["classes"] + [md["pred_logits"]]),
                "boxes": jnp.stack(md["aux"]["boxes"] + [md["pred_boxes"]]),
                "mask_embeds": jnp.stack(
                    md["aux"]["mask_embeds"] + [md["pred_mask_embed"]]),
            }
            # the dn slots (when present) sit in FRONT of the matching queries;
            # supervise them with fixed CDN indices and the rest by Hungarian
            # matching (reference maskdino criterion + mask_dict dn losses).
            md_pad = md_dn.pad_size if md_dn is not None else 0
            md_layers_match = {k: v[:, :, md_pad:] for k, v in md_layers.items()}
            with jax.named_scope("crit_maskdino"):
                losses_md = criterion_pass(
                    k_md, md_layers_match, t, matcher="hungarian",
                    text_mask=batch.lang_mask, mask_feats=out["mask_feats"],
                    image_sizes=batch.image_sizes, cfg=md_lc,
                    weight_nums=weight_nums, bias_nums=bias_nums,
                    max_matched=max_matched, pixel_feats=md_pixel_feats)
            if md_dn is not None:
                md_layers_dn = {k: v[:, :, :md_pad] for k, v in md_layers.items()}
                with jax.named_scope("crit_maskdino_dn"):
                    losses_md_dn = criterion_pass(
                        jax.random.fold_in(k_md, 3), md_layers_dn, t,
                        matcher="fixed", fixed_assign=md_dn.gt_assign,
                        text_mask=batch.lang_mask, mask_feats=out["mask_feats"],
                        image_sizes=batch.image_sizes, cfg=md_lc,
                        weight_nums=weight_nums, bias_nums=bias_nums,
                        max_matched=max_matched, pixel_feats=md_pixel_feats)
                losses_md.update({f"{k}_dn": v for k, v in losses_md_dn.items()})
            # interm (two-stage init) supervision, '_interm'-suffixed in the
            # reference maskdino criterion.
            interm = md["interm_outputs"]
            interm_layers = {
                "classes": interm["pred_logits"][None],
                "boxes": interm["pred_boxes"][None],
                "mask_embeds": interm["pred_mask_embed"][None],
            }
            k_md2 = jax.random.fold_in(k_md, 1)
            with jax.named_scope("crit_maskdino_interm"):
                losses_interm = criterion_pass(
                    k_md2, interm_layers, t, matcher="hungarian",
                    text_mask=batch.lang_mask, mask_feats=out["mask_feats"],
                    image_sizes=batch.image_sizes, cfg=md_lc,
                    weight_nums=weight_nums, bias_nums=bias_nums,
                    max_matched=max_matched, pixel_feats=md_pixel_feats)
            losses_md.update({f"{k}_interm": v for k, v in losses_interm.items()})
            total = total + apply_weight_dict(losses_md, md_lc)
            metrics.update({f"{k}_maskdino": v for k, v in losses_md.items()
                            if "_" not in k[5:]})
        metrics["total_loss"] = total
        return total, metrics

    return loss_fn


def create_train_state(model, cfg: HIPIEConfig, rng, sample_batch: TrainBatch):
    t = sample_batch.targets
    kwargs = dict(
        dn_labels=jnp.zeros_like(t.labels),
        dn_valid=jnp.ones_like(t.valid),
        dn_refs_unact=jnp.zeros(t.boxes.shape, jnp.float32))
    if cfg.model.maskdino.enabled and cfg.model.dn.enabled:
        kwargs.update(maskdino_dn_refs=jnp.zeros(t.boxes.shape, jnp.float32),
                      maskdino_dn_valid=jnp.ones_like(t.valid))
    params = jax.jit(model.init, static_argnames=("train",))(
        rng, sample_batch.images, sample_batch.pad_mask, sample_batch.input_ids,
        sample_batch.lang_mask, sample_batch.image_sizes, train=True, **kwargs)
    tx = build_optimizer(cfg.solver, params)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def make_train_step(model, cfg: HIPIEConfig, tx, task: str = "detection",
                    donate: bool = True):
    loss_fn = make_loss_fn(model, cfg, task)

    def train_step(state: TrainState, batch: TrainBatch, rng: jax.Array):
        (total, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
