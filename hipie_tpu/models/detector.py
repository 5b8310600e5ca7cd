"""Detector wrapper: backbone -> input projections -> VL transformer -> heads ->
CondInst mask head -> MaskDINO stuff branch.

Behavioral parity target: reference hipie/models/ddetrs_dn.py (DDETRSegmUniDN) and
hipie/models/deformable_detr/deformable_detr.py (DeformableDETRDINO):
  * input_proj: 1x1 conv + GroupNorm(32) per backbone level, plus one stride-2 3x3
    conv + GN producing the extra stride-64 level (deformable_detr.py:221-242).
  * per-decoder-layer heads: VL_Align class logits against text tokens (detection)
    or the pooled text feature (grounding), 3-layer box MLP (inside the
    transformer), per-layer IoU heads (deformable_detr.py:216-217, ddetrs_dn.py
    coco_inference :908-928).
  * controller MLP generates dynamic-conv params; mask head consumes the first
    three encoder memory levels; reference points for rel-coords come from the
    second-to-last decoder layer scaled to valid-image pixels
    (ddetrs_dn.py:952-973).
  * MaskDINO branch run on backbone features (own pixel decoder; r50.yaml does not
    enable SHARE_ENCODER) with its class embeddings projected against language by
    cloned VL_Align heads (ddetrs_dn.py:209-215, post_process_maskdino :244-262).

TPU-first: a single flax module so the entire forward is one jit region with
static shapes; no per-image python loops — all queries get masks at inference,
and training uses fixed-size matched-query gathers (see losses/criterion.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hipie_tpu.config import ModelConfig
from hipie_tpu.layers import MLP, ConvGN, sine_position_embedding_2d
from hipie_tpu.models.backbone import build_backbone, masked_features
from hipie_tpu.models.heads import VLAlign, agg_lang_feat
from hipie_tpu.models.mask_head import (
    MaskFeatureHead,
    dynamic_conv_param_sizes,
    dynamic_mask_with_coords,
)
from hipie_tpu.models.maskdino.model import MaskDINOHead
from hipie_tpu.models.transformer import VLDeformableTransformer


class HIPIEDetector(nn.Module):
    cfg: ModelConfig

    def setup(self):
        if self.cfg.transformer.dropout != 0.0:
            raise NotImplementedError(
                "transformer.dropout is not implemented (all shipped HIPIE "
                "recipes set DROPOUT 0.0, reference r50.yaml:42); refusing to "
                "silently ignore a nonzero setting")
        c = self.cfg
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        self.compute_dtype = dtype
        self.backbone, self.backbone_channels = build_backbone(c.backbone, dtype)
        tc = c.transformer
        self.num_levels = tc.num_feature_levels
        self.input_projs = [
            ConvGN(tc.d_model, 1, dtype=dtype, name=f"input_proj_{i}")
            for i in range(len(c.backbone.out_features))
        ]
        self.extra_projs = [
            ConvGN(tc.d_model, 3, strides=2, dtype=dtype, name=f"input_proj_{i}")
            for i in range(len(c.backbone.out_features), self.num_levels)
        ]
        self.transformer = VLDeformableTransformer(
            cfg=tc, lang_dim=c.text.hidden_size,
            still_cls_for_encoder=c.still_cls_for_encoder, dtype=dtype,
            text_heads=c.text.num_heads,
            text_intermediate=c.text.intermediate_size,
            name="transformer")
        self.class_embeds = [
            VLAlign(c.text.hidden_size, tc.d_model, dtype=dtype, name=f"class_embed_{i}")
            for i in range(tc.num_decoder_layers)
        ]
        if c.use_iou_head:
            self.iou_heads = [
                nn.Dense(1, dtype=dtype, name=f"iou_head_{i}")
                for i in range(tc.num_decoder_layers)
            ]
        mh = c.mask_head
        self.weight_nums, self.bias_nums = dynamic_conv_param_sizes(
            tc.d_model // 32, mh.dynamic_mask_channels, mh.num_dynamic_layers,
            mh.use_rel_coord)
        self.num_gen_params = sum(self.weight_nums) + sum(self.bias_nums)
        self.controller = MLP(tc.d_model, self.num_gen_params, 3, dtype=dtype,
                              name="controller")
        # label embedding for CDN noised-label queries (ddetrs_dn.py:158-160;
        # DYNAMIC_LABEL_ENC is off in the HIPIE image configs).
        self.label_enc = nn.Embed(c.num_classes, tc.d_model, name="label_enc")
        self.mask_feature_head = MaskFeatureHead(tc.d_model, dtype=dtype,
                                                 name="mask_head")
        if c.maskdino.enabled:
            self.mask_dino = MaskDINOHead(c.maskdino, dtype=dtype, name="mask_dino")
            # cloned VL_Align heads projecting MaskDINO class embeddings to text
            # logits: dec_layers + 2 clones (ddetrs_dn.py:209-215).
            self.mask_dino_cls_embeds = [
                VLAlign(c.text.hidden_size, c.maskdino.hidden_dim, dtype=dtype,
                        name=f"mask_dino_cls_embed_{i}")
                for i in range(c.maskdino.dec_layers + 2)
            ]

    def _project_levels(self, features: Dict[str, jnp.ndarray],
                        pad_mask: jnp.ndarray):
        """Project backbone levels to d_model and add extra stride-2 levels."""
        levels = masked_features(features, pad_mask,
                                 num_pos_feats=self.cfg.transformer.d_model // 2)
        srcs = [proj(f) for proj, (_, f, _, _) in zip(self.input_projs, levels)]
        masks = [m for (_, _, m, _) in levels]
        poses = [p.astype(self.compute_dtype) for (_, _, _, p) in levels]
        prev = levels[-1][1]
        for proj in self.extra_projs:
            src = proj(prev)
            m = masks[-1][:, ::2, ::2][:, : src.shape[1], : src.shape[2]]
            pos = sine_position_embedding_2d(
                m, num_pos_feats=self.cfg.transformer.d_model // 2)
            srcs.append(src)
            masks.append(m)
            poses.append(pos.astype(self.compute_dtype))
            prev = src
        return srcs, masks, poses

    def _memory_level_maps(self, memory, spatial_shapes, n=3):
        """Unflatten the first n encoder memory levels into NHWC maps."""
        b = memory.shape[0]
        maps = []
        start = 0
        for (h, w) in spatial_shapes[:n]:
            maps.append(jax.lax.slice_in_dim(memory, start, start + h * w, axis=1)
                        .reshape(b, h, w, -1))
            start += h * w
        return maps

    def __call__(
        self,
        images: jnp.ndarray,            # (B, H, W, 3) normalized, padded
        pad_mask: jnp.ndarray,          # (B, H, W) True = padding
        lang_hidden: jnp.ndarray,       # (B, L, lang_dim)
        lang_masks: jnp.ndarray,        # (B, L)
        image_sizes: jnp.ndarray,       # (B, 2) valid (h, w) per image
        task: str = "detection",
        dn_labels: Optional[jnp.ndarray] = None,      # (B, pad) int32
        dn_valid: Optional[jnp.ndarray] = None,       # (B, pad) bool
        dn_refs_unact: Optional[jnp.ndarray] = None,
        self_attn_mask: Optional[jnp.ndarray] = None,
        bg_queries_lang: Optional[jnp.ndarray] = None,
        bg_lang_weights: Optional[jnp.ndarray] = None,
        maskdino_dn_refs: Optional[jnp.ndarray] = None,
        maskdino_dn_valid: Optional[jnp.ndarray] = None,
        maskdino_attn_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        c = self.cfg
        # stochastic depth (DropPath) must be ACTIVE in training for
        # ViT/Swin/ConvNeXt (reference trains ViT-H with drop_path 0.5);
        # ResNet has no deterministic knob.
        if c.backbone.name.startswith("resnet"):
            features = self.backbone(images)
        else:
            features = self.backbone(images, deterministic=not train)
        srcs, masks, poses = self._project_levels(features, pad_mask)

        dn_tgt = None
        if dn_labels is not None:
            dn_tgt = self.label_enc(dn_labels)
            if dn_valid is not None:
                dn_tgt = jnp.where(dn_valid[..., None], dn_tgt, 0.0)

        t = self.transformer(
            srcs, masks, poses, lang_hidden, lang_masks, task=task,
            dn_tgt=dn_tgt, dn_refs_unact=dn_refs_unact,
            self_attn_mask=self_attn_mask, bg_queries_lang=bg_queries_lang,
            bg_lang_weights=bg_lang_weights)

        hs = t["hs"]                                    # (layers, B, Q, C)
        l_hidden = t["lang_hidden"]
        if task == "grounding":
            lang_for_cls = agg_lang_feat(l_hidden, lang_masks)[:, None, :]
        else:
            lang_for_cls = l_hidden

        outputs: Dict[str, Any] = {
            "outputs_coord": t["outputs_coord"],
            "enc_outputs_class": t["enc_outputs_class"],
            "enc_outputs_coord_unact": t["enc_outputs_coord_unact"],
            "spatial_shapes": t["spatial_shapes"],
            "lang_hidden": l_hidden,
        }
        num_layers = hs.shape[0]
        if train:
            cls_list = [self.class_embeds[i](hs[i], lang_for_cls)
                        for i in range(num_layers)]
            outputs["outputs_class"] = jnp.stack(cls_list)
            if c.use_iou_head:
                outputs["outputs_iou"] = jnp.stack(
                    [self.iou_heads[i](hs[i]).astype(jnp.float32)
                     for i in range(num_layers)])
            # controller params for every query at every layer: the criterion
            # builds matched-query dynamic-conv masks from these (static shapes).
            outputs["ctrl_params"] = jnp.stack(
                [self.controller(hs[i]).astype(jnp.float32)
                 for i in range(num_layers)])
            # per-layer rel-coord reference points (pre-layer refs, ddetrs_dn.py
            # uses inverse_sigmoid(reference) of the layer input).
            refs_list = [t["init_reference"]] + [
                t["inter_references"][i] for i in range(num_layers - 1)]
            outputs["layer_refs"] = jnp.stack(refs_list)
        else:
            outputs["pred_logits"] = self.class_embeds[-1](hs[-1], lang_for_cls)
            outputs["pred_boxes"] = t["outputs_coord"][-1]
            if c.use_iou_head:
                outputs["pred_boxious"] = self.iou_heads[-1](hs[-1]).astype(jnp.float32)

        # ---- mask features (shared by train/inference mask paths) -------------
        mem_maps = self._memory_level_maps(t["memory"], t["spatial_shapes"], 3)
        fused_fpn, mask_feats = self.mask_feature_head(mem_maps)
        outputs["mask_feats"] = mask_feats
        outputs["fused_fpn"] = fused_fpn
        outputs["hs"] = hs
        outputs["inter_references"] = t["inter_references"]
        outputs["init_reference"] = t["init_reference"]

        if not train:
            # masks for ALL queries from the last layer; rel-coord reference points
            # from the second-to-last decoder layer (ddetrs_dn.py:952-958).
            ctrl = self.controller(hs[-1])
            ref2 = t["inter_references"][-2][..., :2]         # (B, Q, 2) normalized
            scale = jnp.stack([image_sizes[:, 1], image_sizes[:, 0]],
                              axis=-1).astype(jnp.float32)     # (B, 2) -> (w, h)
            ref_pix = ref2 * scale[:, None, :]
            outputs["pred_masks"] = dynamic_mask_with_coords(
                mask_feats, ref_pix, ctrl, self.weight_nums, self.bias_nums,
                c.mask_head.dynamic_mask_channels,
                mask_feat_stride=8, mask_out_stride=c.mask_head.mask_out_stride,
                rel_coord=c.mask_head.use_rel_coord)

        # ---- MaskDINO stuff branch --------------------------------------------
        if c.maskdino.enabled:
            shared = None
            if c.maskdino.shared_encoder:
                shared = mem_maps
            lang_pool_md = agg_lang_feat(l_hidden, lang_masks)
            md = self.mask_dino(features, shared_memory_levels=shared,
                                dn_refs_unact=maskdino_dn_refs,
                                dn_valid=maskdino_dn_valid,
                                self_attn_mask=maskdino_attn_mask,
                                lang_pool=lang_pool_md,
                                emit_embeds=train)
            lang_md = lang_for_cls
            md["pred_logits"] = self.mask_dino_cls_embeds[-1](
                md["pred_logits"].astype(self.compute_dtype), lang_md)
            if train:
                md["aux"]["classes"] = [
                    self.mask_dino_cls_embeds[i](cls.astype(self.compute_dtype), lang_md)
                    for i, cls in enumerate(md["aux"]["classes"])
                ]
                # two-stage init ('interm') head uses the second-to-last clone
                # (post_process_maskdino idx=-2, ddetrs_dn.py:661).
                md["interm_outputs"]["pred_logits"] = self.mask_dino_cls_embeds[-2](
                    md["interm_outputs"]["pred_logits"].astype(self.compute_dtype),
                    lang_md)
            outputs["maskdino"] = md
        return outputs

    def predict_masks_for_queries(self, hs_layer, mask_feats, reference_points,
                                  image_sizes):
        """Dynamic-conv masks for an arbitrary (B, K, C) query set (training path)."""
        ctrl = self.controller(hs_layer)
        scale = jnp.stack([image_sizes[:, 1], image_sizes[:, 0]],
                          axis=-1).astype(jnp.float32)
        ref_pix = reference_points[..., :2] * scale[:, None, :]
        return dynamic_mask_with_coords(
            mask_feats, ref_pix, ctrl, self.weight_nums, self.bias_nums,
            self.cfg.mask_head.dynamic_mask_channels,
            mask_feat_stride=8, mask_out_stride=self.cfg.mask_head.mask_out_stride,
            rel_coord=self.cfg.mask_head.use_rel_coord)
