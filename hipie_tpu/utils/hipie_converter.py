"""Full HIPIE .pth checkpoint -> hipie_tpu parameter tree converter.

Maps the reference HIPIE_IMG state_dict (module paths read from
hipie/hipie_img.py, ddetrs_dn.py, deformable_detr.py,
deformable_transformer_dino.py, maskdino/**) onto the hipie_tpu tree.

Torch module-path layout (r50 config):
  text_encoder.model.*                       HF BertModel (sometimes .body./.0.)
  detr.detr.backbone.0.backbone.*            d2 ResNet / D2ViT
  detr.detr.input_proj.N.{0,1}.*             conv + GroupNorm per level
  detr.detr.transformer.level_embed / tgt_embed / tgt_embed_bg / bg_query_refs
  detr.detr.transformer.enc_output(.norm) / resizer.{fc,layer_norm}
  detr.detr.transformer.encoder.vl_layers.N.b_attn.*   bi-attention fusion
  detr.detr.transformer.encoder.layers.N.*             deformable enc layers
  detr.detr.transformer.decoder.layers.N.*             decoder layers
  detr.detr.transformer.decoder.ref_point_head.layers.{0,1}
  detr.detr.class_embed.N.* / bbox_embed.N.layers.M.* / iou_head.N.*
  detr.controller.layers.M.* / detr.mask_head.{lay1..lay4,jia_dcn}.*
  detr.label_enc.weight
  detr.mask_dino.pixel_decoder.* / detr.mask_dino.predictor.*
  detr.mask_dino_cls_embed.N.*

Use `coverage_report` to list unmapped tensors on both sides — the fast path to
closing residual gaps once real weights are on disk.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from hipie_tpu.config import HIPIEConfig
from hipie_tpu.utils.converter import (
    convert_d2_resnet,
    convert_hf_bert,
    convert_vit,
    stack_trees,
    t_conv,
    t_conv_transpose,
    t_dense_general,
    t_dense_general_out,
    t_embed,
    t_frozen_bn,
    t_linear,
    t_mha,
    t_mlp,
    t_norm,
)


def _detect_prefix(sd: Dict[str, Any], candidates: Sequence[str]) -> Optional[str]:
    for c in candidates:
        if any(k.startswith(c) for k in sd):
            return c
    return None


def t_conv_gn(sd, conv_prefix, gn_prefix):
    return {"conv": t_conv(sd, conv_prefix), "gn": t_norm(sd, gn_prefix)}


def convert_vl_align(sd, p):
    return {
        "dot_product_projection_text": t_linear(sd, f"{p}.dot_product_projection_text"),
        "log_scale": np.asarray(sd[f"{p}.log_scale"]),
        "bias_lang": np.asarray(sd[f"{p}.bias_lang"]),
        "bias0": np.asarray(sd[f"{p}.bias0"]),
    }


def convert_msda(sd, p):
    return {
        "sampling_offsets": t_linear(sd, f"{p}.sampling_offsets"),
        "attention_weights": t_linear(sd, f"{p}.attention_weights"),
        "value_proj": t_linear(sd, f"{p}.value_proj"),
        "output_proj": t_linear(sd, f"{p}.output_proj"),
    }


def convert_enc_layer(sd, p):
    return {
        "self_attn": convert_msda(sd, f"{p}.self_attn"),
        "norm1": t_norm(sd, f"{p}.norm1"),
        "linear1": t_linear(sd, f"{p}.linear1"),
        "linear2": t_linear(sd, f"{p}.linear2"),
        "norm2": t_norm(sd, f"{p}.norm2"),
    }


def convert_dec_layer(sd, p, nhead=8):
    return {
        "cross_attn": convert_msda(sd, f"{p}.cross_attn"),
        "norm1": t_norm(sd, f"{p}.norm1"),
        "self_attn": t_mha(sd, f"{p}.self_attn", nhead),
        "norm2": t_norm(sd, f"{p}.norm2"),
        "linear1": t_linear(sd, f"{p}.linear1"),
        "linear2": t_linear(sd, f"{p}.linear2"),
        "norm3": t_norm(sd, f"{p}.norm3"),
    }


def convert_bi_attention(sd, p, heads=8):
    a = f"{p}.attn"
    return {
        "layer_norm_v": t_norm(sd, f"{p}.layer_norm_v"),
        "layer_norm_l": t_norm(sd, f"{p}.layer_norm_l"),
        "gamma_v": np.asarray(sd[f"{p}.gamma_v"]),
        "gamma_l": np.asarray(sd[f"{p}.gamma_l"]),
        "attn": {
            "v_proj": t_dense_general(sd, f"{a}.v_proj", heads),
            "l_proj": t_dense_general(sd, f"{a}.l_proj", heads),
            "values_v_proj": t_dense_general(sd, f"{a}.values_v_proj", heads),
            "values_l_proj": t_dense_general(sd, f"{a}.values_l_proj", heads),
            "out_v_proj": t_dense_general_out(sd, f"{a}.out_v_proj", heads),
            "out_l_proj": t_dense_general_out(sd, f"{a}.out_l_proj", heads),
        },
    }


def convert_hipie_checkpoint(sd: Dict[str, np.ndarray],
                             cfg: HIPIEConfig) -> Dict[str, Any]:
    """Full state_dict -> {'params': {...}} for HIPIEModel.

    Note on the VL-Align scale in the bi-attention: the reference multiplies the
    query projection by head_dim^-0.5 AFTER the linear (fuse_helper.py:59); our
    module does the same, so kernels copy through unchanged.
    """
    mc = cfg.model
    tc = mc.transformer
    out: Dict[str, Any] = {}

    # ---- text encoder ------------------------------------------------------
    bert_prefix = _detect_prefix(sd, [
        "text_encoder.model.", "text_encoder.body.model.",
        "text_encoder.0.model.", "lang_encoder.model."])
    if bert_prefix:
        out["text_encoder"] = convert_hf_bert(
            sd, num_layers=mc.text.num_layers, heads=mc.text.num_heads,
            prefix=bert_prefix)

    d = "detr.detr"
    detr: Dict[str, Any] = {}

    # ---- backbone ----------------------------------------------------------
    bb = f"{d}.backbone.0.backbone."
    if any(k.startswith(bb + "stem") for k in sd):
        detr["backbone"] = convert_d2_resnet(sd, mc.backbone.resnet_depth, bb)
    elif any(k.startswith(bb + "layers.") for k in sd):           # Swin
        from hipie_tpu.models.backbone.swin import SWIN_VARIANTS
        from hipie_tpu.utils.converter import convert_swin
        variant = mc.backbone.name if mc.backbone.name in SWIN_VARIANTS \
            else "swin_tiny"
        detr["backbone"] = convert_swin(sd, SWIN_VARIANTS[variant][1], bb)
    elif any(k.startswith(bb + "stages.") for k in sd):           # ConvNeXt
        from hipie_tpu.models.backbone.convnext import CONVNEXT_VARIANTS
        from hipie_tpu.utils.converter import convert_convnext
        variant = mc.backbone.name.replace("convnext_", "")
        if variant not in CONVNEXT_VARIANTS:
            variant = "tiny"
        detr["backbone"] = convert_convnext(sd, CONVNEXT_VARIANTS[variant][0], bb)
    elif any(k.startswith(bb + "patch_embed") for k in sd):       # ViTDet
        from hipie_tpu.models.backbone.vit import VIT_VARIANTS
        depth = VIT_VARIANTS[mc.backbone.name][1]
        detr["backbone"] = convert_vit(sd, depth, bb)

    # ---- input projections -------------------------------------------------
    for i in range(tc.num_feature_levels):
        p = f"{d}.input_proj.{i}"
        if f"{p}.0.weight" in sd:
            detr[f"input_proj_{i}"] = t_conv_gn(sd, f"{p}.0", f"{p}.1")

    # ---- transformer -------------------------------------------------------
    t = f"{d}.transformer"
    tr: Dict[str, Any] = {
        "level_embed": np.asarray(sd[f"{t}.level_embed"]),
        "tgt_embed": np.asarray(sd[f"{t}.tgt_embed.weight"]),
        "enc_output": t_linear(sd, f"{t}.enc_output"),
        "enc_output_norm": t_norm(sd, f"{t}.enc_output_norm"),
        "resizer": {"fc": t_linear(sd, f"{t}.resizer.fc"),
                    "layer_norm": t_norm(sd, f"{t}.resizer.layer_norm")},
    }
    if f"{t}.tgt_embed_bg.weight" in sd:
        tr["tgt_embed_bg"] = np.asarray(sd[f"{t}.tgt_embed_bg.weight"])
        tr["bg_query_refs"] = np.asarray(sd[f"{t}.bg_query_refs.weight"])
    # encoder: the first num_vl_layers layers are unrolled (VLFuse + layer,
    # reference _get_clones_advanced pads vl_layers with Identity past
    # NUM_VL_LAYERS=1, config.py:196); the vision-only tail is nn.scan-stacked.
    n_vl = min(tc.num_vl_layers, tc.num_encoder_layers) \
        if tc.use_vl_fusion else 0
    for i in range(n_vl):
        step = {"layer": convert_enc_layer(sd, f"{t}.encoder.layers.{i}")}
        vp = f"{t}.encoder.vl_layers.{i}.b_attn"
        if f"{vp}.gamma_v" in sd:
            step["vl_layer"] = convert_bi_attention(sd, vp, tc.vl_nheads)
        tr[f"encoder_vl{i}"] = step
    enc_steps = [
        {"layer": convert_enc_layer(sd, f"{t}.encoder.layers.{i}")}
        for i in range(n_vl, tc.num_encoder_layers)]
    if enc_steps:
        tr["encoder"] = stack_trees(enc_steps)
    # decoder layers (unrolled) + shared ref_point_head + per-layer bbox heads.
    for i in range(tc.num_decoder_layers):
        tr[f"dec_layers_{i}"] = convert_dec_layer(
            sd, f"{t}.decoder.layers.{i}", tc.nhead)
        tr[f"bbox_embed_{i}"] = t_mlp(sd, f"{d}.bbox_embed.{i}", 3)
    tr["ref_point_head"] = t_mlp(sd, f"{t}.decoder.ref_point_head", 2)
    # encoder-stage heads are the (num_layers)-indexed clones.
    n_dec = tc.num_decoder_layers
    tr["enc_bbox_embed"] = t_mlp(sd, f"{d}.bbox_embed.{n_dec}", 3)
    if f"{d}.class_embed.{n_dec}.body.weight" in sd:       # Still_Classifier
        tr["enc_class_embed"] = {"body": t_linear(sd, f"{d}.class_embed.{n_dec}.body")}
    elif f"{d}.class_embed.{n_dec}.bias0" in sd:
        tr["enc_class_embed"] = convert_vl_align(sd, f"{d}.class_embed.{n_dec}")
    detr["transformer"] = tr

    # ---- per-layer heads ---------------------------------------------------
    for i in range(tc.num_decoder_layers):
        if f"{d}.class_embed.{i}.bias0" in sd:
            detr[f"class_embed_{i}"] = convert_vl_align(sd, f"{d}.class_embed.{i}")
        if f"{d}.iou_head.{i}.weight" in sd:
            detr[f"iou_head_{i}"] = t_linear(sd, f"{d}.iou_head.{i}")

    # ---- controller / mask head / label enc --------------------------------
    detr["controller"] = t_mlp(sd, "detr.controller", 3)
    mh = "detr.mask_head"
    detr["mask_head"] = {name: t_conv(sd, f"{mh}.{name}")
                         for name in ["lay1", "lay2", "lay3", "lay4", "jia_dcn"]
                         if f"{mh}.{name}.weight" in sd}
    if "detr.label_enc.weight" in sd:
        detr["label_enc"] = t_embed(sd, "detr.label_enc")

    # ---- MaskDINO branch ---------------------------------------------------
    md = "detr.mask_dino"
    if any(k.startswith(md) for k in sd):
        mdc = mc.maskdino
        pix = f"{md}.pixel_decoder"
        # shared-encoder mode (ddetrs_dn.py:636-650) has no pixel-decoder
        # deformable encoder of its own — those keys are absent from the ckpt.
        pd: Dict[str, Any] = {}
        if f"{pix}.transformer.level_embed" in sd:
            pd["level_embed"] = np.asarray(sd[f"{pix}.transformer.level_embed"])
        for i in range(4):
            p = f"{pix}.input_proj.{i}"
            if f"{p}.0.weight" in sd:
                pd[f"input_proj_{i}"] = t_conv_gn(sd, f"{p}.0", f"{p}.1")
        pix_steps = [
            {"layer": convert_enc_layer(
                sd, f"{pix}.transformer.encoder.layers.{i}")}
            for i in range(mdc.enc_layers)
            if f"{pix}.transformer.encoder.layers.{i}.norm1.weight" in sd
        ]
        if pix_steps:
            pd["enc_layers"] = stack_trees(pix_steps)
        if f"{pix}.adapter_1.weight" in sd:
            pd["adapter_1"] = t_conv_gn(sd, f"{pix}.adapter_1",
                                        f"{pix}.adapter_1.norm")
            pd["layer_1"] = t_conv_gn(sd, f"{pix}.layer_1", f"{pix}.layer_1.norm")
        if f"{pix}.mask_features.0.weight" in sd:
            pd["mask_features_up"] = t_conv_transpose(sd, f"{pix}.mask_features.0")
            pd["mask_features_gn"] = t_norm(sd, f"{pix}.mask_features.1")
            pd["mask_features_out"] = t_conv(sd, f"{pix}.mask_features.3")
        pred = f"{md}.predictor"
        pr: Dict[str, Any] = {
            "class_embed": t_linear(sd, f"{pred}.class_embed"),
            "mask_embed": t_mlp(sd, f"{pred}.mask_embed", 3),
            "bbox_embed": t_mlp(sd, f"{pred}._bbox_embed", 3),
            "decoder_norm": t_norm(sd, f"{pred}.decoder_norm"),
            "enc_output": t_linear(sd, f"{pred}.enc_output"),
            "enc_output_norm": t_norm(sd, f"{pred}.enc_output_norm"),
            "ref_point_head": t_mlp(sd, f"{pred}.decoder.ref_point_head", 2),
        }
        for i in range(mdc.dec_layers):
            pr[f"dec_layers_{i}"] = convert_dec_layer(
                sd, f"{pred}.decoder.layers.{i}", mdc.nheads)
        detr["mask_dino"] = {"pixel_decoder": pd, "predictor": pr}
        for i in range(mdc.dec_layers + 2):
            p = f"detr.mask_dino_cls_embed.{i}"
            if f"{p}.bias0" in sd:
                detr[f"mask_dino_cls_embed_{i}"] = convert_vl_align(sd, p)

    out["detr"] = detr
    return {"params": out}


def coverage_report(sd: Dict[str, np.ndarray], converted: Dict[str, Any],
                    params: Dict[str, Any]):
    """Diff mapped/unmapped tensors; returns (unused_torch_keys, missing_paths,
    shape_mismatches) for converter debugging against a real checkpoint."""
    import jax

    flat_conv = {
        "/".join(str(getattr(k, "key", k)) for k in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    flat_params = {
        "/".join(str(getattr(k, "key", k)) for k in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    missing = [k for k in flat_params if k not in flat_conv]
    mismatched = [
        (k, tuple(flat_conv[k].shape), tuple(flat_params[k].shape))
        for k in flat_conv if k in flat_params
        and tuple(flat_conv[k].shape) != tuple(flat_params[k].shape)]
    extra = [k for k in flat_conv if k not in flat_params]
    return {"missing_in_converted": missing, "shape_mismatches": mismatched,
            "extra_in_converted": extra}
