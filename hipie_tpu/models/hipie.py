"""HIPIE meta-architecture: text encoder + detector + fused inference.

Behavioral parity target: reference hipie/hipie_img.py (HIPIE_IMG). The torch
version's forward() dispatches python-side between train/eval and loops over
images; here the whole forward (normalize -> BERT -> detector -> postprocess) is
one jittable function with static task/shape arguments, and per-image work is
vmapped/batched.

Host/device split:
  * host: tokenization (WordPiece), prompt/positive-map construction
    (hipie_tpu/data/prompts.py), image resize to a static bucket, final rescale of
    masks/ids to the original resolution.
  * device: everything else, including NMS, top-k and panoptic fusion.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hipie_tpu.config import HIPIEConfig, ModelConfig, TestConfig
from hipie_tpu.models.detector import HIPIEDetector
from hipie_tpu.models.postprocess import (
    ClassMaps,
    fg_instance_inference,
    grounding_to_od_logits,
    panoptic_inference,
    semantic_inference,
    transform_probs,
)
from hipie_tpu.models.text.bert import BertModel, parallel_det_block_mask


class HIPIEModel(nn.Module):
    cfg: ModelConfig
    parallel_det: bool = False
    sep_token_id: int = 1012       # '.' in bert-base-uncased
    cls_token_id: int = 101
    pad_token_id: int = 0

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        t = c.text
        self.text_encoder = BertModel(
            vocab_size=t.vocab_size, hidden_size=t.hidden_size,
            num_layers=t.num_layers, num_heads=t.num_heads,
            intermediate_size=t.intermediate_size,
            max_position_embeddings=t.max_position_embeddings,
            remat=t.remat, dtype=dtype, name="text_encoder")
        self.detector = HIPIEDetector(c, name="detr")

    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.array(self.cfg.pixel_mean, jnp.float32)
        std = jnp.array(self.cfg.pixel_std, jnp.float32)
        return (images.astype(jnp.float32) - mean) / std

    def encode_text(self, input_ids, attn_mask, task: str = "detection"):
        block_mask = None
        if self.parallel_det and task == "detection":
            block_mask = parallel_det_block_mask(
                input_ids, self.sep_token_id, self.cls_token_id, self.pad_token_id)
        hidden = self.text_encoder(input_ids, attn_mask, block_mask)
        return hidden

    def __call__(
        self,
        images: jnp.ndarray,          # (B, H, W, 3) raw RGB floats
        pad_mask: jnp.ndarray,        # (B, H, W) True = pad
        input_ids: jnp.ndarray,       # (B, L)
        lang_attn_mask: jnp.ndarray,  # (B, L)
        image_sizes: jnp.ndarray,     # (B, 2) valid (h, w)
        task: str = "detection",
        train: bool = False,
        dn_labels=None, dn_valid=None, dn_refs_unact=None, self_attn_mask=None,
        bg_queries_lang=None, bg_lang_weights=None,
        maskdino_dn_refs=None, maskdino_dn_valid=None, maskdino_attn_mask=None,
        lang_hidden=None,
    ) -> Dict[str, Any]:
        x = self.normalize(images)
        x = jnp.where(pad_mask[..., None], 0.0, x)
        if lang_hidden is None:
            # Class-prompt embeddings are input-independent for a fixed label
            # set: callers serving one vocabulary precompute them once via
            # encode_text and pass lang_hidden (the BASELINE.json "text
            # embeddings precomputed and replicated" deployment shape).
            lang_hidden = self.encode_text(input_ids, lang_attn_mask, task)
        out = self.detector(
            x, pad_mask, lang_hidden, lang_attn_mask, image_sizes, task=task,
            dn_labels=dn_labels, dn_valid=dn_valid, dn_refs_unact=dn_refs_unact,
            self_attn_mask=self_attn_mask, bg_queries_lang=bg_queries_lang,
            bg_lang_weights=bg_lang_weights,
            maskdino_dn_refs=maskdino_dn_refs, maskdino_dn_valid=maskdino_dn_valid,
            maskdino_attn_mask=maskdino_attn_mask, train=train)
        return out


class InferenceResult(NamedTuple):
    """Per-image static-shape device outputs; host converts to evaluator format."""

    scores: jnp.ndarray          # (K,)
    classes: jnp.ndarray         # (K,)
    boxes: jnp.ndarray           # (K, 4) xyxy normalized to the PADDED canvas
    mask_logits: jnp.ndarray     # (K, H4, W4) stride-4 instance mask logits
    sem_seg: Optional[jnp.ndarray]       # (C, H4, W4) semantic probabilities
    panoptic: Optional[jnp.ndarray]      # (H4, W4) int32 segment ids
    segment_valid: Optional[jnp.ndarray]
    segment_classes: Optional[jnp.ndarray]
    segment_isthing: Optional[jnp.ndarray]


def hipie_inference(
    outputs: Dict[str, Any],
    maps: ClassMaps,
    test_cfg: TestConfig,
    model_cfg: ModelConfig,
    image_index: int = 0,
    task: str = "detection",
    has_thing: bool = True,
    pad_mask_s4: Optional[jnp.ndarray] = None,   # (H4, W4) True = pad
    clip_fn=None,                    # (images01, (Q,h,w) masks) -> (Q, C) logits
    clip_overlap: Optional[jnp.ndarray] = None,  # (C,) train-vocab overlap
    images01: Optional[jnp.ndarray] = None,      # (1, H, W, 3) in [0, 1]
    n_bg_lang: int = 0,              # language-derived bg queries in front
) -> InferenceResult:
    """Fuse fg/bg branches into instance/semantic/panoptic results for one image.

    reference: hipie_img.py inference() (:537-766) with defaults
    use_bg_for_pano=True (panoptic/semantic entirely from the MaskDINO branch),
    transform_eval=True (softmax(sigmoid/T)), ota NMS 0.7, topk 100.
    When `clip_fn` is given (MODEL.CLIP.ENABLED), MaskCLIP probabilities are
    ensembled into both the fg-instance scores (:596-611) and the pano/semantic
    class probabilities (:736-751); see models/postprocess_clip.py.
    """
    i = image_index
    n_bg = model_cfg.transformer.num_bg_queries
    # query layout [bg_lang | bg | fg] (reference hipie_img.py:560-573: with
    # BG_QUERY_FROM_LANG the bg branch reads the bg_lang block and fg starts
    # after BOTH bg blocks)
    fg_start = n_bg + n_bg_lang
    fg_logits = outputs["pred_logits"][i][fg_start:]
    fg_boxes = outputs["pred_boxes"][i][fg_start:]
    fg_masks = outputs["pred_masks"][i][fg_start:]
    iou = outputs.get("pred_boxious")
    iou_i = iou[i][fg_start:] if iou is not None else None

    clip_prob = None
    if clip_fn is not None and task == "detection":
        from hipie_tpu.models.postprocess_clip import fuse_fg_probs
        fg_cls = grounding_to_od_logits(
            fg_logits, maps, mode="FG" if has_thing else None,
            max_pool=test_cfg.max_pool_tokens)
        clip_logits_fg = clip_fn(images01, fg_masks[None])
        clip_prob = fuse_fg_probs(
            fg_cls, clip_logits_fg, clip_overlap, maps.is_thing, iou_i,
            model_cfg.clip, test_cfg.transform_eval)

    max_det = test_cfg.detections_per_image if task == "detection" else 1
    inst = fg_instance_inference(
        fg_logits, fg_boxes, fg_masks, iou_i, maps,
        max_detections=max_det, nms_thresh=test_cfg.nms_thresh,
        has_thing=has_thing, max_pool=test_cfg.max_pool_tokens,
        clip_prob=clip_prob)

    sem = pano = None
    seg_valid = seg_cls = seg_isthing = None
    if task == "detection":
        md = outputs.get("maskdino")
        n_bg_blk = n_bg_lang if n_bg_lang > 0 else n_bg
        if md is not None:
            bg_token_logits = md["pred_logits"][i]
            bg_mask_logits = md["pred_masks"][i]
        else:
            bg_token_logits = outputs["pred_logits"][i][:n_bg_blk]
            bg_mask_logits = outputs["pred_masks"][i][:n_bg_blk]
        mode = None if (test_cfg.use_bg_for_pano or test_cfg.bg_cls_agnostic) else "BG"
        bg_cls = grounding_to_od_logits(bg_token_logits, maps, mode=mode,
                                        max_pool=test_cfg.max_pool_tokens)
        if test_cfg.use_bg_for_pano:
            all_cls, all_masks = bg_cls, bg_mask_logits
            drop = None
        else:
            all_cls = jnp.concatenate([
                grounding_to_od_logits(fg_logits, maps, mode="FG",
                                       max_pool=test_cfg.max_pool_tokens), bg_cls])
            all_masks = jnp.concatenate([fg_masks, bg_mask_logits])
            drop = jnp.concatenate(
                [~inst.keep_fg, jnp.zeros(bg_cls.shape[0], bool)])
        prob = transform_probs(all_cls, temperature=test_cfg.pano_temperature,
                               transform_eval=test_cfg.transform_eval)
        if clip_fn is not None:
            from hipie_tpu.models.postprocess_clip import fuse_all_probs
            clip_logits_all = clip_fn(images01, all_masks[None])
            prob = fuse_all_probs(prob, clip_logits_all, clip_overlap,
                                  model_cfg.clip)
        if drop is not None:
            prob = jnp.where(drop[:, None], 0.0, prob)
            all_masks = jnp.where(drop[:, None, None], -1e4, all_masks)
        if pad_mask_s4 is not None:
            all_masks = jnp.where(pad_mask_s4[None], -1e4, all_masks)
        sem = semantic_inference(prob, all_masks)
        p = panoptic_inference(prob, all_masks, maps.is_thing,
                               test_cfg.panoptic_object_mask_thresh,
                               test_cfg.panoptic_overlap_thresh,
                               pad_mask=pad_mask_s4)
        pano = p.panoptic_seg
        seg_valid, seg_cls, seg_isthing = (p.segment_valid, p.segment_classes,
                                           p.segment_isthing)

    return InferenceResult(
        scores=inst.scores, classes=inst.classes, boxes=inst.boxes,
        mask_logits=inst.mask_logits, sem_seg=sem, panoptic=pano,
        segment_valid=seg_valid, segment_classes=seg_cls,
        segment_isthing=seg_isthing)
