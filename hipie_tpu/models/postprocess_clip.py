"""Open-vocabulary CLIP score ensembling: text-embed cache, train-vocab overlap,
and the inference-side orchestration that fuses MaskCLIP probabilities into the
detector's class scores.

Behavioral parity target: reference hipie/hipie_img.py get_clip_logits
(:811-868) + its two call sites (:596-611 fg instances, :736-751 pano/semantic),
hipie/open_vocab/clip.py build_text_embed (:361-373) and
hipie/open_vocab/helper.py prompt_labels / ensemble_logits_with_labels
(:79-129).

TPU-first: the MaskCLIP visual pass (extra mask-CLS tokens attending only to
in-mask patches) and the score fusion are pure jittable functions; only the
text-embedding cache (per label set, built once) and tokenization live on the
host.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hipie_tpu.config import ClipConfig
from hipie_tpu.models.clip import (
    CLIPText,
    CLIPVisual,
    MaskCLIP,
    clip_score_fusion,
)

# COCO-panoptic names are the default training vocabulary for the released
# checkpoints (O365/COCO/RefCOCO pretraining; overlap is computed on name
# strings like the reference's train_labels set, hipie_img.py:820-826).
_DEFAULT_TRAIN_VOCAB = None  # resolved lazily from data.label_spaces


def prompt_labels(labels: Sequence[Sequence[str]], prompt: str = "photo"
                  ) -> List[List[str]]:
    """reference helper.py prompt_labels (:112-129)."""
    if prompt is None:
        return [list(g) for g in labels]
    fmt = {"a": "a {}", "photo": "a photo of a {}.",
           "scene": "a photo of a {} in the scene."}[prompt]
    return [[fmt.format(l) for l in group] for group in labels]


def category_overlap_mask(test_labels: Sequence[Sequence[str]],
                          train_vocab: Optional[Sequence[str]] = None
                          ) -> np.ndarray:
    """(C,) 1.0 where any synonym of the test class appears in the training
    vocabulary (reference hipie_img.py:820-831)."""
    if train_vocab is None:
        from hipie_tpu.data.label_spaces import COCO_PANOPTIC_133
        train_vocab = COCO_PANOPTIC_133
    vocab = set()
    for name in train_vocab:
        vocab.update(s.strip() for s in name.split(","))
    out = np.zeros(len(test_labels), np.float32)
    for i, group in enumerate(test_labels):
        if not vocab.isdisjoint({s.strip() for s in group}):
            out[i] = 1.0
    return out


class CLIPScorer:
    """Host-side holder of the frozen CLIP towers + text-embedding cache.

    Parameters stay OUT of the train state (reference excludes CLIP from
    state_dict, open_vocab/clip.py:125-126). `params` comes from
    utils/converter.convert_clip on an open_clip checkpoint, or random init
    (tests).
    """

    def __init__(self, cfg: ClipConfig, tokenizer, params: Optional[Dict] = None,
                 visual: Optional[CLIPVisual] = None,
                 text: Optional[CLIPText] = None, dtype=jnp.float32,
                 rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.tok = tokenizer
        self.visual = visual or CLIPVisual(dtype=dtype)
        self.text = text or CLIPText(dtype=dtype)
        self.maskclip = MaskCLIP(visual=self.visual, dtype=dtype)
        self._text_cache: Dict[str, Tuple[jnp.ndarray, Tuple[int, ...]]] = {}
        if params is not None:
            self.text_params = {"params": params["text"]}
            self.maskclip_params = {"params": {
                "vis": params["visual"], "logit_scale": params["logit_scale"]}}
        else:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            ids = jnp.zeros((1, 77), jnp.int32).at[:, 1].set(1)
            self.text_params = jax.jit(self.text.init)(rng, ids)
            img = jnp.zeros((1, self.visual.image_size, self.visual.image_size, 3))
            ml = jnp.zeros((1, 2, 8, 8))
            te = jnp.zeros((3, self.visual.output_dim))
            self.maskclip_params = jax.jit(
                lambda r: self.maskclip.init(r, img, ml, te, (2, 1)))(rng)
        self._text_apply = jax.jit(self.text.apply)

    def build_text_embed(self, labels: Sequence[Sequence[str]],
                         prompt: str = "photo"
                         ) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
        """Per-label-set cached text embeddings (reference clip.py:361-373).

        labels: list (per class) of synonym lists. Returns ((T, C) embeds for
        the flattened prompted synonyms, per-class group sizes)."""
        key = repr([list(g) for g in labels]) + prompt
        if key in self._text_cache:
            return self._text_cache[key]
        prompted = prompt_labels(labels, prompt)
        flat = [p for group in prompted for p in group]
        group_sizes = tuple(len(g) for g in prompted)
        ids = jnp.asarray(self.tok(flat))
        embeds = []
        for s in range(0, ids.shape[0], 256):     # chunk very long label sets
            embeds.append(self._text_apply(self.text_params, ids[s:s + 256]))
        out = (jnp.concatenate(embeds, 0), group_sizes)
        if len(labels) > 1:                        # do not cache referring
            self._text_cache[key] = out
        return out

    def make_clip_fn(self, labels: Sequence[Sequence[str]],
                     train_vocab: Optional[Sequence[str]] = None):
        """Returns (clip_fn, overlap): clip_fn(images01, mask_logits) ->
        (Q, C) ensembled CLIP logits, traceable under jit; overlap (C,) f32.

        The returned function closes over the cached text embeddings so the
        per-image jitted inference only carries the mask-pooled visual pass.
        """
        text_embed, group_sizes = self.build_text_embed(labels)
        overlap = jnp.asarray(category_overlap_mask(labels, train_vocab))
        params = self.maskclip_params

        def clip_fn(images01: jnp.ndarray, mask_logits: jnp.ndarray) -> jnp.ndarray:
            out = self.maskclip.apply(params, images01, mask_logits,
                                      text_embed, group_sizes)
            return out[0] if out.ndim == 3 else out    # (Q, C)

        return clip_fn, overlap


def fuse_fg_probs(cls_logits: jnp.ndarray, clip_logits: jnp.ndarray,
                  overlap: jnp.ndarray, is_thing: jnp.ndarray,
                  iou_logits: Optional[jnp.ndarray], cfg: ClipConfig,
                  transform_eval: bool) -> jnp.ndarray:
    """FG-instance CLIP fusion (reference hipie_img.py:593-608):
    prob = sigmoid(fused_logits) * is_thing; then geometric iou mix with
    exponents FG_IOU_A / FG_IOU_B."""
    if transform_eval:
        pred_prob = jax.nn.softmax(
            jax.nn.sigmoid(cls_logits) / cfg.pano_temperature_fg, axis=-1)
    else:
        pred_prob = jax.nn.sigmoid(cls_logits)
    fused = clip_score_fusion(pred_prob, clip_logits, overlap,
                              cfg.alpha, cfg.beta, cfg.agg_mode)
    prob = jax.nn.sigmoid(fused) * is_thing.astype(jnp.float32)[None]
    if iou_logits is not None:
        iou = jax.nn.sigmoid(iou_logits.astype(jnp.float32))
        prob = jnp.sqrt((prob ** cfg.fg_iou_a) * (iou ** cfg.fg_iou_b))
    return prob


def fuse_all_probs(pred_prob: jnp.ndarray, clip_logits: jnp.ndarray,
                   overlap: jnp.ndarray, cfg: ClipConfig) -> jnp.ndarray:
    """Pano/semantic CLIP fusion (reference hipie_img.py:736-751): fused
    logits -> softmax over classes."""
    fused = clip_score_fusion(pred_prob, clip_logits, overlap,
                              cfg.alpha, cfg.beta, cfg.agg_mode)
    return jax.nn.softmax(fused, axis=-1)
