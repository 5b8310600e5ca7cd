"""High-level inference API: image + text prompts -> instance/panoptic/semantic
masks. This is the interface the reference notebooks use.

Behavioral parity target: reference projects/HIPIE/predictor.py
(HIPIEPredictor.__call__ :245-372 — ResizeShortestEdge, prompt/label-map
construction, model call, result dicts) and demo_lib/part_segm_demo.py
(PartSegmDemo :191-354 — parse_def_string label sets, panoptic + parts second
pass, referring + part intersection).

The device work is one jitted program per (bucket, label-set-size); the host does
tokenization, resizing and final rescale to the original resolution.
"""

from __future__ import annotations

import functools
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from hipie_tpu.config import HIPIEConfig
from hipie_tpu.data import transforms as T
from hipie_tpu.data.prompts import PromptSpec, build_prompt_spec, grounding_prompt_spec
from hipie_tpu.models.hipie import HIPIEModel, hipie_inference
from hipie_tpu.models.text.tokenizer import WordPieceTokenizer


def _batched_bilinear(arr: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Vectorized bilinear resize of a (N, H, W) stack (align_corners=False,
    edge-clamped — cv2.INTER_LINEAR semantics) in four fancy-index gathers."""
    n, h, w = arr.shape
    oh, ow = out_hw
    ys = (np.arange(oh, dtype=np.float32) + 0.5) * (h / oh) - 0.5
    xs = (np.arange(ow, dtype=np.float32) + 0.5) * (w / ow) - 0.5
    y0 = np.floor(ys); x0 = np.floor(xs)
    ly = (ys - y0)[None, :, None]
    lx = (xs - x0)[None, None, :]
    y0i = np.clip(y0.astype(np.int64), 0, h - 1)
    y1i = np.clip(y0i + 1, 0, h - 1)
    x0i = np.clip(x0.astype(np.int64), 0, w - 1)
    x1i = np.clip(x0i + 1, 0, w - 1)
    a = arr[:, y0i[:, None], x0i[None, :]]
    b = arr[:, y0i[:, None], x1i[None, :]]
    c = arr[:, y1i[:, None], x0i[None, :]]
    d = arr[:, y1i[:, None], x1i[None, :]]
    return (a * (1 - ly) * (1 - lx) + b * (1 - ly) * lx
            + c * ly * (1 - lx) + d * ly * lx)


def parse_def_string(defs: Sequence[str]) -> Tuple[List[str], List[bool]]:
    """'name' or 'name:stuff' entries -> (names, is_thing) like
    part_segm_demo.py parse_def_string (:237-276)."""
    names, is_thing = [], []
    for d in defs:
        name, _, kind = d.partition(":")
        names.append(name.strip())
        is_thing.append(kind.strip().lower() != "stuff")
    return names, is_thing


class HIPIEPredictor:
    def __init__(self, cfg: HIPIEConfig, params, tokenizer: WordPieceTokenizer,
                 bucket: Tuple[int, int] = (800, 1216), clip_scorer=None):
        import jax

        self.cfg = cfg
        self.params = params
        self.tok = tokenizer
        self.bucket = bucket
        self.model = HIPIEModel(cfg.model)
        self._jitted = {}
        self._compile_lock = threading.Lock()  # AsyncPredictor workers share the jit cache
        # MODEL.CLIP.ENABLED: open-vocab MaskCLIP score ensembling. The scorer
        # holds the frozen CLIP towers + the per-label-set text-embed cache
        # (models/postprocess_clip.CLIPScorer); pass one built from converted
        # open_clip weights for real open-vocab numbers.
        self.clip_scorer = clip_scorer
        if cfg.model.clip.enabled and clip_scorer is None:
            from hipie_tpu.models.postprocess_clip import CLIPScorer
            from hipie_tpu.models.text.clip_tokenizer import CLIPTokenizer
            print("[predictor] MODEL.CLIP.ENABLED with no CLIPScorer given — "
                  "building RANDOM-INIT CLIP towers (pass clip_scorer built "
                  "from convert_clip weights for real open-vocab scores)")
            self.clip_scorer = CLIPScorer(cfg.model.clip, CLIPTokenizer.toy())

    def _run(self, spec: PromptSpec, img: np.ndarray, task: str,
             has_thing: bool):
        import jax
        import jax.numpy as jnp

        cfg = self.cfg
        resized, _ = T.resize_shortest_edge(
            img.astype(np.float32), cfg.data.min_size_test, cfg.data.max_size_test)
        h, w = resized.shape[:2]
        padded, pad_mask = T.pad_to_bucket(resized, self.bucket)
        maps = spec.class_maps()

        clip_fn = clip_overlap = None
        use_clip = (cfg.model.clip.enabled and self.clip_scorer is not None
                    and task == "detection")
        if use_clip:
            # synonym groups: names with commas list synonyms (reference
            # hipie_img.py:818 test_labels[i]['name'].split(','))
            labels = [n.split(",") for n in spec.class_names]
            clip_fn, clip_overlap = self.clip_scorer.make_clip_fn(labels)

        # language-derived bg queries: one per STUFF class, from its positive
        # token weights (reference prepare_bg_queries_lan, hipie_img.py:336)
        n_bg_lang = 0
        bg_lang_weights = None
        if cfg.model.bg_query_from_lang and task == "detection":
            stuff = ~np.asarray(maps.is_thing)
            n_bg_lang = int(stuff.sum())
            if n_bg_lang:
                bg_lang_weights = jnp.asarray(
                    np.asarray(maps.mean_weights)[stuff])

        key = (task, tuple(spec.class_names) if use_clip
               else len(spec.class_names), self.bucket, has_thing, n_bg_lang)
        # hold the lock across check-and-build so concurrent AsyncPredictor
        # workers can't both build (and later compile) the same program; the
        # build itself is cheap (tracing/compilation happens at call time,
        # where jax serializes per-program internally).
        with self._compile_lock:
          if key not in self._jitted:
            model, tcfg, mcfg = self.model, cfg.test, cfg.model

            @functools.partial(jax.jit, static_argnames=())
            def fn(params, images, pad, ids, am, sizes, mw, tm, it, blw):
                from hipie_tpu.models.postprocess import ClassMaps
                m = ClassMaps(mw, tm, it)
                out = model.apply(params, images, pad, ids, am, sizes, task=task,
                                  bg_lang_weights=blw)
                images01 = jnp.clip(images / 255.0, 0.0, 1.0)
                return hipie_inference(out, m, tcfg, mcfg, task=task,
                                       has_thing=has_thing,
                                       pad_mask_s4=pad[0][::4, ::4],
                                       clip_fn=clip_fn,
                                       clip_overlap=clip_overlap,
                                       images01=images01,
                                       n_bg_lang=n_bg_lang)
            self._jitted[key] = fn

        res = self._jitted[key](
            self.params,
            jnp.asarray(padded[None]), jnp.asarray(pad_mask[None]),
            jnp.asarray(spec.input_ids[None]), jnp.asarray(spec.attention_mask[None]),
            jnp.asarray([[h, w]]), maps.mean_weights, maps.token_mask,
            maps.is_thing, bg_lang_weights)
        return jax.tree.map(np.asarray, res), (h, w)

    # -- result post-processing to original resolution -----------------------

    def _rescale_masks(self, mask_logits: np.ndarray, valid_hw, out_hw,
                       thresh: float = 0.5) -> np.ndarray:
        """stride-4 logits -> bool masks at the original resolution
        (reference segmentation_postprocess: bilinear x4, crop, resize).
        All masks are resized in one vectorized pass (no per-mask host loop)."""
        h, w = valid_hw
        oh, ow = out_hw
        up = _batched_bilinear(mask_logits,
                               (mask_logits.shape[1] * 4, mask_logits.shape[2] * 4))
        up = up[:, :h, :w]
        return _batched_bilinear(up, (oh, ow)) > 0

    def __call__(self, image: np.ndarray, task: str = "detection",
                 expressions: Optional[str] = None,
                 test_categories: Optional[Sequence[str]] = None,
                 test_is_thing: Optional[Sequence[bool]] = None,
                 score_thresh: float = 0.5) -> Dict[str, Any]:
        """image: (H, W, 3) uint8 RGB. Returns dict with instances (boxes xyxy in
        original pixels, scores, classes, masks), panoptic_seg, sem_seg."""
        oh, ow = image.shape[:2]
        if task == "grounding":
            spec = grounding_prompt_spec(expressions or "",
                                         self.tok, self.cfg.data.max_text_len)
            has_thing = True
        else:
            assert test_categories is not None
            if test_is_thing is None:
                test_categories, test_is_thing = parse_def_string(test_categories)
            spec = build_prompt_spec(test_categories, test_is_thing, self.tok,
                                     self.cfg.data.max_text_len)
            has_thing = any(test_is_thing)

        res, (h, w) = self._run(spec, image, task, has_thing)

        keep = res.scores > score_thresh if task == "detection" \
            else np.ones_like(res.scores, bool)
        # boxes are normalized to the VALID region (GT boxes are normalized by
        # the valid image size in training, hipie_img.py prepare_targets :422).
        boxes = res.boxes[keep] * np.array([w, h, w, h])
        boxes = boxes * np.array([ow / w, oh / h, ow / w, oh / h])
        masks = self._rescale_masks(res.mask_logits[keep], (h, w), (oh, ow))

        out: Dict[str, Any] = {
            "instances": {
                "boxes": boxes, "scores": res.scores[keep],
                "classes": res.classes[keep], "masks": masks,
                "class_names": spec.class_names,
            }
        }
        if res.panoptic is not None:
            import cv2
            # crop the VALID stride-4 region before resizing to the original
            # resolution (the maps live on the padded canvas)
            h4, w4 = -(-h // 4), -(-w // 4)
            pan = cv2.resize(res.panoptic[:h4, :w4].astype(np.int32),
                             (ow, oh), interpolation=cv2.INTER_NEAREST)
            seg_ids = np.cumsum(res.segment_valid.astype(np.int64))
            segments = [
                {"id": int(seg_ids[i]),
                 "category_id": int(res.segment_classes[i]),
                 "isthing": bool(res.segment_isthing[i])}
                for i in range(len(res.segment_valid)) if res.segment_valid[i]
            ]
            out["panoptic_seg"] = (pan, segments)
            sem = res.sem_seg[:, :h4, :w4].argmax(0).astype(np.int32)
            out["sem_seg"] = cv2.resize(sem, (ow, oh),
                                        interpolation=cv2.INTER_NEAREST)
        return out


class PartSegmDemo:
    """Hierarchical part segmentation: a second model pass with a parts label
    set intersected with instance masks (part_segm_demo.py:191-354)."""

    def __init__(self, predictor: HIPIEPredictor,
                 part_labels: Sequence[str]):
        self.predictor = predictor
        self.part_labels = list(part_labels)

    def forward_panoptic(self, image: np.ndarray, things_labels: Sequence[str],
                         stuff_labels: Sequence[str], do_part: bool = False):
        cats = list(things_labels) + [f"{s}:stuff" for s in stuff_labels]
        result = self.predictor(image, task="detection", test_categories=cats)
        if do_part:
            result["parts"] = self.forward_parts(image, result)
        return result

    def forward_parts(self, image: np.ndarray, panoptic_result: Dict[str, Any]):
        """Second pass with the parts label set -> per-instance part maps."""
        part_res = self.predictor(
            image, task="detection",
            test_categories=self.part_labels,
            test_is_thing=[False] * len(self.part_labels))
        part_sem = part_res["sem_seg"]
        inst = panoptic_result["instances"]
        out = []
        for m in inst["masks"]:
            out.append(np.where(m, part_sem + 1, 0))     # 0 = not this instance
        return {"part_sem_seg": part_sem, "instance_part_maps": out,
                "part_labels": self.part_labels}

    def forward_reference(self, image: np.ndarray, expression: str,
                          part: Optional[str] = None):
        res = self.predictor(image, task="grounding", expressions=expression,
                             score_thresh=0.0)
        if part is not None and len(res["instances"]["masks"]):
            part_res = self.predictor(
                image, task="detection", test_categories=self.part_labels,
                test_is_thing=[False] * len(self.part_labels))
            pid = self.part_labels.index(part) if part in self.part_labels else -1
            if pid >= 0:
                inst_mask = res["instances"]["masks"][0]
                res["part_mask"] = inst_mask & (part_res["sem_seg"] == pid)
        return res


class AsyncPredictor:
    """Pipelined predictor: overlaps host pre/post-processing of one image
    with device execution of another.

    Reference analog: projects/HIPIE/predictor.py:154-243 AsyncPredictor,
    which spreads inference over per-GPU worker PROCESSES. On TPU a single
    SPMD device queue + JAX's async dispatch gives the same overlap with
    plain threads: each worker thread runs the full predictor call (host
    resize/tokenize -> device dispatch -> host mask rescale); device calls
    from different threads serialize in the device queue while host work
    overlaps.

    Usage:
        ap = AsyncPredictor(predictor, workers=2)
        futs = [ap.submit(img, test_categories=cats) for img in images]
        results = [f.result() for f in futs]          # in submission order
    """

    def __init__(self, predictor: "HIPIEPredictor", workers: int = 2):
        import concurrent.futures

        self.predictor = predictor
        self.pool = concurrent.futures.ThreadPoolExecutor(max_workers=workers)

    def submit(self, image: np.ndarray, **kwargs):
        return self.pool.submit(self.predictor, image, **kwargs)

    def map(self, images: Sequence[np.ndarray], **kwargs):
        """Ordered results for a sequence of images (generator)."""
        futs = [self.submit(im, **kwargs) for im in images]
        for f in futs:
            yield f.result()

    def shutdown(self):
        self.pool.shutdown(wait=True)
