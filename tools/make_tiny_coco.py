#!/usr/bin/env python
"""Generate a tiny synthetic COCO-panoptic dataset (real files on disk).

Produces the exact directory layout `hipie_tpu.data.datasets.load_coco_panoptic`
expects (panopticapi format: id = R + 256G + 65536B pngs + json), so the FULL
data pipeline — registry -> loader -> mapper -> train step — can be exercised
end-to-end without COCO downloads (this environment has no network egress).

Images are shape scenes: a stuff background split into 2 color bands
(sky / grass) plus 1-4 thing instances (circle / square / triangle) with
per-category base colors, drawn over pixel noise so the backbone has texture
to fit. Category names are common English words, so any WordPiece vocab
(including the toy vocab) tokenizes them.

Usage: python tools/make_tiny_coco.py [--root DIR] [--n-train 48] [--n-val 16]
       [--size 512]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

THINGS = [
    ("circle", (220, 40, 40)),
    ("square", (40, 220, 40)),
    ("triangle", (40, 40, 220)),
]
STUFF = [
    ("sky", (90, 150, 230)),
    ("grass", (60, 170, 80)),
]


def _draw_instance(img, pan, rng, kind, color, seg_id, size):
    import cv2
    r = int(rng.randint(size // 12, size // 5))
    cx = int(rng.randint(r, size - r))
    cy = int(rng.randint(r, size - r))
    mask = np.zeros((size, size), np.uint8)
    if kind == "circle":
        cv2.circle(mask, (cx, cy), r, 1, -1)
    elif kind == "square":
        cv2.rectangle(mask, (cx - r, cy - r), (cx + r, cy + r), 1, -1)
    else:  # triangle
        pts = np.array([[cx, cy - r], [cx - r, cy + r], [cx + r, cy + r]])
        cv2.fillPoly(mask, [pts], 1)
    m = mask.astype(bool)
    jitter = rng.randint(-25, 25, 3)
    img[m] = np.clip(np.asarray(color) + jitter, 0, 255)
    pan[m] = seg_id
    return m


def make_split(root, split, n_images, size, seed):
    import cv2
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "coco", split)
    pan_dir = os.path.join(root, "coco", f"panoptic_{split}")
    ann_dir = os.path.join(root, "coco", "annotations")
    for d in (img_dir, pan_dir, ann_dir):
        os.makedirs(d, exist_ok=True)

    categories = []
    for i, (name, _) in enumerate(THINGS):
        categories.append({"id": i + 1, "name": name, "isthing": 1})
    for i, (name, _) in enumerate(STUFF):
        categories.append({"id": 100 + i, "name": name, "isthing": 0})

    images, annotations = [], []
    for idx in range(n_images):
        img_id = idx + 1
        fname = f"{img_id:012d}"
        img = (rng.randn(size, size, 3) * 12 + 128).clip(0, 255).astype(np.uint8)
        pan = np.zeros((size, size), np.int32)

        # stuff: horizontal split at a random height
        horizon = int(rng.randint(size // 4, 3 * size // 4))
        segments = []
        for si, ((name, color), sl) in enumerate(
                zip(STUFF, [np.s_[:horizon], np.s_[horizon:]])):
            seg_id = 1000 + si
            img[sl] = np.clip(
                np.asarray(color) + rng.randint(-20, 20, 3), 0, 255)
            pan[sl] = seg_id
            segments.append({"id": seg_id, "category_id": 100 + si,
                             "iscrowd": 0,
                             "area": int((pan == seg_id).sum())})
        # re-add noise over stuff regions
        img = np.clip(img.astype(np.int16)
                      + rng.randn(size, size, 3) * 8, 0, 255).astype(np.uint8)

        n_inst = int(rng.randint(1, 5))
        for k in range(n_inst):
            ci = int(rng.randint(len(THINGS)))
            kind, color = THINGS[ci]
            seg_id = 2000 + k
            m = _draw_instance(img, pan, rng, kind, color, seg_id, size)
            area = int(m.sum())
            if area < 16:
                continue
            segments.append({"id": seg_id, "category_id": ci + 1,
                             "iscrowd": 0, "area": area})
        # drop fully-occluded segments
        segments = [s for s in segments if (pan == s["id"]).any()]
        for s in segments:
            s["area"] = int((pan == s["id"]).sum())

        cv2.imwrite(os.path.join(img_dir, fname + ".jpg"), img[:, :, ::-1])
        png = np.stack([pan % 256, (pan // 256) % 256, pan // 65536],
                       -1).astype(np.uint8)
        cv2.imwrite(os.path.join(pan_dir, fname + ".png"), png[:, :, ::-1])
        images.append({"id": img_id, "file_name": fname + ".jpg",
                       "height": size, "width": size})
        annotations.append({"image_id": img_id, "file_name": fname + ".png",
                            "segments_info": segments})

    with open(os.path.join(ann_dir, f"panoptic_{split}.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    return len(images)


def emit_ade_semseg(root: str):
    """Mirror the tiny val split into the ADE20k directory layout
    (images/validation + annotations_detectron2/validation) so the standard
    `ade20k_sem_seg_val` registration (data/datasets_extra.py) can be
    exercised end-to-end without the real dataset. GT ids are the tiny
    category ids mapped into the 0-based ADE range; pixels beyond the tiny
    vocab stay `ignore` (255)."""
    import json as _json

    import cv2
    ann = _json.load(open(os.path.join(root, "coco/annotations/panoptic_val2017.json")))
    # contiguous 0-based GT ids, matching load_coco_panoptic's sorted id_map
    # (data/datasets.py): raw category ids (things 1..Nt, stuff 100+i) would
    # disagree with every other tiny-coco consumer's label space.
    cats = sorted(ann["categories"], key=lambda c: c["id"])
    id_map = {c["id"]: i for i, c in enumerate(cats)}
    img_dir = os.path.join(root, "ade/ADEChallengeData2016/images/validation")
    gt_dir = os.path.join(root,
                          "ade/ADEChallengeData2016/annotations_detectron2/validation")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    for im, an in zip(ann["images"], ann["annotations"]):
        img = cv2.imread(os.path.join(root, "coco/val2017", im["file_name"]))
        cv2.imwrite(os.path.join(img_dir, im["file_name"]), img)
        png = cv2.imread(os.path.join(root, "coco/panoptic_val2017",
                                      an["file_name"]))[:, :, ::-1]
        png = png.astype(np.int64)
        pan = png[:, :, 0] + 256 * png[:, :, 1] + 65536 * png[:, :, 2]
        sem = np.full(pan.shape, 255, np.uint8)
        for seg in an["segments_info"]:
            sem[pan == seg["id"]] = id_map[seg["category_id"]]
        cv2.imwrite(os.path.join(gt_dir,
                                 im["file_name"].replace(".jpg", ".png")), sem)
    print(f"emitted ADE-layout semseg val ({len(ann['images'])} images)")


def emit_refcoco(root: str, split: str = "val2017",
                 out_name: str = "refcoco-unc-val"):
    """Emit a tiny RefCOCO-style split (annotations/{out_name}_instances
    .json) from a panoptic split: one referring expression per thing
    instance ("the {kind} in the {region}"), RLE segmentation — the layout
    tools/convert_refcoco.py produces and load_refcoco consumes. Exercises
    the grounding path end-to-end on synthetic data (val -> eval; train ->
    the refcoco-mixed joint-training split)."""
    import json as _json

    import cv2
    sys_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    import sys
    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    from hipie_tpu.evaluation.rle import rle_encode

    ann = _json.load(open(os.path.join(
        root, f"coco/annotations/panoptic_{split}.json")))
    id2name = {c["id"]: c["name"] for c in ann["categories"]}
    out_images, out_anns = [], []
    aid = 1
    for im, an in zip(ann["images"], ann["annotations"]):
        png = cv2.imread(os.path.join(root, f"coco/panoptic_{split}",
                                      an["file_name"]))[:, :, ::-1].astype(np.int64)
        pan = png[:, :, 0] + 256 * png[:, :, 1] + 65536 * png[:, :, 2]
        h, w = pan.shape
        # source images may live outside coco/train2017 but load_refcoco
        # roots there (reference refcoco-mixed reads train2017) — mirror them.
        src_img = os.path.join(root, f"coco/{split}", im["file_name"])
        dst_img = os.path.join(root, "coco/train2017", "ref_" + im["file_name"])
        if not os.path.exists(dst_img):
            import shutil
            shutil.copy(src_img, dst_img)
        out_images.append({"id": 100000 + im["id"],
                           "file_name": "ref_" + im["file_name"],
                           "height": h, "width": w})
        things = [s for s in an["segments_info"] if s["category_id"] < 100]
        for s in things:
            m = (pan == s["id"]).astype(np.uint8)
            if m.sum() < 64:
                continue
            ys, xs = np.nonzero(m)
            x0, y0 = int(xs.min()), int(ys.min())
            bw, bh = int(xs.max() - x0 + 1), int(ys.max() - y0 + 1)
            cx, cy = xs.mean() / w, ys.mean() / h
            horiz = "left" if cx < 0.45 else ("right" if cx > 0.55 else "middle")
            vert = "top" if cy < 0.45 else ("bottom" if cy > 0.55 else "middle")
            kind = id2name[s["category_id"]]
            # several paraphrases per instance (real refcoco has ~3 referring
            # expressions per object; load_refcoco emits one eval record per
            # expression, so this triples the grounding-eval breadth).
            rel_area = m.sum() / float(h * w)
            size_adj = "big" if rel_area > 0.04 else "small"
            exprs = [
                f"the {kind} at the {vert} {horiz}",
                f"{kind} on the {horiz} side near the {vert}",
                f"the {size_adj} {kind} near the {vert}",
            ]
            out_anns.append({
                "id": aid, "image_id": 100000 + im["id"], "category_id": 1,
                "bbox": [x0, y0, bw, bh], "area": int(m.sum()),
                "iscrowd": 0, "expressions": exprs,
                "segmentation": rle_encode(m),
            })
            aid += 1
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    out = {"images": out_images, "annotations": out_anns,
           "categories": [{"id": 1, "name": "object"}]}
    with open(os.path.join(root, "annotations",
                           f"{out_name}_instances.json"), "w") as f:
        _json.dump(out, f)
    print(f"emitted tiny {out_name}: {len(out_anns)} expressions")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/tiny_coco")
    p.add_argument("--n-train", type=int, default=48)
    p.add_argument("--n-val", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--ade-semseg", action="store_true",
                   help="also emit the val split in ADE20k directory layout")
    p.add_argument("--refcoco", action="store_true",
                   help="also emit a tiny refcoco-style grounding split")
    args = p.parse_args()
    n = make_split(args.root, "train2017", args.n_train, args.size, seed=0)
    m = make_split(args.root, "val2017", args.n_val, args.size, seed=1)
    if args.ade_semseg:
        emit_ade_semseg(args.root)
    if args.refcoco:
        emit_refcoco(args.root)
        emit_refcoco(args.root, split="train2017", out_name="refcoco-mixed")
    print(f"wrote {n} train + {m} val images under {args.root} "
          f"(set HIPIE_DATASETS={args.root})")


if __name__ == "__main__":
    main()
