"""Fuzz-diff PanopticEvaluator against an independent oracle that follows the
CANONICAL panopticapi `pq_compute_single_core` / `PQStat.pq_average` flow
(cocodataset/panopticapi panoptic_evaluation.py — the implementation the
reference's numbers come from via detectron2
`/root/reference/detectron2/evaluation/panoptic_evaluation.py`, which shells
out to `panopticapi.evaluation.pq_compute`; panopticapi itself is not
installed in this image, so the oracle re-states its published algorithm
verbatim-in-structure: OFFSET-packed joint histogram, dict-based per-segment
bookkeeping, crowd-by-category FP shielding, per-class skip when
tp+fp+fn == 0).

Known deliberate divergence (not exercised here, COCO GT never produces it):
panopticapi keeps ONE crowd segment per category per image
(`crowd_labels_dict[cat] = gt_label` overwrites), so with multiple same-class
crowd GT segments only the last shields FPs; our evaluator sums over all of
them. The generator therefore emits at most one crowd segment per category
per image, which is the COCO panoptic format guarantee.
"""

import numpy as np
import pytest

from hipie_tpu.evaluation.seg_eval import PanopticEvaluator

pytestmark = pytest.mark.fast  # curated inner-loop tier (tests/conftest.py)

_OFFSET = 256 ** 3
_VOID = 0


def _pq_oracle(images, num_classes, is_thing):
    stat = {c: dict(iou=0.0, tp=0, fp=0, fn=0) for c in range(num_classes)}
    for gt_map, gt_segments, pred_map, pred_segments in images:
        gt_segms = {el["id"]: dict(el) for el in gt_segments}
        pred_segms = {el["id"]: dict(el) for el in pred_segments}
        # panopticapi recomputes pred areas from the map (and trusts the COCO
        # ann for gt; the generator keeps them consistent so recompute both)
        for segms, pan in ((gt_segms, gt_map), (pred_segms, pred_map)):
            labels, cnt = np.unique(pan, return_counts=True)
            for lab, c in zip(labels, cnt):
                if lab == _VOID:
                    continue
                segms[int(lab)]["area"] = int(c)

        joint = gt_map.astype(np.uint64) * _OFFSET + pred_map.astype(np.uint64)
        labels, cnt = np.unique(joint, return_counts=True)
        gt_pred_map = {(int(l) // _OFFSET, int(l) % _OFFSET): int(c)
                       for l, c in zip(labels, cnt)}

        gt_matched, pred_matched = set(), set()
        for (gl, pl), inter in gt_pred_map.items():
            if gl not in gt_segms or pl not in pred_segms:
                continue
            if gt_segms[gl].get("iscrowd", 0) == 1:
                continue
            if gt_segms[gl]["category_id"] != pred_segms[pl]["category_id"]:
                continue
            union = (pred_segms[pl]["area"] + gt_segms[gl]["area"] - inter
                     - gt_pred_map.get((_VOID, pl), 0))
            iou = inter / union
            if iou > 0.5:
                cat = gt_segms[gl]["category_id"]
                stat[cat]["tp"] += 1
                stat[cat]["iou"] += iou
                gt_matched.add(gl)
                pred_matched.add(pl)

        crowd_by_cat = {}
        for gl, info in gt_segms.items():
            if info.get("iscrowd", 0) == 1:
                crowd_by_cat[info["category_id"]] = gl
        for gl, info in gt_segms.items():
            if gl in gt_matched or info.get("iscrowd", 0) == 1:
                continue
            stat[info["category_id"]]["fn"] += 1
        for pl, info in pred_segms.items():
            if pl in pred_matched:
                continue
            inter = gt_pred_map.get((_VOID, pl), 0)
            cat = info["category_id"]
            if cat in crowd_by_cat:
                inter += gt_pred_map.get((crowd_by_cat[cat], pl), 0)
            if inter / info["area"] > 0.5:
                continue
            stat[cat]["fp"] += 1

    def average(mask):
        pq = sq = rq = 0.0
        n = 0
        for c in range(num_classes):
            if not mask[c]:
                continue
            s = stat[c]
            denom = s["tp"] + 0.5 * s["fp"] + 0.5 * s["fn"]
            if denom == 0:
                continue
            n += 1
            pq += s["iou"] / denom
            sq += s["iou"] / s["tp"] if s["tp"] else 0.0
            rq += s["tp"] / denom
        n = max(n, 1)
        return pq / n * 100, sq / n * 100, rq / n * 100

    is_thing = np.asarray(is_thing, bool)
    pq, sq, rq = average(np.ones(num_classes, bool))
    pq_th, _, _ = average(is_thing)
    pq_st, _, _ = average(~is_thing)
    return {"PQ": pq, "SQ": sq, "RQ": rq, "PQ_th": pq_th, "PQ_st": pq_st}


def _voronoi_map(rng, h, w, ids):
    """Pixel -> nearest seed point; returns (H, W) int32 of the given ids."""
    k = len(ids)
    py = rng.randint(0, h, k)
    px = rng.randint(0, w, k)
    yy, xx = np.mgrid[:h, :w]
    d = (yy[None] - py[:, None, None]) ** 2 + (xx[None] - px[:, None, None]) ** 2
    return np.asarray(ids, np.int32)[np.argmin(d, axis=0)]


def _random_panoptic_problem(rng, num_classes, h=48, w=64):
    """One image: consistent (gt_map, gt_segments, pred_map, pred_segments)
    with void regions, <=1 crowd per category, near-miss IoUs, and category
    confusion between prediction and GT."""
    n_gt = rng.randint(3, 9)
    gt_ids = np.arange(1, n_gt + 1)
    gt_map = _voronoi_map(rng, h, w, gt_ids)
    # carve void patches (id 0)
    for _ in range(rng.randint(0, 3)):
        y, x = rng.randint(0, h), rng.randint(0, w)
        s = rng.randint(3, 14)
        gt_map[y:y + s, x:x + s] = _VOID

    # prediction: jittered seeds + id splits/merges + void patches
    n_pr = rng.randint(3, 9)
    pr_ids = np.arange(1, n_pr + 1)
    if rng.rand() < 0.7:
        # correlated with gt: start from gt_map, remap ids with occasional
        # merges, then shift a few pixels (near-0.5-IoU cases)
        remap = rng.randint(1, n_pr + 1, n_gt + 1)
        pred_map = remap[np.minimum(gt_map, n_gt)].astype(np.int32)
        pred_map[gt_map == _VOID] = rng.randint(0, n_pr + 1)
        dy, dx = rng.randint(-4, 5), rng.randint(-4, 5)
        pred_map = np.roll(pred_map, (dy, dx), axis=(0, 1))
    else:
        pred_map = _voronoi_map(rng, h, w, pr_ids)
    for _ in range(rng.randint(0, 2)):
        y, x = rng.randint(0, h), rng.randint(0, w)
        s = rng.randint(3, 10)
        pred_map[y:y + s, x:x + s] = _VOID

    def segments_for(pan, crowd_allowed):
        segs, crowd_cats = [], set()
        for sid in np.unique(pan):
            if sid == _VOID:
                continue
            cat = int(rng.randint(0, num_classes))
            s = {"id": int(sid), "category_id": cat}
            if crowd_allowed and cat not in crowd_cats and rng.rand() < 0.25:
                s["iscrowd"] = 1
                crowd_cats.add(cat)
            segs.append(s)
        return segs

    gt_segments = segments_for(gt_map, crowd_allowed=True)
    pred_segments = segments_for(pred_map, crowd_allowed=False)
    # bias toward category agreement so matches actually occur: copy the
    # majority-overlap GT category onto each pred segment half the time
    gt_cat = {s["id"]: s["category_id"] for s in gt_segments}
    for s in pred_segments:
        if rng.rand() < 0.6:
            m = pred_map == s["id"]
            under = gt_map[m]
            under = under[under != _VOID]
            if under.size:
                ids, cnt = np.unique(under, return_counts=True)
                s["category_id"] = gt_cat[int(ids[np.argmax(cnt)])]
    return gt_map, gt_segments, pred_map, pred_segments


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_pq_matches_panopticapi_semantics(seed):
    rng = np.random.RandomState(seed)
    num_classes = rng.randint(3, 7)
    is_thing = rng.rand(num_classes) < 0.6
    images = [_random_panoptic_problem(rng, num_classes)
              for _ in range(rng.randint(2, 6))]

    ev = PanopticEvaluator(num_classes=num_classes, is_thing=is_thing)
    for gt_map, gt_segments, pred_map, pred_segments in images:
        ev.add_image(pred_map, pred_segments, gt_map, gt_segments)
    got = ev.evaluate()
    want = _pq_oracle(images, num_classes, is_thing)
    for k in ("PQ", "SQ", "RQ", "PQ_th", "PQ_st"):
        assert got[k] == pytest.approx(want[k], abs=1e-9), \
            f"seed {seed} {k}: {got[k]} vs oracle {want[k]}"


def test_pq_crowd_shields_fp_and_skips_fn():
    """A same-category prediction fully inside a crowd GT region: no FP
    (crowd shielding), no TP (crowd never matches), no FN (crowd excluded)."""
    ev = PanopticEvaluator(num_classes=2, is_thing=[True, False])
    gt = np.full((16, 16), 1, np.int32)
    pred = np.full((16, 16), 7, np.int32)
    ev.add_image(pred, [{"id": 7, "category_id": 0}],
                 gt, [{"id": 1, "category_id": 0, "iscrowd": 1}])
    got = ev.evaluate()
    oracle = _pq_oracle(
        [(gt, [{"id": 1, "category_id": 0, "iscrowd": 1}],
          pred, [{"id": 7, "category_id": 0}])], 2, [True, False])
    assert got["PQ"] == oracle["PQ"] == 0.0
    assert ev.tp.sum() == ev.fp.sum() == ev.fn.sum() == 0


def test_pq_void_majority_pred_not_fp():
    """A prediction >50% covered by void is not an FP (panopticapi rule).
    The pred's category differs from the GT's so it cannot match as TP."""
    ev = PanopticEvaluator(num_classes=2, is_thing=[True, True])
    gt = np.zeros((10, 10), np.int32)           # all void
    gt[:2] = 1                                   # small real GT, category 0
    pred = np.full((10, 10), 3, np.int32)        # one big pred, 80% on void
    gt_segs = [{"id": 1, "category_id": 0}]
    pr_segs = [{"id": 3, "category_id": 1}]
    ev.add_image(pred, pr_segs, gt, gt_segs)
    oracle = _pq_oracle([(gt, gt_segs, pred, pr_segs)], 2, [True, True])
    got = ev.evaluate()
    for k in ("PQ", "SQ", "RQ"):
        assert got[k] == pytest.approx(oracle[k], abs=1e-9)
    assert ev.fp.sum() == 0 and ev.fn[0] == 1

def test_pq_void_subtracted_union_promotes_match():
    """panopticapi subtracts the pred's void overlap from the union: a pred
    covering GT + void exactly still matches at IoU 1.0 (TP, not FP+FN)."""
    ev = PanopticEvaluator(num_classes=1, is_thing=[True])
    gt = np.zeros((10, 10), np.int32)
    gt[:2] = 1
    pred = np.full((10, 10), 3, np.int32)
    gt_segs = [{"id": 1, "category_id": 0}]
    pr_segs = [{"id": 3, "category_id": 0}]
    ev.add_image(pred, pr_segs, gt, gt_segs)
    oracle = _pq_oracle([(gt, gt_segs, pred, pr_segs)], 1, [True])
    got = ev.evaluate()
    assert got["PQ"] == pytest.approx(oracle["PQ"], abs=1e-9) == 100.0
    assert ev.tp[0] == 1
