"""Evaluator tests: RLE roundtrip, AP on synthetic perfect/imperfect detections,
PQ/mIoU/oIoU sanity."""

import numpy as np

import pytest

pytestmark = pytest.mark.fast  # curated inner-loop tier (tests/conftest.py)


def test_rle_roundtrip():
    from hipie_tpu.evaluation.rle import rle_decode, rle_encode, rle_area

    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(37, 23) > 0.6).astype(np.uint8)
        r = rle_encode(m)
        np.testing.assert_array_equal(rle_decode(r), m)
        assert rle_area(r) == int(m.sum())


def test_coco_ap_perfect_detections():
    from hipie_tpu.evaluation.coco_eval import COCOApEvaluator

    ev = COCOApEvaluator("bbox")
    rng = np.random.RandomState(1)
    for img in range(4):
        gts, dets = [], []
        for k in range(3):
            x, y = rng.rand(2) * 100
            w, h = rng.rand(2) * 50 + 40
            box = [x, y, x + w, y + h]
            gts.append({"category_id": k % 2, "bbox": box, "area": w * h})
            dets.append({"category_id": k % 2, "bbox": box, "area": w * h,
                         "score": 0.9})
        ev.add_image(img, gts, dets)
    res = ev.evaluate()
    assert abs(res["AP"] - 100.0) < 1e-6
    assert abs(res["AP50"] - 100.0) < 1e-6


def test_coco_ap_half_detections():
    from hipie_tpu.evaluation.coco_eval import COCOApEvaluator

    ev = COCOApEvaluator("bbox")
    # 2 gts, only 1 detected -> recall 0.5; AP = 0.5 (approx w/ 101-pt interp)
    gts = [
        {"category_id": 0, "bbox": [0, 0, 50, 50], "area": 2500},
        {"category_id": 0, "bbox": [100, 100, 160, 160], "area": 3600},
    ]
    dets = [{"category_id": 0, "bbox": [0, 0, 50, 50], "area": 2500, "score": 0.9}]
    ev.add_image(0, gts, dets)
    res = ev.evaluate()
    assert 45 < res["AP50"] < 55


def test_panoptic_pq_perfect():
    from hipie_tpu.evaluation.seg_eval import PanopticEvaluator

    ev = PanopticEvaluator(num_classes=3, is_thing=[True, True, False])
    seg = np.zeros((20, 20), np.int32)
    seg[:10] = 1
    seg[10:] = 2
    info = [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 2}]
    ev.add_image(seg, info, seg.copy(), [dict(s) for s in info])
    res = ev.evaluate()
    assert abs(res["PQ"] - 100.0) < 1e-6


def test_panoptic_pq_mismatch():
    from hipie_tpu.evaluation.seg_eval import PanopticEvaluator

    ev = PanopticEvaluator(num_classes=2, is_thing=[True, False])
    gt = np.zeros((10, 10), np.int32)
    gt[:, :] = 1
    pred = np.zeros((10, 10), np.int32)
    pred[:4] = 1   # IoU 0.4 < 0.5 -> no match
    ev.add_image(pred, [{"id": 1, "category_id": 0}],
                 gt, [{"id": 1, "category_id": 0}])
    res = ev.evaluate()
    assert res["PQ"] == 0.0


def test_semseg_miou():
    from hipie_tpu.evaluation.seg_eval import SemSegEvaluator

    ev = SemSegEvaluator(num_classes=2)
    gt = np.array([[0, 0], [1, 1]])
    pred = np.array([[0, 1], [1, 1]])
    ev.add_image(pred, gt)
    res = ev.evaluate()
    # class0: I=1 U=2 -> 0.5 ; class1: I=2 U=3 -> 0.667
    assert abs(res["mIoU"] - (0.5 + 2 / 3) / 2 * 100) < 1e-4


def test_refcoco_oiou():
    from hipie_tpu.evaluation.seg_eval import RefCOCOEvaluator

    ev = RefCOCOEvaluator()
    a = np.zeros((10, 10), bool); a[:5] = True
    ev.add_image(a, a)                       # IoU 1.0
    b = np.zeros((10, 10), bool); b[:5] = True
    c = np.zeros((10, 10), bool); c[:3] = True
    ev.add_image(c, b)                       # I=30 U=50
    res = ev.evaluate()
    assert abs(res["oIoU"] - (50 + 30) / (50 + 50) * 100) < 1e-4
    assert res["P@0.5"] == 100.0      # second image IoU 0.6 still passes @0.5
    assert res["P@0.7"] == 50.0


def test_refcoco_precision_strictly_greater():
    """P@K uses STRICT > like the reference (np.sum(ious > K),
    detectron2/evaluation/coco_evaluation.py:437): IoU exactly 0.5 does
    NOT count at P@0.5."""
    from hipie_tpu.evaluation.seg_eval import RefCOCOEvaluator

    ev = RefCOCOEvaluator()
    g = np.zeros((4, 4), bool); g[:2] = True            # 8 px
    p = np.zeros((4, 4), bool); p[0] = True             # 4 px inside g
    ev.add_image(p, g)                                  # I=4 U=8: IoU = 0.5
    res = ev.evaluate()
    assert res["P@0.5"] == 0.0
    assert res["mIoU"] == 50.0
