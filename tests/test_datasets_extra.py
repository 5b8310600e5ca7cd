"""Benchmark dataset registrations, openseg label sets, and semantic/parts
evaluation (VERDICT r1 missing items #4/#5)."""

import numpy as np
import pytest

from hipie_tpu.data.datasets import DATASET_METADATA, DATASET_REGISTRY
from hipie_tpu.data.datasets_extra import get_openseg_labels, openseg_names_and_things

pytestmark = pytest.mark.fast  # curated inner-loop tier (tests/conftest.py)


def test_benchmark_registrations_present():
    names = set(DATASET_REGISTRY)
    for want in [
        "ade20k_panoptic_val", "ade20k_sem_seg_val", "ade20k_instance_val",
        "ade20k_full_sem_seg_val", "ctx59_sem_seg_val", "ctx459_sem_seg_val",
        "pascal21_sem_seg_val", "pascal_parts_val", "paco_lvis_v1_val",
        "objects365_v2_train", "seginw_Elephants_val", "coco_sem_seg_val",
    ]:
        assert want in names, want
    assert sum(1 for n in names if n.startswith("odinw_")) == 35
    assert sum(1 for n in names if n.startswith("seginw_")) == 25
    assert DATASET_METADATA["pascal_parts_val"]["label_group"]


def test_openseg_labels_parse():
    l = get_openseg_labels("ade20k_150")
    assert len(l) == 151 and l[0]["name"] == "invalid_class_id"
    lp = get_openseg_labels("ade20k_150", prompt_eng=True)
    assert "," in lp[1]["name"]          # synonyms joined with commas
    l847 = get_openseg_labels("ade20k_847")
    assert len(l847) == 848
    ctx459 = get_openseg_labels("pascal_context_459")
    assert len(ctx459) == 460
    names, things = openseg_names_and_things("pascal_voc_21")
    assert len(names) == 21 and names[0] != "invalid_class_id"


class FakePredictor:
    """Returns a checkerboard-ish sem_seg prediction equal to the GT."""

    def __init__(self, gt):
        self.gt = gt

    def __call__(self, img, **kw):
        return {"sem_seg": self.gt.copy(), "instances": {
            "scores": np.zeros(0), "classes": np.zeros(0, int),
            "boxes": np.zeros((0, 4)), "masks": np.zeros((0, 4, 4), bool)}}


def test_evaluate_semseg_dataset_perfect_prediction():
    from hipie_tpu.evaluation.evaluator import evaluate_semseg_dataset

    gt = np.zeros((16, 16), np.int64)
    gt[:8] = 1
    gt[0, 0] = 255                      # ignore pixel
    rec = {"image": np.zeros((16, 16, 3), np.uint8), "sem_seg_gt": gt,
           "image_id": 0, "class_names": ["a", "b", "c"],
           "class_is_thing": [False] * 3}
    out = evaluate_semseg_dataset(FakePredictor(gt), [rec],
                                  {"ignore_label": 255})
    assert out["sem_seg/mIoU"] == pytest.approx(100.0)


def test_evaluate_semseg_parts_merged_groups():
    from hipie_tpu.evaluation.evaluator import evaluate_semseg_dataset

    # raw labels 1..4 (1-based tif, 0=ignore); groups: {1,2}->1, {3,4}->2
    gt_raw = np.zeros((8, 8), np.int64)
    gt_raw[:4] = 1
    gt_raw[4:] = 3
    gt_raw[0, 0] = 0                    # ignore
    # prediction confuses 1<->2 (same merged group) and 3<->4
    pred = np.where(gt_raw == 1, 1, 3)  # 0-based: raw-1
    rec = {"image": np.zeros((8, 8, 3), np.uint8), "sem_seg_gt": gt_raw,
           "image_id": 0, "class_names": ["a", "b", "c", "d"],
           "class_is_thing": [False] * 4}
    meta = {"ignore_label": 0, "label_group": {1: 1, 2: 1, 3: 2, 4: 2},
            "n_merged": 2}
    out = evaluate_semseg_dataset(FakePredictor(pred), [rec], meta)
    # raw: pred 1 vs gt 0 for the top half -> imperfect raw mIoU;
    # merged: both halves land in the right group -> perfect parts mIoU
    assert out["sem_seg/mIoU_parts"] == pytest.approx(100.0)
    assert out["sem_seg/mIoU"] < 100.0


def test_instance_results_to_coco_json_openvocab_map():
    from hipie_tpu.evaluation.evaluator import instance_results_to_coco_json

    preds = [{"scores": np.array([0.9]), "classes": np.array([2]),
              "boxes": np.array([[0.0, 0.0, 10.0, 20.0]])}]
    recs = [{"image_id": 7}]
    # sparse dataset id space (open-vocab remap tolerance)
    out = instance_results_to_coco_json(preds, recs, {0: 5, 2: 42})
    assert out[0]["category_id"] == 42
    assert out[0]["bbox"] == [0.0, 0.0, 10.0, 20.0]
    with pytest.raises(KeyError):
        instance_results_to_coco_json(preds, recs, {0: 5})
