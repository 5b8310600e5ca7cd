"""Data layer tests: prompt/positive-map construction, mapper shapes, chunked
long-prompt encoding, transforms."""

import numpy as np
import pytest

from hipie_tpu.models.text.tokenizer import WordPieceTokenizer

pytestmark = pytest.mark.fast  # curated inner-loop tier (tests/conftest.py)


def make_tok():
    return WordPieceTokenizer.toy(words=["person", "bicycle", "car", "sky",
                                         "grass", "dog", "head", "tail"])


def test_build_prompt_spec_maps():
    from hipie_tpu.data.prompts import build_prompt_spec

    tok = make_tok()
    spec = build_prompt_spec(["person", "bicycle", "sky"],
                             [True, True, False], tok, max_len=32)
    assert spec.prompt == "person. bicycle. sky"
    # each class has exactly its own token, weights row-normalized
    assert spec.mean_weights.shape == (3, 32)
    np.testing.assert_allclose(spec.mean_weights.sum(-1), 1.0, atol=1e-4)
    # the rows hit different token positions
    pos = spec.token_mask.argmax(-1)
    assert len(set(pos.tolist())) == 3
    assert list(spec.is_thing) == [True, True, False]


def test_detection_to_grounding_positive_rows():
    from hipie_tpu.data.prompts import detection_to_grounding

    tok = make_tok()
    rng = np.random.RandomState(0)
    names = ["person", "bicycle", "car", "sky", "grass", "dog"]
    things = [True, True, True, False, False, True]
    gt = np.array([0, 2, 2])
    spec, inst_pm, new_labels, keep = detection_to_grounding(
        rng, gt, names, things, tok, max_len=48, max_num_classes=4)
    assert keep.all()
    assert inst_pm.shape == (3, 48)
    # instances of the same class share the same row
    np.testing.assert_array_equal(inst_pm[1], inst_pm[2])
    assert not np.allclose(inst_pm[0], inst_pm[1])
    # positives always included
    assert {names.index("person"), names.index("car")} <= set(
        [names.index(spec.class_names[i]) for i in new_labels])


def test_detection_to_grounding_budget_never_exceeded():
    """Prompt must never exceed max_len; overflow positives drop instances
    instead of silently producing empty positive rows (reference
    check_for_positive_overflow, coco_dataset_mapper_uni.py:689)."""
    from hipie_tpu.data.prompts import detection_to_grounding

    tok = make_tok()
    rng = np.random.RandomState(0)
    names = [f"person bicycle car sky grass dog {i}" for i in range(30)]
    things = [True] * 30
    gt = np.arange(30) % 30
    spec, inst_pm, new_labels, keep = detection_to_grounding(
        rng, gt, names, things, tok, max_len=32, max_num_classes=30)
    assert spec.input_ids.shape[-1] == 32
    assert int(spec.attention_mask.sum()) <= 32
    assert keep.sum() == len(new_labels) == len(inst_pm)
    # every surviving instance has a non-empty positive row
    if len(inst_pm):
        assert (inst_pm.sum(-1) > 0).all()


def test_mapper_shapes():
    from hipie_tpu.config import DataConfig
    from hipie_tpu.data.mapper import HIPIEMapper

    tok = make_tok()
    cfg = DataConfig(lsj_crop=True, crop_size=64, max_text_len=32)
    mapper = HIPIEMapper(cfg, tok, is_train=True, max_gt=8, seed=0)
    rng = np.random.RandomState(0)
    img = (rng.rand(100, 80, 3) * 255).astype(np.uint8)
    mask = np.zeros((100, 80), np.uint8)
    mask[10:40, 10:40] = 1
    record = {
        "image": img,
        "annotations": [
            {"bbox": np.array([10, 10, 40, 40], np.float32), "category_id": 0,
             "segmentation": mask, "is_thing": True},
        ],
        "class_names": ["person", "sky"],
        "class_is_thing": [True, False],
        "task": "detection",
    }
    out = mapper(record)
    assert out.image.shape == (64, 64, 3)
    assert out.labels.shape == (8,)
    assert out.masks.shape == (8, 16, 16)
    assert out.positive_map.shape == (8, 32)
    assert out.valid[:1].all() or not out.valid.any()  # crop may drop the box
    assert out.input_ids.shape == (32,)


def test_chunked_long_prompt_plan():
    from hipie_tpu.models.text.frontend import plan_chunks

    tok = make_tok()
    # build a fake long stream: CLS + 600 tokens of "dog ." pairs + pad
    sep = tok.dot_token_id
    L = 700
    ids = np.zeros(L, np.int64)
    ids[0] = tok.cls_token_id
    for i in range(1, 650, 2):
        ids[i] = tok.vocab["dog"]
        ids[i + 1] = sep
    ids[651] = 3  # [SEP]=EOS stand-in; use HF ids in real vocab
    mask = (ids != 0).astype(np.int64)
    plan = plan_chunks(ids, mask, sep_id=sep)
    assert plan.chunk_ids.shape[1] == 512
    assert plan.chunk_ids.shape[0] >= 2
    # reassembled ids match the original stream
    rec = np.zeros(L, np.int64)
    for i, ((s0, s1), (t0, t1)) in enumerate(zip(plan.src_spans, plan.tgt_spans)):
        rec[t0:t1] = plan.chunk_ids[i][s0:s1]
    covered = rec != 0
    # EOS replacements at chunk ends are the only diffs
    diff = np.where((rec != ids) & covered)[0]
    assert all(plan.chunk_ids[i][s1 - 1] == 102
               for i, (s0, s1) in enumerate(plan.src_spans)) or len(diff) <= len(plan.src_spans)


def test_transforms_hflip_boxes():
    from hipie_tpu.data.transforms import hflip

    img = np.zeros((10, 20, 3), np.float32)
    boxes = np.array([[2.0, 1.0, 6.0, 5.0]])
    _, fb, _ = hflip(img, boxes)
    np.testing.assert_allclose(fb, [[14.0, 1.0, 18.0, 5.0]])


def test_flip_expression():
    from hipie_tpu.data.transforms import flip_expression

    assert flip_expression("the left dog") == "the right dog"
    assert flip_expression("right of the left car") == "left of the right car"


def test_rfs_repeat_factors_and_sampler():
    from hipie_tpu.data.loader import MultiDatasetSampler, rfs_repeat_factors

    # rare category (in 1 of 100 images) gets upweighted, common one doesn't
    records = [{"annotations": [{"category_id": 0}]} for _ in range(99)]
    records.append({"annotations": [{"category_id": 1}]})
    rf = rfs_repeat_factors(records, repeat_threshold=0.1)
    assert rf[-1] > rf[0] and rf[0] == 1.0
    assert rf[-1] == pytest.approx(np.sqrt(0.1 / 0.01))

    s = MultiDatasetSampler([100], [1.0], seed=0, repeat_factors=[rf])
    it = iter(s)
    draws = [next(it)[1] for _ in range(2000)]
    frac_rare = sum(1 for i in draws if i == 99) / len(draws)
    # rare image sampled ~ rf/sum(rf) = 3.16/102.2 ~ 3.1% >> uniform 1%
    assert frac_rare > 0.02


def test_per_dataset_batch_sizes():
    """USE_DIFF_BS_SIZE: a batch from dataset i has dataset_batch_sizes[i]
    items (reference MDAspectRatioGroupedDataset/DIFF, :268-307)."""
    from hipie_tpu.config import DataConfig
    from hipie_tpu.data.loader import TrainLoader
    import hipie_tpu.data.datasets as D

    rng = np.random.RandomState(0)

    def mkrec(i):
        return {"image": (rng.rand(32, 32, 3) * 255).astype(np.uint8),
                "annotations": [], "class_names": ["person"],
                "class_is_thing": [True], "task": "detection", "_id": i}

    D.register_dataset("_test_bs_a", lambda: [mkrec(i) for i in range(4)])
    D.register_dataset("_test_bs_b", lambda: [mkrec(i) for i in range(4)])
    cfg = DataConfig(use_diff_bs_size=True, dataset_batch_sizes=(3, 1),
                     train_datasets=("_test_bs_a", "_test_bs_b"),
                     dataset_ratios=(1.0, 1.0), lsj_crop=True, crop_size=32,
                     max_text_len=16)
    from hipie_tpu.data.mapper import HIPIEMapper
    mapper = HIPIEMapper(cfg, make_tok(), is_train=True, max_gt=4, seed=0)
    loader = TrainLoader(cfg, mapper, batch_size=2, seed=0)
    assert loader.batch_sizes == [3, 1]
    it = iter(loader.sampler)
    sizes = set()
    for _ in range(6):
        _, batch = loader._make_batch(it)
        sizes.add(batch["images"].shape[0])
    assert sizes <= {3, 1} and len(sizes) == 2


def test_multi_dataset_unequal_sizes_and_tasks():
    """Two datasets of UNEQUAL sizes: every drawn index must belong to the
    dataset it was drawn for (the round-1 loader reused an index drawn for a
    different dataset -> IndexError / silent skew), and each batch carries
    its emitting dataset's task."""
    from hipie_tpu.config import DataConfig
    from hipie_tpu.data.loader import TrainLoader
    from hipie_tpu.data.mapper import HIPIEMapper
    import hipie_tpu.data.datasets as D

    rng = np.random.RandomState(1)

    def mkrec(i, task):
        r = {"image": (rng.rand(32, 32, 3) * 255).astype(np.uint8),
             "annotations": [], "class_names": ["person"],
             "class_is_thing": [True], "task": task, "_id": i}
        if task == "grounding":
            r["expressions"] = ["the person"]
        return r

    # small dataset first: the buggy cross-indexing raised IndexError when a
    # large-dataset index hit the small dataset
    D.register_dataset("_test_uneq_small",
                       lambda: [mkrec(i, "detection") for i in range(3)])
    D.register_dataset("_test_uneq_big",
                       lambda: [mkrec(i, "grounding") for i in range(37)])
    cfg = DataConfig(train_datasets=("_test_uneq_small", "_test_uneq_big"),
                     dataset_ratios=(1.0, 1.0), lsj_crop=True, crop_size=32,
                     max_text_len=16)
    mapper = HIPIEMapper(cfg, make_tok(), is_train=True, max_gt=4, seed=0)
    loader = TrainLoader(cfg, mapper, batch_size=2, seed=0)
    assert loader.tasks == ["detection", "grounding"]
    it = iter(loader.sampler)
    tasks_seen = set()
    for _ in range(20):
        task, batch = loader._make_batch(it)
        tasks_seen.add(task)
        assert batch["images"].shape[0] == 2
    assert tasks_seen == {"detection", "grounding"}
