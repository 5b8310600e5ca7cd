import numpy as np
import jax.numpy as jnp

from hipie_tpu.ops import box_ops

import pytest

pytestmark = pytest.mark.fast  # curated inner-loop tier (tests/conftest.py)


def test_cxcywh_roundtrip():
    b = jnp.array([[0.5, 0.5, 0.2, 0.4]])
    xyxy = box_ops.box_cxcywh_to_xyxy(b)
    np.testing.assert_allclose(np.asarray(xyxy), [[0.4, 0.3, 0.6, 0.7]], atol=1e-6)
    back = box_ops.box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), np.asarray(b), atol=1e-6)


def test_iou_giou():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0], [4.0, 4.0, 5.0, 5.0]])
    iou, _ = box_ops.box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou)[0], [1.0 / 7.0, 1.0, 0.0], atol=1e-6)
    giou = box_ops.generalized_box_iou(a, b)
    assert np.asarray(giou)[0, 1] == 1.0
    assert np.asarray(giou)[0, 2] < 0.0   # disjoint boxes => negative GIoU


def test_masks_to_boxes():
    m = np.zeros((2, 5, 6), bool)
    m[0, 1:3, 2:5] = True
    boxes = np.asarray(box_ops.masks_to_boxes(jnp.array(m)))
    np.testing.assert_allclose(boxes[0], [2, 1, 5, 3])
    np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])
