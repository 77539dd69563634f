"""Native C++ postprocess library vs the numpy oracles."""

import numpy as np
import pytest

from yolov3_tensorflow_tpu.ops.nms import cpu_nms, py_nms
from yolov3_tensorflow_tpu.utils import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain in environment")


def _random_boxes(rng, n, span=300.0):
    x0 = rng.uniform(0, span, n)
    y0 = rng.uniform(0, span, n)
    w = rng.uniform(5, 120, n)
    h = rng.uniform(5, 120, n)
    return np.stack([x0, y0, x0 + w, y0 + h], -1).astype(np.float32)


def test_native_nms_matches_oracle():
    rng = np.random.RandomState(0)
    for offset in (0.0, 1.0):  # both pixel conventions
        for _ in range(3):
            boxes = _random_boxes(rng, 120, span=150.0)
            scores = rng.uniform(0, 1, 120).astype(np.float32)
            got = native.nms(boxes, scores, max_out=120, iou_thresh=0.5,
                             pixel_offset=offset)
            want = py_nms(boxes, scores, max_boxes=120, iou_thresh=0.5,
                          offset=offset)
            assert got == want


def test_native_multiclass_matches_cpu_nms():
    rng = np.random.RandomState(1)
    boxes = _random_boxes(rng, 200)
    scores = rng.uniform(0, 0.9, (200, 6)).astype(np.float32)
    nb, ns, nl = native.nms_multiclass(boxes, scores, 6, max_per_class=20,
                                       score_thresh=0.4, iou_thresh=0.5)
    rb, rs, rl = cpu_nms(boxes, scores, 6, max_boxes=20, score_thresh=0.4,
                         iou_thresh=0.5)
    np.testing.assert_allclose(ns, rs, rtol=1e-6)
    np.testing.assert_array_equal(nl, rl)
    np.testing.assert_allclose(nb, rb, rtol=1e-6)


def test_native_multiclass_empty():
    boxes = np.zeros((4, 4), np.float32)
    scores = np.zeros((4, 3), np.float32)
    out = native.nms_multiclass(boxes, scores, 3, score_thresh=0.5)
    assert out == (None, None, None)


def test_native_iou_matrix():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                 np.float32)
    out = native.iou_matrix(a, b)
    np.testing.assert_allclose(out[0], [1.0, 25 / 175, 0.0], rtol=1e-5)
