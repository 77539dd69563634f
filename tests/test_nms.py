"""NMS parity tests: TPU fixed-shape NMS vs the numpy greedy oracle
(the reference's own verification pattern — nms_utils.py:51 py_nms is the
oracle for its GPU NMS)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.ops.boxes import iou_xyxy
from yolov3_tensorflow_tpu.ops.nms import (batched_nms, cpu_nms, per_class_nms,
                                           py_nms, suppression_mask)


def _random_boxes(rng, n, span=400.0):
    x0 = rng.uniform(0, span, n)
    y0 = rng.uniform(0, span, n)
    w = rng.uniform(5, 120, n)
    h = rng.uniform(5, 120, n)
    return np.stack([x0, y0, x0 + w, y0 + h], -1).astype(np.float32)


def test_iou_xyxy_golden():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    iou = np.asarray(iou_xyxy(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], rtol=1e-5)


def test_suppression_mask_matches_oracle():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 64
        boxes = _random_boxes(rng, n, span=150.0)  # dense -> many overlaps
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        sorted_boxes = boxes[order]

        keep = np.asarray(suppression_mask(
            jnp.asarray(sorted_boxes), jnp.ones(n, bool), iou_thresh=0.5))
        kept_idx = [int(order[i]) for i in np.where(keep)[0]]
        oracle = py_nms(boxes, scores, max_boxes=n, iou_thresh=0.5)
        assert sorted(kept_idx) == sorted(oracle), f"trial {trial}"


def test_per_class_nms_matches_cpu_nms():
    rng = np.random.RandomState(1)
    a, c = 300, 5
    boxes = _random_boxes(rng, a, span=300.0)
    scores = rng.uniform(0, 0.9, (a, c)).astype(np.float32)

    out = jax.jit(lambda b, s: per_class_nms(
        b, s, max_out=50, pre_topk=300, score_thresh=0.4, iou_thresh=0.5))(
            jnp.asarray(boxes), jnp.asarray(scores))

    ref_b, ref_s, ref_l = cpu_nms(boxes, scores, c, max_boxes=50,
                                  score_thresh=0.4, iou_thresh=0.5)
    valid = np.asarray(out["valid"])
    got = sorted(zip(np.asarray(out["scores"])[valid].tolist(),
                     np.asarray(out["labels"])[valid].tolist()))
    want = sorted(zip(ref_s.tolist(), ref_l.tolist()))
    assert len(got) == len(want)
    np.testing.assert_allclose([g[0] for g in got], [w[0] for w in want],
                               rtol=1e-5)
    assert [g[1] for g in got] == [w[1] for w in want]


def test_score_threshold_and_cap():
    boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110],
                      [200, 200, 210, 210]], np.float32)
    scores = np.array([[0.9], [0.05], [0.6]], np.float32)
    out = per_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                        max_out=1, pre_topk=3, score_thresh=0.1,
                        iou_thresh=0.5)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 1           # cap of 1 per class
    assert np.asarray(out["scores"])[valid][0] == pytest.approx(0.9)


def test_batched_nms_shapes():
    rng = np.random.RandomState(2)
    b, a, c = 3, 100, 4
    boxes = np.stack([_random_boxes(rng, a) for _ in range(b)])
    scores = rng.uniform(0, 1, (b, a, c)).astype(np.float32)
    out = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                      max_out=10, pre_topk=64, score_thresh=0.3,
                      iou_thresh=0.5)
    assert out["boxes"].shape == (b, c * 10, 4)
    assert out["labels"].shape == (b, c * 10)
    # per-image results must equal single-image calls
    one = per_class_nms(jnp.asarray(boxes[1]), jnp.asarray(scores[1]),
                        max_out=10, pre_topk=64, score_thresh=0.3,
                        iou_thresh=0.5)
    np.testing.assert_allclose(np.asarray(out["scores"][1]),
                               np.asarray(one["scores"]), rtol=1e-6)


def test_identical_boxes_suppressed():
    """Duplicate boxes collapse to the highest score."""
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (5, 1))
    scores = np.array([[0.5], [0.9], [0.7], [0.6], [0.8]], np.float32)
    out = per_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                        max_out=5, pre_topk=5, score_thresh=0.1,
                        iou_thresh=0.5)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 1
    assert np.asarray(out["scores"])[valid][0] == pytest.approx(0.9)
