"""Pallas NMS kernel parity vs the XLA sequential-greedy reference and the
numpy oracle (interpret mode on CPU; compiled path exercised on TPU by
bench.py / the detector)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.ops.nms import (batched_nms, py_nms,
                                           suppression_mask)
from yolov3_tensorflow_tpu.ops.nms_pallas import (batched_nms_pallas,
                                                  nms_keep_mask_pallas)

INTERPRET = jax.default_backend() != "tpu"


def _random_boxes(rng, n, span=300.0):
    x0 = rng.uniform(0, span, n)
    y0 = rng.uniform(0, span, n)
    w = rng.uniform(5, 120, n)
    h = rng.uniform(5, 120, n)
    return np.stack([x0, y0, x0 + w, y0 + h], -1).astype(np.float32)


def test_fixpoint_keep_mask_matches_sequential_greedy():
    rng = np.random.RandomState(0)
    for trial in range(4):
        k = 128
        boxes = _random_boxes(rng, k, span=120.0)  # dense: deep chains
        scores = np.sort(rng.uniform(0, 1, k).astype(np.float32))[::-1]
        order = np.argsort(-scores, kind="stable")
        boxes = boxes[order]
        valid = rng.uniform(0, 1, k) > 0.1

        keep_pl = np.asarray(nms_keep_mask_pallas(
            jnp.asarray(boxes[None]), jnp.asarray(valid[None]), 0.5,
            interpret=INTERPRET))[0]
        keep_ref = np.asarray(suppression_mask(
            jnp.asarray(boxes), jnp.asarray(valid), 0.5))
        np.testing.assert_array_equal(keep_pl, keep_ref, err_msg=f"t{trial}")


def test_fixpoint_chain_case():
    """a suppresses b, b suppresses c, a does not suppress c -> keep a, c."""
    boxes = np.array([[0, 0, 10, 10],
                      [6, 0, 16, 10],     # IoU(a,b) ~ 0.25 -> use t=0.2
                      [12, 0, 22, 10]], np.float32)
    pad = np.zeros((125, 4), np.float32)
    boxes = np.concatenate([boxes, pad])
    valid = np.zeros(128, bool)
    valid[:3] = True
    keep = np.asarray(nms_keep_mask_pallas(
        jnp.asarray(boxes[None]), jnp.asarray(valid[None]), 0.2,
        interpret=INTERPRET))[0]
    assert keep[:3].tolist() == [True, False, True]


def test_batched_nms_pallas_matches_xla():
    rng = np.random.RandomState(1)
    b, a, c = 2, 300, 4
    boxes = np.stack([_random_boxes(rng, a) for _ in range(b)])
    scores = rng.uniform(0, 0.9, (b, a, c)).astype(np.float32)

    out_pl = batched_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), max_out=10, pre_topk=128,
        score_thresh=0.3, iou_thresh=0.5, interpret=INTERPRET)
    out_xla = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), max_out=10, pre_topk=128,
        score_thresh=0.3, iou_thresh=0.5)

    np.testing.assert_array_equal(np.asarray(out_pl["valid"]),
                                  np.asarray(out_xla["valid"]))
    np.testing.assert_allclose(np.asarray(out_pl["scores"]),
                               np.asarray(out_xla["scores"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_pl["labels"]),
                                  np.asarray(out_xla["labels"]))
    valid = np.asarray(out_pl["valid"])
    np.testing.assert_allclose(np.asarray(out_pl["boxes"])[valid],
                               np.asarray(out_xla["boxes"])[valid], rtol=1e-6)


def test_shared_candidate_kernel_matches_per_class():
    """batched_nms_shared_pallas (one box set scored by all classes) must
    equal the per-class path on the same candidate set."""
    rng = np.random.RandomState(4)
    b, k, c = 2, 128, 6
    boxes = np.stack([_random_boxes(rng, k, span=200.0) for _ in range(b)])
    scores = (rng.uniform(0, 1, (b, k, c)) ** 2).astype(np.float32)

    from yolov3_tensorflow_tpu.ops.nms_pallas import batched_nms_shared_pallas
    out = batched_nms_shared_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), max_out=8,
        score_thresh=0.25, iou_thresh=0.5, interpret=INTERPRET)
    ref = batched_nms(jnp.asarray(boxes), jnp.asarray(scores), max_out=8,
                      pre_topk=k, score_thresh=0.25, iou_thresh=0.5)
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(ref["valid"]))
    np.testing.assert_allclose(np.asarray(out["scores"]),
                               np.asarray(ref["scores"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["labels"]),
                                  np.asarray(ref["labels"]))


def test_fast_postprocess_matches_exact():
    """Prefilter postprocess equals the exhaustive path when all
    above-threshold boxes fit in box_topk (its exactness precondition)."""
    from yolov3_tensorflow_tpu.ops.fast_postprocess import postprocess_prefilter
    from yolov3_tensorflow_tpu.ops.postprocess import postprocess

    rng = np.random.default_rng(5)
    b, c = 2, 3
    anchors = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                        [59, 119], [116, 90], [156, 198], [373, 326]],
                       np.float32)
    fmaps = [jnp.asarray(rng.normal(-2, 1.5, (b, s, s, 3 * (5 + c)))
                         .astype(np.float32)) for s in (2, 4, 8)]
    kwargs = dict(max_out=10, score_thresh=0.3, iou_thresh=0.45,
                  use_pallas=False)
    fast = postprocess_prefilter(fmaps, anchors, c, (64, 64), box_topk=128,
                                 pre_topk=128, **kwargs)
    exact = postprocess(fmaps, anchors, c, (64, 64), pre_topk=252, **kwargs)
    np.testing.assert_array_equal(np.asarray(fast["valid"]),
                                  np.asarray(exact["valid"]))
    v = np.asarray(fast["valid"])
    np.testing.assert_allclose(np.asarray(fast["scores"])[v],
                               np.asarray(exact["scores"])[v], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fast["boxes"])[v],
                               np.asarray(exact["boxes"])[v], rtol=1e-4)


def test_pre_topk_padding_path():
    """pre_topk not 128-aligned exercises the pad-to-lane-width branch."""
    rng = np.random.RandomState(2)
    a, c = 200, 2
    boxes = _random_boxes(rng, a)[None]
    scores = rng.uniform(0, 1, (1, a, c)).astype(np.float32)
    out = batched_nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                             max_out=5, pre_topk=100, score_thresh=0.4,
                             iou_thresh=0.5, interpret=INTERPRET)
    ref = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                      max_out=5, pre_topk=100, score_thresh=0.4,
                      iou_thresh=0.5)
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(ref["valid"]))
    np.testing.assert_allclose(np.asarray(out["scores"]),
                               np.asarray(ref["scores"]), rtol=1e-6)
