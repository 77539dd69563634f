"""VOC mAP + batch metrics tests (reference utils/eval_utils.py semantics)."""

import numpy as np
import pytest

from yolov3_tensorflow_tpu.evaluation.metrics import (AverageMeter,
                                                      detections_to_pred_rows,
                                                      evaluate_batch,
                                                      extract_gt_from_y_true,
                                                      match_detections)
from yolov3_tensorflow_tpu.evaluation.voc import (evaluate_map, voc_ap,
                                                  voc_eval, parse_gt_records)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0, 2)
    m.update(5.0, 1)
    assert m.average == pytest.approx(3.0)
    assert m.val == 5.0


def test_voc_ap_area_metric():
    rec = np.array([0.2, 0.4, 0.4, 0.8])
    prec = np.array([1.0, 0.8, 0.6, 0.5])
    # envelope: [0,.2]:1.0, (.2,.4]:0.8, (.4,.8]:0.5
    want = 0.2 * 1.0 + 0.2 * 0.8 + 0.4 * 0.5
    assert voc_ap(rec, prec, use_07_metric=False) == pytest.approx(want)


def test_voc_ap_07_metric():
    rec = np.array([0.0, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(1.0)


def test_voc_eval_perfect_detections():
    gt = {0: [[10, 10, 50, 50, 0], [100, 100, 150, 150, 0]],
          1: [[20, 20, 60, 60, 0]]}
    preds = [[0, 10, 10, 50, 50, 0.9, 0],
             [0, 100, 100, 150, 150, 0.8, 0],
             [1, 20, 20, 60, 60, 0.95, 0]]
    npos, nd, rec, prec, ap = voc_eval(gt, preds, 0)
    assert npos == 3 and nd == 3
    assert rec == pytest.approx(1.0) and prec == pytest.approx(1.0)
    assert ap == pytest.approx(1.0)


def test_voc_eval_duplicate_detection_is_fp():
    gt = {0: [[10, 10, 50, 50, 0]]}
    preds = [[0, 10, 10, 50, 50, 0.9, 0],
             [0, 11, 11, 51, 51, 0.8, 0]]  # same GT, lower conf -> FP
    npos, nd, rec, prec, ap = voc_eval(gt, preds, 0)
    assert rec == pytest.approx(1.0)
    assert prec == pytest.approx(0.5)


def test_voc_eval_wrong_class_ignored():
    gt = {0: [[10, 10, 50, 50, 1]]}
    preds = [[0, 10, 10, 50, 50, 0.9, 0]]
    out = voc_eval(gt, preds, 1)
    assert out[:2] == (1e-6, 1e-6)  # degenerate: no class-1 predictions


def test_evaluate_map_aggregation():
    gt = {0: [[0, 0, 10, 10, 0], [20, 20, 30, 30, 1]]}
    preds = [[0, 0, 0, 10, 10, 0.9, 0], [0, 20, 20, 30, 30, 0.9, 1]]
    out = evaluate_map(gt, preds, 2)
    assert out["mAP"] == pytest.approx(1.0)
    assert out["recall"] == pytest.approx(1.0)


def test_parse_gt_records_letterbox(tmp_path):
    f = tmp_path / "val.txt"
    f.write_text("0 /x.jpg 800 400 1 80 40 160 120\n")
    gt = parse_gt_records(str(f), (416, 416), letterbox_resize=True)
    ratio = 416 / 800
    dh = (416 - int(400 * ratio)) // 2
    x0, y0, x1, y1, label = gt[0][0]
    assert label == 1
    assert x0 == pytest.approx(80 * ratio)
    assert y0 == pytest.approx(40 * ratio + dh)


def test_extract_gt_and_match():
    # build a y_true with one box: center (100, 100), size (40, 20), class 2
    y = [np.zeros((1, s, s, 3, 6 + 3), np.float32) for s in (4, 8, 16)]
    for g in y:
        g[..., -1] = 1.0
    y[1][0, 3, 3, 1, 0:4] = [100, 100, 40, 20]
    y[1][0, 3, 3, 1, 4] = 1.0
    y[1][0, 3, 3, 1, 5 + 2] = 1.0
    boxes, labels = extract_gt_from_y_true(y, 0)
    np.testing.assert_allclose(boxes[0], [80, 90, 120, 110])
    assert labels[0] == 2

    tp = match_detections(np.array([[81, 91, 119, 109]]), np.array([0.9]),
                          np.array([2]), boxes, labels)
    assert tp == 1
    # wrong class -> no match
    assert match_detections(np.array([[81, 91, 119, 109]]), np.array([0.9]),
                            np.array([0]), boxes, labels) == 0


def test_evaluate_batch_and_rows():
    y = [np.zeros((2, s, s, 3, 6 + 2), np.float32) for s in (2, 4, 8)]
    for g in y:
        g[..., -1] = 1.0
    y[0][0, 1, 1, 0, 0:4] = [40, 40, 20, 20]
    y[0][0, 1, 1, 0, 4] = 1.0
    y[0][0, 1, 1, 0, 5] = 1.0  # class 0 in image 0

    dets = {
        "boxes": np.array([[[30, 30, 50, 50], [0, 0, 1, 1]],
                           [[5, 5, 6, 6], [0, 0, 0, 0]]], np.float32),
        "scores": np.array([[0.9, 0.2], [0.3, 0.0]], np.float32),
        "labels": np.array([[0, 1], [1, 0]], np.int32),
        "valid": np.array([[True, False], [True, False]]),
    }
    recall, precision = evaluate_batch(dets, y, 2)
    assert recall == pytest.approx(1.0, rel=1e-3)
    assert precision == pytest.approx(0.5, rel=1e-3)

    rows = detections_to_pred_rows(dets, np.array([7, 9]))
    assert len(rows) == 2
    assert rows[0][0] == 7 and rows[0][-1] == 0
    assert rows[1][0] == 9 and rows[1][-1] == 1
