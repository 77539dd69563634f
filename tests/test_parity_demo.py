"""The real-weights parity harness must run end-to-end on synthetic weights
(CI stand-in for the reference's committed-demo check, which needs real
COCO weights; scripts/parity_demo.py docstring)."""

import json
import os

import cv2
import jax
import numpy as np
import pytest

from scripts.parity_demo import iou_xyxy, main, match_detections
from yolov3_tensorflow_tpu.models.yolov3 import init_yolov3
from yolov3_tensorflow_tpu.train.checkpoint import CheckpointStore


def test_match_detections_exact_and_disjoint():
    boxes = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([1, 2], np.int64)
    m, n, k = match_detections((boxes, scores, labels),
                               (boxes, scores, labels))
    assert (m, n, k) == (2, 2, 2)
    # label mismatch kills the match even at IoU 1.0
    m, _, _ = match_detections((boxes, scores, labels),
                               (boxes, scores, labels[::-1].copy()))
    assert m == 0
    # empty other set
    m, n, _ = match_detections(
        (boxes, scores, labels),
        (np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0, np.int64)))
    assert (m, n) == (0, 2)


def test_iou_xyxy_values():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                 np.float32)
    got = iou_xyxy(a, b)[0]
    np.testing.assert_allclose(got, [1.0, 25 / 175, 0.0], atol=1e-6)


# the reference's showcase resolutions: 416 letterbox demo defaults
# (test_single_image.py:22) and the 1344x896 kite render (README.md:64-66).
# CI runs the harness at scaled-but-shape-equivalent sizes by default so
# the day-one real-weights run is turnkey at the real ones; the real sizes
# themselves run under -m slow (full-model CPU forwards).
#
# The exact-vs-packed agreement gate is only asserted at the small sizes:
# glorot-random weights emit near-identical scores (~sigmoid(0)^2) for every
# anchor, so at showcase sizes the box_topk prefilter's tie-breaking among
# thousands of equal-within-bf16 candidates legitimately diverges between
# the exact and packed paths. With real weights scores separate and the
# gate is meaningful at any size (that day-one run uses the default
# --agreement_min 0.95); in CI the showcase rows prove shape correctness
# end-to-end (decode tables, letterbox inversion, NMS pads at 608/1344x896).
@pytest.mark.parametrize("new_size,agreement_min", [
    ((96, 96), 0.7),
    ((96, 64), 0.7),                            # non-square letterbox (w, h)
    pytest.param((608, 608), 0.0, marks=pytest.mark.slow),
    pytest.param((1344, 896), 0.0,
                 marks=pytest.mark.slow),       # kite showcase size
])
def test_parity_demo_harness_synthetic(tmp_path, new_size, agreement_min):
    """Full harness flow with synthetic weights: ckpt -> exact + packed
    detection -> rendered jpg + numeric JSON + summary with agreement."""
    names = tmp_path / "names.txt"
    names.write_text("a\nb\nc\n")
    variables = init_yolov3(jax.random.PRNGKey(11), 3)
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save("m", {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]})

    rng = np.random.default_rng(3)
    img_path = str(tmp_path / "demo.jpg")
    cv2.imwrite(img_path, rng.integers(0, 255, (120, 160, 3),
                                       dtype=np.uint8))
    out_dir = str(tmp_path / "out")

    rc = main([
        "--weights", str(tmp_path / "ckpt" / "m"),
        "--images", img_path,
        "--out_dir", out_dir,
        "--new_size", str(new_size[0]), str(new_size[1]),
        "--class_name_path", str(names),
        "--score_thresh", "0.2",
        "--max_boxes", "8",
        "--expect", "off",
        "--agreement_min", str(agreement_min),
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "demo.jpg"))
    with open(os.path.join(out_dir, "demo_detections.json")) as f:
        dets = json.load(f)
    assert all({"box_xyxy", "score", "label", "class"} <= set(d)
               for d in dets["detections"])
    with open(os.path.join(out_dir, "parity_summary.json")) as f:
        summary = json.load(f)
    assert summary["ok"] is True
    entry = summary["images"]["demo"]
    assert entry["n_exact"] >= 1          # random weights at 0.2 detect
    assert entry["agreement"] >= agreement_min
