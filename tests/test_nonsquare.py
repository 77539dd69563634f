"""Non-416 and non-square inference sizes (reference README.md:64-66
showcases 1344x896 via test_single_image.py --new_size).

Covers: decode-table math on rectangular grids, the full high-res decode+NMS
shape path at the reference's showcase resolution, letterbox inversion at
non-square sizes, and the CLI end to end at a rectangular --new_size.
"""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.cli import detect_image
from yolov3_tensorflow_tpu.data.augment import letterbox_resize
from yolov3_tensorflow_tpu.models.decode import (decode_feature_map,
                                                 predict_boxes)
from yolov3_tensorflow_tpu.models.yolov3 import init_yolov3
from yolov3_tensorflow_tpu.ops.nms import batched_nms_auto
from yolov3_tensorflow_tpu.train.checkpoint import CheckpointStore

ANCHORS = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                    [59, 119], [116, 90], [156, 198], [373, 326]], np.float32)


def test_decode_rectangular_grid_golden():
    """Decode oracle on a 2x3 grid (64x96 image): x and y offsets must bind
    to the right axes (a transposition bug cancels out on square grids)."""
    rng = np.random.RandomState(1)
    c = 2
    fmap = rng.randn(1, 2, 3, 3 * (5 + c)).astype(np.float32)  # [B, H, W, ...]
    anchors = ANCHORS[:3]
    img_size = (64, 96)  # (h, w) -> stride 32 on both axes

    _, boxes, _, _ = decode_feature_map(jnp.asarray(fmap), anchors, c,
                                        img_size)
    f = fmap.reshape(1, 2, 3, 3, 5 + c)
    sig = lambda v: 1 / (1 + np.exp(-v))
    for y in range(2):
        for x in range(3):
            for a in range(3):
                cx = (sig(f[0, y, x, a, 0]) + x) * 32.0
                cy = (sig(f[0, y, x, a, 1]) + y) * 32.0
                w = np.exp(f[0, y, x, a, 2]) * anchors[a, 0]
                h = np.exp(f[0, y, x, a, 3]) * anchors[a, 1]
                np.testing.assert_allclose(
                    np.asarray(boxes[0, y, x, a]), [cx, cy, w, h], rtol=1e-5)


def test_predict_and_nms_shapes_at_1344x896():
    """The showcase resolution end of the decode+NMS path (no conv forward —
    the grids are what high-res changes). 896x1344 -> grids 28x42/56x84/
    112x168, 23814 anchors."""
    h, w = 896, 1344
    num_classes = 2
    rng = np.random.RandomState(0)
    fmaps = tuple(
        jnp.asarray(rng.randn(1, h // s, w // s, 3 * (5 + num_classes))
                    .astype(np.float32) * 2)
        for s in (32, 16, 8))
    boxes, confs, probs = predict_boxes(fmaps, ANCHORS, num_classes, (h, w))
    expected = 3 * sum((h // s) * (w // s) for s in (32, 16, 8))
    assert boxes.shape == (1, expected, 4)
    assert expected == 74088  # (28*42 + 56*84 + 112*168) * 3
    # centers must cover the full rectangle, not just a square corner of it
    cx = np.asarray((boxes[..., 0] + boxes[..., 2]) / 2)
    cy = np.asarray((boxes[..., 1] + boxes[..., 3]) / 2)
    assert cx.max() > w - 64 and cy.max() > h - 64
    assert cx.max() <= w + 8 and cy.max() <= h + 8

    dets = batched_nms_auto(boxes, jax.nn.sigmoid(confs) * jax.nn.sigmoid(probs),
                            max_out=20, pre_topk=64, score_thresh=0.3,
                            iou_thresh=0.45)
    assert dets["boxes"].shape == (1, 20 * num_classes, 4)
    assert bool(np.asarray(dets["valid"]).any())


def test_letterbox_inversion_nonsquare_roundtrip():
    """letterbox to 160x96 (w, h) and invert back: a known box must return to
    its original pixels (test_single_image.py:65-70 semantics)."""
    img = np.zeros((300, 500, 3), np.uint8)  # H=300, W=500
    new_w, new_h = 160, 96
    _, ratio, dw, dh = letterbox_resize(img, new_w, new_h)
    orig = np.array([[50.0, 80.0, 350.0, 240.0]], np.float32)
    lb = orig.copy()
    lb[:, [0, 2]] = lb[:, [0, 2]] * ratio + dw
    lb[:, [1, 3]] = lb[:, [1, 3]] * ratio + dh
    back = detect_image.invert_boxes(lb, ("letterbox", ratio, dw, dh))
    np.testing.assert_allclose(back, orig, atol=1e-4)


def test_detect_image_cli_rectangular_size(tmp_path):
    """Full CLI at --new_size 160 96 (w != h) on a non-square photo: decode
    tables, NMS shapes and the inverse transform all at rectangular sizes."""
    names = tmp_path / "names.txt"
    names.write_text("a\nb\n")
    variables = init_yolov3(jax.random.PRNGKey(5), 2)
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save("m", {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]})
    rng = np.random.default_rng(1)
    img_path = str(tmp_path / "in.jpg")
    cv2.imwrite(img_path, rng.integers(0, 255, (240, 130, 3), dtype=np.uint8))
    out_path = str(tmp_path / "out.jpg")
    rc = detect_image.main([
        img_path, "--restore_path", str(tmp_path / "ckpt" / "m"),
        "--class_name_path", str(names), "--new_size", "160", "96",
        "--score_thresh", "0.2", "--max_boxes", "5", "--output", out_path,
    ])
    assert rc == 0
    assert cv2.imread(out_path).shape == (240, 130, 3)
