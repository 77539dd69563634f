"""Device-resident letterbox preprocessing vs the host cv2 path, and
multi-host helpers in single-process mode."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.data.augment import letterbox_resize
from yolov3_tensorflow_tpu.ops.preprocess import (device_letterbox,
                                                  letterbox_params)
from yolov3_tensorflow_tpu.parallel.multihost import (gather_prediction_rows,
                                                      is_primary)


def test_letterbox_params_match_host():
    img = np.zeros((200, 400, 3), np.uint8)
    _, ratio, dw, dh = letterbox_resize(img, 416, 416)
    d_ratio, rh, rw, pad_h, pad_w = letterbox_params((200, 400), (416, 416))
    assert d_ratio == pytest.approx(ratio)
    assert pad_w == dw and pad_h == dh
    assert rw == int(ratio * 400) and rh == int(ratio * 200)


def test_device_letterbox_geometry_and_range():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 200, 400, 3), dtype=np.uint8)
    out = np.asarray(device_letterbox(jnp.asarray(np.asarray(frames)),
                                      (416, 416)))
    assert out.shape == (2, 416, 416, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    _, rh, rw, pad_h, pad_w = letterbox_params((200, 400), (416, 416))
    # padding rows are exactly gray 128/255
    np.testing.assert_allclose(out[:, :pad_h], 128 / 255, rtol=1e-6)
    np.testing.assert_allclose(out[:, pad_h + rh:], 128 / 255, rtol=1e-6)
    # content region approximates the cv2 bilinear resize
    host, _, _, _ = letterbox_resize(
        cv2.cvtColor(np.asarray(frames[0]), cv2.COLOR_RGB2BGR), 416, 416,
        interp=cv2.INTER_LINEAR)
    host = cv2.cvtColor(host, cv2.COLOR_BGR2RGB).astype(np.float32) / 255
    content_dev = out[0, pad_h:pad_h + rh, pad_w:pad_w + rw]
    content_host = host[pad_h:pad_h + rh, pad_w:pad_w + rw]
    # different sampling-grid conventions -> compare loosely on means
    assert abs(content_dev.mean() - content_host.mean()) < 0.02


def test_gather_prediction_rows_single_process():
    rows = [[0, 1, 2, 3, 4, 0.9, 1], [3, 5, 6, 7, 8, 0.8, 0]]
    out = gather_prediction_rows(rows)
    assert out == [list(map(float, r)) for r in rows] or out == rows
    assert is_primary()
