"""GIoU box geometry + optional GIoU box loss."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.ops.boxes import giou_xywh
from yolov3_tensorflow_tpu.ops.losses import loss_scale


def test_giou_identical_boxes():
    b = jnp.asarray([[50.0, 50.0, 20.0, 10.0]])
    np.testing.assert_allclose(np.asarray(giou_xywh(b, b)), [1.0], atol=1e-6)


def test_giou_disjoint_is_negative():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[100.0, 0.0, 10.0, 10.0]])
    g = float(giou_xywh(a, b)[0])
    assert g < 0
    # enclosing box spans 110x10 around two 10x10 boxes:
    # GIoU = 0 - (1100 - 200)/1100
    assert g == pytest.approx(-900 / 1100, rel=1e-5)


def test_giou_half_overlap_golden():
    a = jnp.asarray([[5.0, 5.0, 10.0, 10.0]])     # (0,0)-(10,10)
    b = jnp.asarray([[10.0, 5.0, 10.0, 10.0]])    # (5,0)-(15,10)
    # inter 50, union 150, enclose 150 -> giou = 1/3
    assert float(giou_xywh(a, b)[0]) == pytest.approx(1 / 3, rel=1e-5)


def test_giou_loss_mode():
    rng = np.random.RandomState(0)
    c = 2
    anchors = np.array([[30, 61], [62, 45], [59, 119]], np.float32)
    fmap = rng.randn(1, 4, 4, 3 * (5 + c)).astype(np.float32) * 0.3
    y_true = np.zeros((1, 4, 4, 3, 6 + c), np.float32)
    y_true[..., -1] = 1.0
    y_true[0, 1, 2, 1, 0:4] = [80, 50, 30, 40]
    y_true[0, 1, 2, 1, 4] = 1.0
    y_true[0, 1, 2, 1, 5] = 1.0

    xy_g, wh_g, conf_g, cls_g = loss_scale(
        jnp.asarray(fmap), jnp.asarray(y_true), anchors, c, (128, 128),
        box_loss="giou")
    xy_r, wh_r, conf_r, cls_r = loss_scale(
        jnp.asarray(fmap), jnp.asarray(y_true), anchors, c, (128, 128),
        box_loss="reference")
    # conf/class identical across box-loss modes
    np.testing.assert_allclose(float(conf_g), float(conf_r), rtol=1e-6)
    np.testing.assert_allclose(float(cls_g), float(cls_r), rtol=1e-6)
    assert float(wh_g) == 0.0 and float(wh_r) > 0.0
    # giou box term is bounded by (1 - giou_min) * weight: <= 2 * 2 * 1
    assert 0.0 < float(xy_g) <= 4.0
