"""Loss parity: compute_loss vs an independent numpy oracle that transcribes
the reference equations (model.py:192-304) term by term, including ignore
mask, box_loss_scale, mixup weights, focal loss and label smoothing."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.ops.losses import (compute_loss, l2_regularization,
                                              loss_scale, sigmoid_bce)


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def _bce(logits, labels):
    return np.maximum(logits, 0) - logits * labels + np.log1p(np.exp(-np.abs(logits)))


def _iou_xywh_np(pred, gts):
    """pred: [..., 4] (cx,cy,w,h); gts: [V, 4]. -> [..., V]"""
    pxy = pred[..., None, 0:2]
    pwh = pred[..., None, 2:4]
    txy = gts[:, 0:2]
    twh = gts[:, 2:4]
    mins = np.maximum(pxy - pwh / 2, txy - twh / 2)
    maxs = np.minimum(pxy + pwh / 2, txy + twh / 2)
    wh = np.maximum(maxs - mins, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (pwh[..., 0] * pwh[..., 1] + twh[:, 0] * twh[:, 1] - inter + 1e-10)


def _reference_loss_scale(fmap, y_true, anchors, num_classes, img_size,
                          use_label_smooth, use_focal_loss):
    """Direct numpy transcription of reference loss_layer (model.py:192-304)."""
    n, hg, wg = fmap.shape[:3]
    img_h, img_w = img_size
    ratio = np.array([img_h / hg, img_w / wg])          # (h, w), model.py:204
    f = fmap.reshape(n, hg, wg, 3, 5 + num_classes)

    # reorg (model.py:82-137)
    xv, yv = np.meshgrid(np.arange(wg), np.arange(hg))
    xy_off = np.stack([xv, yv], -1)[:, :, None, :].astype(np.float64)
    centers = (_sig(f[..., 0:2]) + xy_off) * ratio[::-1]
    sizes = np.exp(f[..., 2:4]) * anchors               # already input-pixel
    pred_boxes = np.concatenate([centers, sizes], -1)
    conf_logits = f[..., 4:5]
    prob_logits = f[..., 5:]

    object_mask = y_true[..., 4:5]
    # ignore mask (model.py:220-239)
    ignore = np.zeros((n, hg, wg, 3, 1))
    for b in range(n):
        valid = y_true[b][object_mask[b, ..., 0] > 0][:, 0:4]
        if len(valid):
            iou = _iou_xywh_np(pred_boxes[b], valid)
            best = iou.max(-1)
        else:
            best = np.full((hg, wg, 3), -np.inf)
        ignore[b, ..., 0] = (best < 0.5).astype(np.float64)

    true_xy = y_true[..., 0:2] / ratio[::-1] - xy_off
    pred_xy = centers / ratio[::-1] - xy_off
    true_tw = y_true[..., 2:4] / anchors
    pred_tw = sizes / anchors
    true_tw = np.where(true_tw == 0, 1, true_tw)
    pred_tw = np.where(pred_tw == 0, 1, pred_tw)
    true_tw = np.log(np.clip(true_tw, 1e-9, 1e9))
    pred_tw = np.log(np.clip(pred_tw, 1e-9, 1e9))

    box_scale = 2.0 - (y_true[..., 2:3] / img_w) * (y_true[..., 3:4] / img_h)
    mix_w = y_true[..., -1:]

    xy_loss = np.sum((true_xy - pred_xy) ** 2 * object_mask * box_scale * mix_w) / n
    wh_loss = np.sum((true_tw - pred_tw) ** 2 * object_mask * box_scale * mix_w) / n

    conf = (object_mask * _bce(conf_logits, object_mask)
            + (1 - object_mask) * ignore * _bce(conf_logits, object_mask))
    if use_focal_loss:
        conf = conf * np.abs(object_mask - _sig(conf_logits)) ** 2
    conf_loss = np.sum(conf * mix_w) / n

    target = y_true[..., 5:-1]
    if use_label_smooth:
        target = (1 - 0.01) * target + 0.01 / num_classes
    class_loss = np.sum(object_mask * _bce(prob_logits, target) * mix_w) / n
    return xy_loss, wh_loss, conf_loss, class_loss


def _make_case(seed, n=2, hg=4, wg=4, c=3):
    rng = np.random.RandomState(seed)
    img_size = (hg * 32, wg * 32)
    anchors = np.array([[30, 61], [62, 45], [59, 119]], np.float32)
    fmap = rng.randn(n, hg, wg, 3 * (5 + c)).astype(np.float32) * 0.5
    y_true = np.zeros((n, hg, wg, 3, 6 + c), np.float32)
    y_true[..., -1] = 1.0
    # drop a few GT boxes into cells
    for b in range(n):
        for _ in range(3):
            y, x, a = rng.randint(hg), rng.randint(wg), rng.randint(3)
            cx = (x + rng.uniform(0.1, 0.9)) * 32
            cy = (y + rng.uniform(0.1, 0.9)) * 32
            w = rng.uniform(10, 80)
            h = rng.uniform(10, 80)
            y_true[b, y, x, a, 0:4] = [cx, cy, w, h]
            y_true[b, y, x, a, 4] = 1.0
            y_true[b, y, x, a, 5 + rng.randint(c)] = 1.0
            y_true[b, y, x, a, -1] = rng.uniform(0.3, 1.0)  # mixup weight
    return fmap, y_true, anchors, c, img_size


@pytest.mark.parametrize("smooth,focal", [(False, False), (True, True)])
def test_loss_scale_matches_reference_oracle(smooth, focal):
    fmap, y_true, anchors, c, img_size = _make_case(0)
    want = _reference_loss_scale(fmap.astype(np.float64),
                                 y_true.astype(np.float64), anchors, c,
                                 img_size, smooth, focal)
    got = loss_scale(jnp.asarray(fmap), jnp.asarray(y_true), anchors, c,
                     img_size, use_label_smooth=smooth, use_focal_loss=focal)
    for g, w, name in zip(got, want, ["xy", "wh", "conf", "class"]):
        np.testing.assert_allclose(float(g), w, rtol=2e-4, err_msg=name)


def test_empty_image_all_negatives():
    """No GT: xy/wh/class zero; every cell is an unignored negative
    (TF reduce_max over empty axis -> -inf < 0.5)."""
    fmap, y_true, anchors, c, img_size = _make_case(1, n=1)
    y_true[...] = 0.0
    y_true[..., -1] = 1.0  # wipe objects, reset mixup weight to 1
    xy, wh, conf, cls = loss_scale(jnp.asarray(fmap), jnp.asarray(y_true),
                                   anchors, c, img_size)
    assert float(xy) == 0 and float(wh) == 0 and float(cls) == 0
    want = np.sum(_bce(np.asarray(
        fmap.reshape(1, 4, 4, 3, 5 + c)[..., 4:5], np.float64), 0.0))
    np.testing.assert_allclose(float(conf), want, rtol=2e-4)


def test_compute_loss_sums_scales():
    rng = np.random.RandomState(3)
    c = 2
    anchors = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                        [59, 119], [116, 90], [156, 198], [373, 326]],
                       np.float32)
    img_size = (64, 64)
    fmaps, y_trues = [], []
    for s in (32, 16, 8):
        g = 64 // s
        fmaps.append(jnp.asarray(rng.randn(1, g, g, 3 * (5 + c)) * 0.3,
                                 jnp.float32))
        yt = np.zeros((1, g, g, 3, 6 + c), np.float32)
        yt[..., -1] = 1.0
        y_trues.append(jnp.asarray(yt))
    out = compute_loss(fmaps, y_trues, anchors, c, img_size)
    np.testing.assert_allclose(
        float(out["total"]),
        float(out["xy"] + out["wh"] + out["conf"] + out["class"]), rtol=1e-6)
    assert np.isfinite(float(out["total"]))


def test_l2_regularization_counts_all_kernels():
    params = {"backbone": {"conv_0": {"w": jnp.ones((1, 1, 1, 2))}},
              "head": {"conv_6": {"w": jnp.full((1, 1, 2, 2), 2.0),
                                  "b": jnp.ones((2,))}}}
    # 0.5 * wd * (2*1 + 4*4); bias excluded
    np.testing.assert_allclose(float(l2_regularization(params, 0.1)),
                               0.5 * 0.1 * (2 + 16), rtol=1e-6)


def test_grad_finite_under_wh_logit_overflow():
    """A wh logit past exp's fp32 overflow point (~88.7) must not NaN the
    gradient. The reference's formulation (exp-decode then re-log,
    model.py:254-262) survives in the FORWARD via its clip but its VJP is
    clip'(inf)=0 times exp'(t)=inf = NaN — the exact failure that aborted
    the r4 reference-recipe gate at step 333 (loss finite, params NaN one
    step later). The rebuilt loss takes log-space wh straight from the raw
    logits and clamps decode's exp, so the grad stays finite."""
    import jax

    fmap, y_true, anchors, c, img_size = _make_case(3)
    fmap = fmap.copy()
    fmap[0, 1, 1, 2 + 0 * (5 + c)] = 95.0   # tw of anchor 0: exp -> inf
    fmap[1, 2, 2, 3 + 1 * (5 + c)] = 120.0  # th of anchor 1

    def total(f):
        out = loss_scale(f, jnp.asarray(y_true), anchors, c, img_size,
                         use_focal_loss=True, use_label_smooth=True)
        return sum(out)

    val, grad = jax.value_and_grad(total)(jnp.asarray(fmap))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_wh_loss_raw_logit_formulation_matches_exp_log():
    """For sane logits the raw-logit wh term is the identical value the
    reference's exp-then-log roundtrip produces (log(exp(t)) == t)."""
    fmap, y_true, anchors, c, img_size = _make_case(4)
    want = _reference_loss_scale(fmap.astype(np.float64),
                                 y_true.astype(np.float64), anchors, c,
                                 img_size, False, False)
    got = loss_scale(jnp.asarray(fmap), jnp.asarray(y_true), anchors, c,
                     img_size)
    np.testing.assert_allclose(float(got[1]), want[1], rtol=2e-4)


def test_old_exp_then_log_formulation_would_nan():
    """Sharpness check for the regression above: the reference's literal
    exp-then-re-log chain (what the loss used before round 4) really does
    NaN its gradient at the same input, so the finite-grad assertion is a
    real discriminator, not a tautology."""
    import jax

    def old_wh_term(t):
        pred = jnp.exp(t)                      # unclamped, model.py:123-126
        pred = jnp.where(pred == 0.0, 1.0, pred)
        return jnp.sum(jnp.log(jnp.clip(pred, 1e-9, 1e9)))

    g = jax.grad(old_wh_term)(jnp.asarray([0.5, 95.0], jnp.float32))
    assert np.isfinite(np.asarray(g)[0])       # sane logit: clean grad
    assert not np.isfinite(np.asarray(g)[1])   # overflowed logit: NaN grad
