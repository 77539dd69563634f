"""Model structure + forward shape/parity tests (reference model.py:30-80)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.models.yolov3 import (
    darknet_layer_order, fold_batch_norm, init_yolov3, yolov3_forward,
    yolov3_forward_folded,
)
from yolov3_tensorflow_tpu.models.decode import decode_feature_map, predict_boxes


NUM_CLASSES = 4  # tiny for test speed


@pytest.fixture(scope="module")
def variables():
    return init_yolov3(jax.random.PRNGKey(0), num_classes=NUM_CLASSES)


def test_layer_count_matches_darknet_serialization(variables):
    # 52 backbone convs + 23 head convs (SURVEY.md §3.5)
    order = darknet_layer_order(NUM_CLASSES)
    assert len(order) == 75
    assert len(variables["params"]["backbone"]) == 52
    assert len(variables["params"]["head"]) == 23
    # exactly the 3 detection convs carry biases (model.py:55-77)
    bias_convs = [n for n, p in variables["params"]["head"].items() if "b" in p]
    assert sorted(bias_convs) == ["conv_14", "conv_22", "conv_6"]
    # BN state exists exactly for the BN convs
    assert len(variables["batch_stats"]["backbone"]) == 52
    assert len(variables["batch_stats"]["head"]) == 20


def test_forward_shapes(variables):
    imgs = jnp.zeros((2, 128, 160, 3), jnp.float32)  # non-square: w != h
    (f1, f2, f3), _ = yolov3_forward(variables, imgs, train=False)
    c = 3 * (5 + NUM_CLASSES)
    assert f1.shape == (2, 4, 5, c)      # stride 32
    assert f2.shape == (2, 8, 10, c)     # stride 16
    assert f3.shape == (2, 16, 20, c)    # stride 8
    assert f1.dtype == jnp.float32


def test_train_mode_updates_batch_stats(variables):
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    _, new_stats = yolov3_forward(variables, imgs, train=True)
    old = variables["batch_stats"]["backbone"]["conv_0"]["mean"]
    new = new_stats["backbone"]["conv_0"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
    # eval mode leaves stats untouched
    _, same_stats = yolov3_forward(variables, imgs, train=False)
    np.testing.assert_array_equal(
        np.asarray(same_stats["backbone"]["conv_0"]["mean"]), np.asarray(old))


def test_folded_forward_matches_unfolded(variables):
    """BN folding is a pure refactoring of eval-mode inference."""
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    (f1, _, _), _ = yolov3_forward(variables, imgs, train=False,
                                   compute_dtype=jnp.float32)
    folded = fold_batch_norm(variables, dtype=jnp.float32)
    g1, _, _ = yolov3_forward_folded(folded, imgs, compute_dtype=jnp.float32)
    # folding is exact in exact arithmetic; allow fp32 reassociation noise
    # accumulated through 75 conv layers
    np.testing.assert_allclose(np.asarray(f1), np.asarray(g1), atol=2e-3)


def test_split_neck_matches_literal_dataflow(variables):
    """The FPN-junction rewrite (layers.neck_split_folded: 1x1-conv-over-
    concat split into two convs, lateral half computed pre-upsample) is an
    exact reassociation of reference model.py:59-63,69-73 — all three
    feature maps must match the literal upsample+concat dataflow."""
    imgs = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    folded = fold_batch_norm(variables, dtype=jnp.float32)
    lit = yolov3_forward_folded(folded, imgs, compute_dtype=jnp.float32,
                                split_neck=False)
    spl = yolov3_forward_folded(folded, imgs, compute_dtype=jnp.float32,
                                split_neck=True)
    for a, b in zip(lit, spl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_split_neck_training_matches_literal_dataflow(variables):
    """The live-BN junction rewrite (layers.neck_split_bn_leaky) feeds BN the
    identical pre-activation tensor, so train-mode feature maps, updated BN
    moments AND gradients must match the literal upsample+concat dataflow."""
    imgs = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 64, 3))

    def run(split):
        return yolov3_forward(variables, imgs, train=True,
                              compute_dtype=jnp.float32, split_neck=split)

    (lit, lit_stats), (spl, spl_stats) = run(False), run(True)
    for a, b in zip(lit, spl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for name in ("conv_8", "conv_16"):   # the junction convs' live moments
        np.testing.assert_allclose(
            np.asarray(lit_stats["head"][name]["mean"]),
            np.asarray(spl_stats["head"][name]["mean"]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(lit_stats["head"][name]["var"]),
            np.asarray(spl_stats["head"][name]["var"]), atol=1e-5)

    # Gradient identity, checked on the isolated junction in float64 (a
    # full-model fp32 grad comparison is hopelessly ill-conditioned: the
    # BN-train backward chain amplifies conv reassociation noise to percent
    # level; the junction itself is exact — 1e-13 in fp64).
    from yolov3_tensorflow_tpu.models.layers import (conv_bn_leaky,
                                                     init_conv_bn,
                                                     neck_split_bn_leaky,
                                                     upsample_nearest_2x)
    with jax.enable_x64(True):
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        p_lat, s_lat = init_conv_bn(ks[0], 1, 8, 4)
        p_first, s_first = init_conv_bn(ks[1], 1, 12, 6)
        to64 = lambda t: jax.tree.map(lambda a: a.astype(jnp.float64), t)
        p_lat, p_first, s_lat, s_first = map(
            to64, (p_lat, p_first, s_lat, s_first))
        inter = jax.random.normal(ks[2], (2, 4, 4, 8), jnp.float64)
        route = jax.random.normal(ks[3], (2, 8, 8, 8), jnp.float64)

        def lit_loss(params):
            pl, pf = params
            x, _ = conv_bn_leaky(inter, pl, s_lat, train=True,
                                 compute_dtype=jnp.float64)
            x = upsample_nearest_2x(x)
            x = jnp.concatenate([x, route], axis=-1)
            y, _ = conv_bn_leaky(x, pf, s_first, train=True,
                                 compute_dtype=jnp.float64)
            return jnp.sum(jnp.square(y))

        def spl_loss(params):
            pl, pf = params
            y, _, _ = neck_split_bn_leaky(
                inter, route, pl, s_lat, pf, s_first, train=True,
                compute_dtype=jnp.float64)
            return jnp.sum(jnp.square(y))

        params = (p_lat, p_first)
        g_lit = jax.grad(lit_loss)(params)
        g_spl = jax.grad(spl_loss)(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-10), g_lit, g_spl)


def test_decode_feature_map_golden():
    """Decode math vs a hand-computed numpy oracle (model.py:82-137)."""
    rng = np.random.RandomState(0)
    c = 2
    fmap = rng.randn(1, 2, 2, 3 * (5 + c)).astype(np.float32)
    anchors = np.array([[10, 13], [16, 30], [33, 23]], np.float32)
    img_size = (64, 64)  # (h, w), ratio 32

    xy_off, boxes, conf, prob = decode_feature_map(
        jnp.asarray(fmap), anchors, c, img_size)

    f = fmap.reshape(1, 2, 2, 3, 5 + c)
    sig = lambda v: 1 / (1 + np.exp(-v))
    for y in range(2):
        for x in range(2):
            for a in range(3):
                cx = (sig(f[0, y, x, a, 0]) + x) * 32.0
                cy = (sig(f[0, y, x, a, 1]) + y) * 32.0
                w = np.exp(f[0, y, x, a, 2]) * anchors[a, 0]
                h = np.exp(f[0, y, x, a, 3]) * anchors[a, 1]
                np.testing.assert_allclose(
                    np.asarray(boxes[0, y, x, a]), [cx, cy, w, h], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(conf), f[..., 4:5], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(prob), f[..., 5:], rtol=1e-6)


def test_predict_boxes_anchor_count(variables):
    imgs = jnp.zeros((1, 416, 416, 3))
    fmaps, _ = yolov3_forward(variables, imgs, train=False)
    anchors = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                        [59, 119], [116, 90], [156, 198], [373, 326]],
                       np.float32)
    boxes, confs, probs = predict_boxes(fmaps, anchors, NUM_CLASSES, (416, 416))
    assert boxes.shape == (1, 10647, 4)   # (13^2+26^2+52^2)*3, model.py:176
    assert confs.shape == (1, 10647, 1)
    assert probs.shape == (1, 10647, NUM_CLASSES)
    # xyxy ordering
    assert np.all(np.asarray(boxes[..., 2]) >= np.asarray(boxes[..., 0]))
