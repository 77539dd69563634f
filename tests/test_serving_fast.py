"""Tests for the serving-path transforms: space-to-depth stem and split head.

Both transforms are algebraic rewrites of the folded inference network
(models/yolov3.py `space_to_depth_stem`, ops/fast_postprocess.py
`split_serving_head`): same multiply-adds, relaid out for the MXU/lane
geometry. Layer-level checks are exact; whole-network checks run in fp32
compute (a random-init 75-layer net amplifies even 1-ulp reassociation noise
to percent level, so bf16 end-to-end comparison is not meaningful).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS
from yolov3_tensorflow_tpu.models.layers import (conv_folded,
                                                 conv_folded_asym,
                                                 space_to_depth_2x)
from yolov3_tensorflow_tpu.models.yolov3 import (fold_batch_norm, init_yolov3,
                                                 space_to_depth_stem,
                                                 yolov3_forward_folded)
from yolov3_tensorflow_tpu.ops.fast_postprocess import (head_row_width,
                                                        pack_serving_head,
                                                        postprocess_packed,
                                                        postprocess_prefilter,
                                                        postprocess_split,
                                                        split_serving_head,
                                                        yolov3_forward_packed,
                                                        yolov3_forward_split)


@pytest.fixture(scope="module")
def folded():
    variables = init_yolov3(jax.random.PRNGKey(0), num_classes=80)
    return fold_batch_norm(variables, dtype=jnp.float32)


def test_s2d_stem_convs_exact(folded):
    """conv_0/conv_1 rewrites reproduce the original stem exactly."""
    fs2d = space_to_depth_stem(folded)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))

    y_ref = conv_folded(img, folded["backbone"]["conv_0"], stride=1,
                        compute_dtype=jnp.float32)
    y_got = conv_folded(space_to_depth_2x(img), fs2d["backbone"]["conv_0"],
                        stride=1, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(space_to_depth_2x(y_ref)),
                               np.asarray(y_got), atol=1e-6)

    z_ref = conv_folded(y_ref, folded["backbone"]["conv_1"], stride=2,
                        compute_dtype=jnp.float32)
    z_got = conv_folded_asym(y_got, fs2d["backbone"]["conv_1"],
                             padding=((1, 0), (1, 0)),
                             compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(z_ref), np.asarray(z_got),
                               atol=1e-6)


def test_s2d_forward_matches(folded):
    """Whole folded forward with stem_s2d stays close in fp32 compute."""
    fs2d = space_to_depth_stem(folded)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    ref = yolov3_forward_folded(folded, img, compute_dtype=jnp.float32)
    got = yolov3_forward_folded(fs2d, img, compute_dtype=jnp.float32,
                                stem_s2d=True)
    for a, b in zip(ref, got):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        # random-init conditioning amplifies reassociation noise; trained
        # nets are far tamer. Bound the relative deviation loosely.
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert rel < 0.05, rel


def test_split_head_postprocess_bitwise(folded):
    """Split-head serving pipeline == prefilter pipeline, fp32, exact."""
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    split = split_serving_head(folded, 80, cls_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32))

    fm = yolov3_forward_folded(folded, img, compute_dtype=jnp.float32)
    ref = postprocess_prefilter(fm, anchors, 80, (96, 96), max_out=20,
                                box_topk=128, score_thresh=0.2,
                                iou_thresh=0.45, use_pallas=False,
                                approx_topk=False)
    outs = yolov3_forward_split(split, img, compute_dtype=jnp.float32,
                                cls_dtype=jnp.float32)
    got = postprocess_split(outs, anchors, 80, (96, 96), max_out=20,
                            box_topk=128, score_thresh=0.2, iou_thresh=0.45,
                            approx_topk=False, use_pallas=False)
    for key in ("labels", "valid"):
        np.testing.assert_array_equal(
            np.asarray(ref[key]), np.asarray(got[key]), err_msg=key)
    for key in ("boxes", "scores"):
        # splitting the 1x1 conv changes the matmul tile shapes, so CPU SIMD
        # accumulation order differs at the ~1e-6 relative level
        np.testing.assert_allclose(
            np.asarray(ref[key], np.float32), np.asarray(got[key], np.float32),
            rtol=1e-5, atol=1e-4, err_msg=key)


def test_packed_forward_matches_split(folded):
    """Packed head outputs carry the same logits as the split head,
    rearranged: block a = [cls 0:C, conf, tx ty tw th, pad]."""
    c = 80
    row = head_row_width(c)
    split = split_serving_head(folded, c, cls_dtype=jnp.float32)
    packed = pack_serving_head(folded, c, out_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    souts = yolov3_forward_split(split, img, compute_dtype=jnp.float32,
                                 cls_dtype=jnp.float32)
    pouts = yolov3_forward_packed(packed, img, compute_dtype=jnp.float32,
                                  out_dtype=jnp.float32)
    for (bc, cl), p in zip(souts, pouts):
        p = np.asarray(p)
        bc = np.asarray(bc)
        cl = np.asarray(cl)
        for a in range(3):
            blk = p[..., a * row:(a + 1) * row]
            np.testing.assert_allclose(
                blk[..., :c], cl[..., a * row:a * row + c],
                rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                blk[..., c], bc[..., a * 5 + 4], rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                blk[..., c + 1:c + 5], bc[..., a * 5:a * 5 + 4],
                rtol=1e-5, atol=1e-5)
            # pad lanes sit at bias -30: sigmoid ~ 0, never wins a lane max
            assert np.all(blk[..., c + 5:] < -20)


def test_packed_postprocess_decode_exact():
    """postprocess_packed == postprocess_prefilter when the lane max equals
    the class max (constructed so conf/box logits never dominate)."""
    from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    c = 80
    row = head_row_width(c)
    rng = np.random.default_rng(6)
    b = 2
    fmaps, pouts = [], []
    for g in (3, 6, 12):
        cls = rng.uniform(0.0, 4.0, (b, g, g, 3, c)).astype(np.float32)
        conf = rng.uniform(-4.0, 0.0, (b, g, g, 3, 1)).astype(np.float32)
        box = rng.uniform(-1.0, 1.0, (b, g, g, 3, 4)).astype(np.float32)
        # standard layout: [tx ty tw th conf cls...] per anchor
        std = np.concatenate([box, conf, cls], axis=-1)
        fmaps.append(jnp.asarray(std.reshape(b, g, g, 3 * (5 + c))))
        packed = np.full((b, g, g, 3, row), -30.0, np.float32)
        packed[..., :c] = cls
        packed[..., c] = conf[..., 0]
        packed[..., c + 1:c + 5] = box
        pouts.append(jnp.asarray(packed.reshape(b, g, g, 3 * row)))

    ref = postprocess_prefilter(fmaps, anchors, c, (96, 96), max_out=20,
                                box_topk=64, score_thresh=0.2,
                                iou_thresh=0.45, use_pallas=False,
                                approx_topk=False)
    got = postprocess_packed(pouts, anchors, c, (96, 96), max_out=20,
                             box_topk=64, score_thresh=0.2, iou_thresh=0.45,
                             approx_topk=False, use_pallas=False)
    for key in ("labels", "valid"):
        np.testing.assert_array_equal(
            np.asarray(ref[key]), np.asarray(got[key]), err_msg=key)
    for key in ("boxes", "scores"):
        np.testing.assert_allclose(
            np.asarray(ref[key], np.float32), np.asarray(got[key], np.float32),
            rtol=1e-5, atol=1e-4, err_msg=key)


def test_packed_head_shapes(folded):
    """Packed outputs carry the documented layout and dtype."""
    packed = pack_serving_head(folded, 80)
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    outs = yolov3_forward_packed(packed, img)
    assert len(outs) == 3
    for p, stride in zip(outs, (32, 16, 8)):
        g = 64 // stride
        assert p.shape == (1, g, g, 3 * 128)
        assert p.dtype == jnp.bfloat16


def test_packed_head_voc_row_width():
    """C=20 (VOC) also packs into one 128-lane block per anchor."""
    variables = init_yolov3(jax.random.PRNGKey(1), num_classes=20)
    f20 = fold_batch_norm(variables, dtype=jnp.float32)
    packed = pack_serving_head(f20, 20, out_dtype=jnp.float32)
    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    outs = yolov3_forward_packed(packed, img, compute_dtype=jnp.float32,
                                 out_dtype=jnp.float32)
    for p, stride in zip(outs, (32, 16, 8)):
        g = 64 // stride
        assert p.shape == (1, g, g, 3 * 128)
        blk = np.asarray(p).reshape(1, g, g, 3, 128)
        # layout: [cls 0:20, conf @20, box @21:25, pad(-30) @25:]
        assert np.all(blk[..., 25:] < -20)


def test_packed_postprocess_k_not_lane_multiple():
    """box_topk < 128 pads candidates for the Pallas kernel; pad rows can
    never survive (zero boxes, zero scores). CPU path (use_pallas=False)
    must agree with the padded kernel path in interpret mode."""
    from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    c = 80
    row = head_row_width(c)
    rng = np.random.default_rng(9)
    b = 2
    pouts = []
    for g in (2, 4, 8):
        packed = np.full((b, g, g, 3, row), -30.0, np.float32)
        packed[..., :c] = rng.uniform(0, 4, (b, g, g, 3, c))
        packed[..., c] = rng.uniform(-2, 2, (b, g, g, 3))
        packed[..., c + 1:c + 5] = rng.uniform(-1, 1, (b, g, g, 3, 4))
        pouts.append(jnp.asarray(packed.reshape(b, g, g, 3 * row)))

    ref = postprocess_packed(pouts, anchors, c, (64, 64), max_out=128,
                             box_topk=64, score_thresh=0.3, iou_thresh=0.45,
                             approx_topk=False, use_pallas=False)
    ve = np.asarray(ref["valid"]).astype(bool)
    assert ve.any()

    import jax.experimental.pallas  # noqa: F401  (skip if unavailable)
    from unittest import mock
    from yolov3_tensorflow_tpu.ops import nms_pallas as np_mod
    orig = np_mod.batched_nms_shared_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(np_mod, "batched_nms_shared_pallas", interp):
        got = postprocess_packed(pouts, anchors, c, (64, 64), max_out=128,
                                 box_topk=64, score_thresh=0.3,
                                 iou_thresh=0.45, approx_topk=False,
                                 use_pallas=True)
    # same surviving detections (row layouts differ between the two
    # backends: compare as sets of (label, rounded box, rounded score))
    def det_set(d):
        v = np.asarray(d["valid"]).astype(bool)
        out = set()
        for i in range(b):
            for bx, sc, lb in zip(np.asarray(d["boxes"])[i][v[i]],
                                  np.asarray(d["scores"])[i][v[i]],
                                  np.asarray(d["labels"])[i][v[i]]):
                out.add((i, int(lb), round(float(sc), 4),
                         tuple(np.round(bx, 2))))
        return out
    assert det_set(ref) == det_set(got)


def test_split_head_shapes(folded):
    """Split outputs carry the documented layouts."""
    split = split_serving_head(folded, 80)
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    outs = yolov3_forward_split(split, img)
    assert len(outs) == 3
    for (bc, cl), stride in zip(outs, (32, 16, 8)):
        g = 64 // stride
        assert bc.shape == (1, g, g, 15)
        assert bc.dtype == jnp.float32
        assert cl.shape == (1, g, g, 3 * 128)
        assert cl.dtype == jnp.bfloat16
