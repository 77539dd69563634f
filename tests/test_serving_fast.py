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
from yolov3_tensorflow_tpu.ops.fast_postprocess import (postprocess_prefilter,
                                                        postprocess_split,
                                                        split_serving_head,
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
