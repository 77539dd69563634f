"""int8 PTQ path: quantization math, calibration, and forward closeness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.models.yolov3 import (fold_batch_norm, init_yolov3,
                                                 yolov3_forward_folded)
from yolov3_tensorflow_tpu.ops.fast_postprocess import (
    flatten_feature_maps, flatten_feature_maps_aligned, head_row_width,
    pad_output_convs_aligned)
from yolov3_tensorflow_tpu.ops.quantize import (calibrate_activation_scales,
                                                quantize_model,
                                                yolov3_forward_int8)

NUM_CLASSES = 3


@pytest.fixture(scope="module")
def setup():
    variables = init_yolov3(jax.random.PRNGKey(0), NUM_CLASSES)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    scales = calibrate_activation_scales(variables, images)
    return variables, images, scales


def test_calibration_structure(setup):
    variables, _, scales = setup
    assert scales["backbone"]["conv_0"] == pytest.approx(1.0)  # inputs in [0,1]
    assert len(scales["backbone"]) == 52
    assert len(scales["head"]) == 23  # incl. output convs (observed, unused)
    assert all(v > 0 for v in scales["backbone"].values())


def test_quantize_model_weight_roundtrip(setup):
    variables, _, scales = setup
    q = quantize_model(variables, scales)
    folded = fold_batch_norm(variables, dtype=jnp.float32)

    qp = q["backbone"]["conv_0"]
    assert qp["w8"].dtype == jnp.int8
    # dequantized weights approximate the folded fp32 weights
    w_scale = np.asarray(qp["eff_scale"]) / (float(qp["in_scale"]))
    w_deq = np.asarray(qp["w8"], np.float32) * w_scale
    w_ref = np.asarray(folded["backbone"]["conv_0"]["w"])
    err = np.abs(w_deq - w_ref).max()
    assert err <= np.abs(w_ref).max() / 127.0 + 1e-7  # within one grid step
    # output convs stay float
    assert "w8" not in q["head"]["conv_22"]
    assert q["head"]["conv_22"]["w"].dtype == jnp.bfloat16


def test_int8_forward_close_to_bf16(setup):
    variables, images, scales = setup
    q = quantize_model(variables, scales)
    fm8 = yolov3_forward_int8(q, images)
    folded = fold_batch_norm(variables, dtype=jnp.bfloat16)
    fmb = yolov3_forward_folded(folded, images, compute_dtype=jnp.bfloat16)
    for a, b in zip(fm8, fmb):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.99, corr
        assert a.shape == b.shape


def test_aligned_head_padding_is_exact(setup):
    """Lane-aligned output convs give bit-identical used channels."""
    variables, images, _ = setup
    folded = fold_batch_norm(variables, dtype=jnp.float32)
    padded_head = pad_output_convs_aligned(folded["head"], NUM_CLASSES)
    folded_a = {**folded, "head": padded_head}

    fm = yolov3_forward_folded(folded, images, compute_dtype=jnp.float32)
    fm_a = yolov3_forward_folded(folded_a, images, compute_dtype=jnp.float32)

    row = head_row_width(NUM_CLASSES)
    assert row == 128
    raw = np.asarray(flatten_feature_maps(fm, NUM_CLASSES))
    raw_a = np.asarray(flatten_feature_maps_aligned(fm_a, NUM_CLASSES))
    assert raw_a.shape[2] == row
    np.testing.assert_allclose(raw_a[..., :5 + NUM_CLASSES], raw,
                               rtol=1e-5, atol=1e-5)
    # padding channels carry exactly the (zero-weight) bias = 0
    np.testing.assert_array_equal(raw_a[..., 5 + NUM_CLASSES:], 0.0)


def test_int8_chained_matches_basic(setup):
    """The int8-chained forward (int8 activations end-to-end, fused residual
    adds, split post-concat convs) tracks the basic int8 path within the
    extra per-edge rounding noise."""
    from yolov3_tensorflow_tpu.ops.fast_postprocess import pack_serving_head
    from yolov3_tensorflow_tpu.ops.quantize import (
        quantize_model_chained, yolov3_forward_int8_chained,
        yolov3_forward_int8_packed)

    variables, images, scales = setup
    qc = pack_serving_head(quantize_model_chained(variables, scales),
                           NUM_CLASSES)
    qp = pack_serving_head(quantize_model(variables, scales), NUM_CLASSES)
    outs = yolov3_forward_int8_chained(qc, images)
    ref = yolov3_forward_int8_packed(qp, images)
    for p, r in zip(outs, ref):
        a = np.asarray(p, np.float32)
        b = np.asarray(r, np.float32)
        assert a.shape == b.shape
        m = b > -20                      # ignore the -30 pad lanes
        d = np.abs(a - b)[m]
        # one extra int8 rounding per activation edge; logits here are O(0.3)
        assert d.max() < 0.05, d.max()
        corr = np.corrcoef(a[m].ravel(), b[m].ravel())[0, 1]
        assert corr > 0.999, corr


def test_int8_chained_plain_head(setup):
    """head="plain" emits the 3 raw 3*(5+C)-channel feature maps."""
    from yolov3_tensorflow_tpu.ops.quantize import (
        quantize_model_chained, yolov3_forward_int8_chained)

    variables, images, scales = setup
    qc = quantize_model_chained(variables, scales)
    fmaps = yolov3_forward_int8_chained(qc, images, head="plain")
    for fm, stride in zip(fmaps, (32, 16, 8)):
        g = 64 // stride
        assert fm.shape == (2, g, g, 3 * (5 + NUM_CLASSES))
