"""Resolution-aware serving-mode selection (ops/postprocess.py round-5).

The policy encodes measured v5e facts (docs/BENCHMARKS.md): full int8 PTQ
wins at MXU-bound sizes but LOSES to bf16 once the net is HBM-bound
(the reference's 1344x896 kite-demo showcase, README.md:64-66), while the
stem-int8 hybrid wins at every benched size. These tests pin the policy's
shape and that build_auto_detector actually routes to a working pipeline.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS
from yolov3_tensorflow_tpu.models.yolov3 import init_yolov3
from yolov3_tensorflow_tpu.ops.postprocess import (build_auto_detector,
                                                   select_serving_mode)

KITE = (896, 1344)   # reference showcase resolution (README.md:64-66)


def test_policy_exact_budget_is_bf16_everywhere():
    for size in [(416, 416), (608, 608), KITE]:
        assert select_serving_mode(size, quantize="none") == "packed"


def test_policy_hybrid_budget_is_stem8_everywhere():
    # stem-int8 chains int8 only through the bandwidth-bound wide stages,
    # so unlike full PTQ it has no high-resolution loss regime
    for size in [(320, 320), (416, 416), (608, 608), KITE]:
        assert select_serving_mode(size, quantize="hybrid") == "stem8"


def test_policy_full_int8_gated_by_resolution():
    # int8 wins while MXU-bound ...
    assert select_serving_mode((416, 416), quantize="full") == "int8"
    assert select_serving_mode((608, 608), quantize="full") == "int8"
    # ... and must NEVER be picked where it is measured slower than bf16
    assert select_serving_mode(KITE, quantize="full") == "stem8"


def test_policy_rejects_unknown_budget():
    with pytest.raises(ValueError):
        select_serving_mode((416, 416), quantize="fast")


@pytest.fixture(scope="module")
def tiny_setup():
    num_classes = 4
    variables = init_yolov3(jax.random.PRNGKey(0), num_classes=num_classes)
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32))
    return variables, anchors, num_classes, images


@pytest.mark.parametrize("quantize", ["none", "hybrid", "full"])
def test_auto_detector_builds_and_runs(tiny_setup, quantize):
    variables, anchors, num_classes, images = tiny_setup
    detect = build_auto_detector(
        variables, anchors, num_classes, (96, 96), quantize=quantize,
        calibration_images=images, max_out=16, score_thresh=0.0,
        use_pallas=False)
    out = detect(images)
    assert set(out) >= {"boxes", "scores", "labels", "valid"}
    assert np.isfinite(np.asarray(out["boxes"], np.float32)).all()
    assert np.isfinite(np.asarray(out["scores"], np.float32)).all()


def test_auto_detector_degrades_without_calibration(tiny_setup):
    """No calibration images -> must fall back to the exact bf16 path
    rather than failing (stem8/int8 need activation scales)."""
    variables, anchors, num_classes, images = tiny_setup
    detect = build_auto_detector(
        variables, anchors, num_classes, (96, 96), quantize="full",
        max_out=16, score_thresh=0.0, use_pallas=False)
    out = detect(images)
    assert np.isfinite(np.asarray(out["scores"], np.float32)).all()
