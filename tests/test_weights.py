"""Darknet .weights importer tests against a synthetic weights file.

No pretrained checkpoint ships in this environment, so the golden check is a
round-trip: write a file in darknet layout from known arrays, import it, and
verify placement; plus a sequential-layout oracle that mimics the reference
reader's pointer walk (misc_utils.py:70-126)."""

import io

import jax
import numpy as np
import pytest

from yolov3_tensorflow_tpu.models.yolov3 import darknet_layer_order, init_yolov3
from yolov3_tensorflow_tpu.utils.weights import (expected_weight_count,
                                                 load_darknet_weights,
                                                 save_darknet_weights)

NUM_CLASSES = 2


@pytest.fixture(scope="module")
def variables():
    return init_yolov3(jax.random.PRNGKey(0), num_classes=NUM_CLASSES)


def test_expected_weight_count_matches_param_tree(variables):
    total = 0
    for scope in variables["params"].values():
        for p in scope.values():
            for k, arr in p.items():
                if k in ("w", "b", "beta", "gamma"):
                    total += int(np.prod(arr.shape))
    for scope in variables["batch_stats"].values():
        for s in scope.values():
            total += int(np.prod(s["mean"].shape)) + int(np.prod(s["var"].shape))
    assert expected_weight_count(NUM_CLASSES) == total


def test_round_trip(tmp_path, variables):
    path = str(tmp_path / "synthetic.weights")
    # fill with recognizable sequential values
    n = expected_weight_count(NUM_CLASSES)
    blob = np.arange(n, dtype=np.float32) * 1e-3

    with open(path, "wb") as f:
        f.write(np.zeros(5, np.int32).tobytes())
        f.write(blob.tobytes())

    loaded = load_darknet_weights(variables, path, NUM_CLASSES)

    # first conv: beta, gamma, mean, var are the first 4*32 floats
    p0 = loaded["params"]["backbone"]["conv_0"]
    s0 = loaded["batch_stats"]["backbone"]["conv_0"]
    np.testing.assert_allclose(p0["beta"], blob[0:32])
    np.testing.assert_allclose(p0["gamma"], blob[32:64])
    np.testing.assert_allclose(s0["mean"], blob[64:96])
    np.testing.assert_allclose(s0["var"], blob[96:128])
    # kernel (out,in,h,w) -> HWIO transpose
    kern = blob[128:128 + 32 * 3 * 9].reshape(32, 3, 3, 3)
    np.testing.assert_allclose(p0["w"], kern.transpose(2, 3, 1, 0))

    # save -> identical byte stream (modulo header)
    out_path = str(tmp_path / "resaved.weights")
    save_darknet_weights(loaded, out_path, NUM_CLASSES)
    with open(out_path, "rb") as f:
        f.seek(20)
        resaved = np.frombuffer(f.read(), np.float32)
    np.testing.assert_array_equal(resaved, blob)


def test_truncated_file_rejected(tmp_path, variables):
    path = str(tmp_path / "short.weights")
    with open(path, "wb") as f:
        f.write(np.zeros(5, np.int32).tobytes())
        f.write(np.zeros(1000, np.float32).tobytes())
    with pytest.raises(ValueError, match="too short"):
        load_darknet_weights(variables, path, NUM_CLASSES)


def test_oversized_file_rejected(tmp_path, variables):
    path = str(tmp_path / "long.weights")
    n = expected_weight_count(NUM_CLASSES)
    with open(path, "wb") as f:
        f.write(np.zeros(5, np.int32).tobytes())
        f.write(np.zeros(n + 7, np.float32).tobytes())
    with pytest.raises(ValueError, match="unread"):
        load_darknet_weights(variables, path, NUM_CLASSES)


def test_layer_order_is_body_then_head(variables):
    order = darknet_layer_order(NUM_CLASSES)
    assert order[0] == ("backbone", "conv_0", True)
    assert order[51] == ("backbone", "conv_51", True)
    assert order[52] == ("head", "conv_0", True)
    assert ("head", "conv_6", False) in order
    assert ("head", "conv_14", False) in order
    assert order[-1] == ("head", "conv_22", False)
