"""Darknet `.weights` binary importer.

Rebuild of reference utils/misc_utils.py:70-126 `load_weights` +
convert_weight.py. The reference walks TF's variable-creation order and peeks
at the *next* variable's name to decide BN-vs-bias reads — correctness hangs
on graph construction order. Here the model publishes its explicit darknet
layer order (`models.yolov3.darknet_layer_order`: 52 backbone convs + 23 head
convs, with conv_6/14/22 bias-carrying), and the importer maps by name.

Darknet serialization, per conv layer:
  [bn] beta(gamma? no:) — order is: bias/beta, then (if BN) gamma, mean, var —
  darknet writes: biases, scales, rolling_mean, rolling_variance, weights.
  For a BN conv: beta (biases), gamma (scales), mean, var, then kernel.
  For a plain conv: bias then kernel.
  Kernel layout (out, in, h, w) -> transposed to HWIO (h, w, in, out)
  (misc_utils.py:117-120). File header: 5 int32s (misc_utils.py:78).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from yolov3_tensorflow_tpu.models.yolov3 import darknet_layer_order


def load_darknet_weights(variables: Dict[str, Any], weights_path: str,
                         num_classes: int = 80) -> Dict[str, Any]:
    """Fill a freshly-initialized variable tree from a darknet .weights file.

    Returns a new {"params", "batch_stats"} tree (numpy arrays; caller may
    jax.device_put). Raises if the file size does not exactly match the
    architecture, so silent truncation/misalignment is impossible (an
    improvement over the reference's unchecked sequential reads).
    """
    with open(weights_path, "rb") as f:
        header = np.fromfile(f, dtype=np.int32, count=5)
        blob = np.fromfile(f, dtype=np.float32)
    del header

    params = {k: {n: dict(p) for n, p in v.items()}
              for k, v in variables["params"].items()}
    stats = {k: {n: dict(s) for n, s in v.items()}
             for k, v in variables["batch_stats"].items()}

    ptr = 0

    def read(count: int) -> np.ndarray:
        nonlocal ptr
        if ptr + count > blob.size:
            raise ValueError(
                f"darknet weights file too short: need {ptr + count} floats, "
                f"have {blob.size}")
        out = blob[ptr:ptr + count]
        ptr += count
        return out

    for scope, name, has_bn in darknet_layer_order(num_classes):
        p = params[scope][name]
        w_shape = tuple(np.shape(p["w"]))       # (h, w, in, out)
        kh, kw, cin, cout = w_shape
        if has_bn:
            s = stats[scope][name]
            p["beta"] = read(cout).copy()
            p["gamma"] = read(cout).copy()
            s["mean"] = read(cout).copy()
            s["var"] = read(cout).copy()
        else:
            p["b"] = read(cout).copy()
        kernel = read(kh * kw * cin * cout).reshape(cout, cin, kh, kw)
        p["w"] = np.ascontiguousarray(kernel.transpose(2, 3, 1, 0))

    if ptr != blob.size:
        raise ValueError(
            f"darknet weights file has {blob.size - ptr} unread floats — "
            f"architecture mismatch (expected num_classes={num_classes}?)")
    return {"params": params, "batch_stats": stats}


def save_darknet_weights(variables: Dict[str, Any], weights_path: str,
                         num_classes: int = 80) -> None:
    """Inverse of `load_darknet_weights` (round-trip testing + export)."""
    chunks = [np.zeros(5, np.int32).tobytes()]
    params, stats = variables["params"], variables["batch_stats"]
    for scope, name, has_bn in darknet_layer_order(num_classes):
        p = params[scope][name]
        if has_bn:
            s = stats[scope][name]
            for arr in (p["beta"], p["gamma"], s["mean"], s["var"]):
                chunks.append(np.asarray(arr, np.float32).tobytes())
        else:
            chunks.append(np.asarray(p["b"], np.float32).tobytes())
        w = np.asarray(p["w"], np.float32)        # HWIO
        chunks.append(np.ascontiguousarray(
            w.transpose(3, 2, 0, 1)).tobytes())   # -> (out, in, h, w)
    with open(weights_path, "wb") as f:
        f.writelines(chunks)


def expected_weight_count(num_classes: int = 80) -> int:
    """Total float32 count of a darknet file for this architecture
    (excluding the 5-int32 header). Used for file validation and tests."""
    import jax

    from yolov3_tensorflow_tpu.models.yolov3 import init_yolov3
    variables = jax.eval_shape(
        lambda: init_yolov3(jax.random.PRNGKey(0), num_classes))
    total = 0
    for scope, name, has_bn in darknet_layer_order(num_classes):
        p = variables["params"][scope][name]
        total += int(np.prod(p["w"].shape))
        cout = p["w"].shape[-1]
        total += 4 * cout if has_bn else cout
    return total
