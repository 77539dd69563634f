"""Post-training int8 quantization for inference serving.

v5e executes int8 x int8 convs at ~2x its bf16 rate (394 vs 197 peak TOPS,
and both measured near peak on this chip), so a PTQ path roughly doubles
detector throughput. This module implements standard symmetric PTQ:

- weights: per-output-channel int8 scales, computed from the BN-folded
  kernels (folding first keeps the quantization grid aligned with the
  actually-executed weights)
- activations: per-tensor scales from a calibration pass that records each
  conv input's abs-max over sample images
- execution: activations stay bf16 between layers (adds/concats/upsample
  unchanged); each conv quantizes its input on the fly, runs int8 x int8 ->
  int32 on the MXU, and dequantizes+biases+activates in one fused epilogue.

The three detection output convs stay bf16 (their precision feeds the box
decode directly; their FLOP share is negligible).

Accuracy: validated on the overfit-gate checkpoint (scripts/
validate_quantized.py): int8 mAP 0.9954 vs bf16 0.9953 on the 50-image
synthetic set — no measurable PTQ cost (docs/BENCHMARKS.md). Re-calibrate
with `calibrate_activation_scales` on in-domain images before serving a new
dataset.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.models import layers as L
from yolov3_tensorflow_tpu.models.yolov3 import (_backbone_forward,
                                                 _head_forward,
                                                 fold_batch_norm)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------

def calibrate_activation_scales(variables: Params, images: jax.Array,
                                compute_dtype=jnp.bfloat16) -> Params:
    """Record per-conv-input abs-max over a calibration batch.

    Returns {scope: {conv_name: scalar fp32 abs-max}}. Run with a few
    hundred representative images for production use.
    """
    folded = fold_batch_norm(variables, dtype=compute_dtype)
    maxes: Params = {"backbone": {}, "head": {}}

    def observe(scope, name, x):
        m = jnp.max(jnp.abs(x.astype(jnp.float32)))
        prev = maxes[scope].get(name)
        maxes[scope][name] = m if prev is None else jnp.maximum(prev, m)

    def bn_conv(scope, name, x, stride=1):
        observe(scope, name, x)
        return L.conv_folded(x, folded[scope][name], stride=stride,
                             compute_dtype=compute_dtype)

    def out_conv(i, x):
        name = f"conv_{i}"
        observe("head", name, x)
        return L.conv_bias(x, folded["head"][name],
                           compute_dtype=compute_dtype)

    x = images.astype(compute_dtype)
    routes = _backbone_forward(
        lambda i, x, s: bn_conv("backbone", f"conv_{i}", x, s), x)
    _head_forward(lambda i, x: bn_conv("head", f"conv_{i}", x),
                  out_conv, routes)
    return jax.tree_util.tree_map(float, maxes)


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------

def quantize_model(variables: Params, act_scales: Params) -> Params:
    """BN-fold then int8-quantize every backbone/head conv except the three
    detection output convs.

    Returns qparams: per conv {"w8" int8 HWIO, "eff_scale" fp32 [cout]
    (= in_scale * w_scale, the dequant multiplier), "b" fp32 [cout],
    "in_scale" fp32 scalar}; output convs keep {"w", "b"} bf16.
    """
    folded = fold_batch_norm(variables, dtype=jnp.float32)
    q: Params = {}
    for scope, convs in folded.items():
        q[scope] = {}
        for name, p in convs.items():
            is_output = scope == "head" and name in ("conv_6", "conv_14",
                                                     "conv_22")
            if is_output:
                q[scope][name] = {"w": p["w"].astype(jnp.bfloat16),
                                  "b": p["b"].astype(jnp.float32)}
                continue
            w = np.asarray(p["w"], np.float32)              # [kh,kw,ci,co]
            w_absmax = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12)
            w_scale = w_absmax / 127.0                      # [co]
            w8 = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
            in_scale = max(float(act_scales[scope][name]), 1e-12) / 127.0
            q[scope][name] = {
                "w8": jnp.asarray(w8),
                "eff_scale": jnp.asarray(w_scale * in_scale, jnp.float32),
                "b": jnp.asarray(np.asarray(p["b"], np.float32)),
                "in_scale": jnp.float32(in_scale),
            }
    return q


def _conv_int8(x: jax.Array, qp: Params, stride: int) -> jax.Array:
    """Quantize input -> int8 conv (int32 accum) -> fused dequant+bias+leaky."""
    inv = 1.0 / qp["in_scale"]
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127
                  ).astype(jnp.int8)
    k = qp["w8"].shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x8, qp["w8"], window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * qp["eff_scale"] + qp["b"]
    return L.leaky_relu(y).astype(jnp.bfloat16)


def yolov3_forward_int8(qparams: Params, images: jax.Array
                        ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quantized inference forward — same contract as yolov3_forward_folded."""

    def bn_conv(scope, name, x, stride=1):
        return _conv_int8(x, qparams[scope][name], stride)

    x = images.astype(jnp.bfloat16)
    routes = _backbone_forward(
        lambda i, x, s: bn_conv("backbone", f"conv_{i}", x, s), x)
    return _head_forward(
        lambda i, x: bn_conv("head", f"conv_{i}", x),
        lambda i, x: L.conv_bias(x, qparams["head"][f"conv_{i}"],
                                 compute_dtype=jnp.bfloat16),
        routes)


def yolov3_forward_int8_split(qparams_split: Params, images: jax.Array):
    """Quantized forward emitting split head outputs (the serving fast path).

    qparams_split = fast_postprocess.split_serving_head(quantize_model(...))
    — the bf16 detection output convs carry plain {"w", "b"} exactly like a
    folded tree, so the same head-splitting transform applies. Returns the
    yolov3_forward_split contract, for postprocess_split.
    """
    from yolov3_tensorflow_tpu.ops.fast_postprocess import (
        apply_split_output_conv)

    def bn_conv(scope, name, x, stride=1):
        return _conv_int8(x, qparams_split[scope][name], stride)

    x = images.astype(jnp.bfloat16)
    routes = _backbone_forward(
        lambda i, x, s: bn_conv("backbone", f"conv_{i}", x, s), x)
    return list(_head_forward(
        lambda i, x: bn_conv("head", f"conv_{i}", x),
        lambda i, x: apply_split_output_conv(
            qparams_split["head"][f"conv_{i}"], x), routes))


def yolov3_forward_int8_packed(qparams_packed: Params, images: jax.Array):
    """Quantized forward emitting packed head outputs (the fastest serving
    path). qparams_packed = fast_postprocess.pack_serving_head(
    quantize_model(...)); returns the yolov3_forward_packed contract, for
    postprocess_packed."""
    from yolov3_tensorflow_tpu.ops.fast_postprocess import (
        apply_packed_output_conv)

    def bn_conv(scope, name, x, stride=1):
        return _conv_int8(x, qparams_packed[scope][name], stride)

    x = images.astype(jnp.bfloat16)
    routes = _backbone_forward(
        lambda i, x, s: bn_conv("backbone", f"conv_{i}", x, s), x)
    return list(_head_forward(
        lambda i, x: bn_conv("head", f"conv_{i}", x),
        lambda i, x: apply_packed_output_conv(
            qparams_packed["head"][f"conv_{i}"], x), routes))


def build_detector_int8(variables: Params, anchors, num_classes: int,
                        img_size: Tuple[int, int], *,
                        calibration_images: jax.Array,
                        max_out: int = 200, score_thresh: float = 0.3,
                        iou_thresh: float = 0.45, box_topk: int = 128):
    """Calibrate + quantize + build a jitted int8 detector.

    Same output contract as ops.postprocess.build_detector.
    """
    from yolov3_tensorflow_tpu.ops.fast_postprocess import postprocess_prefilter

    scales = calibrate_activation_scales(variables, calibration_images)
    qparams = quantize_model(variables, scales)
    anchors = np.asarray(anchors, np.float32)

    @jax.jit
    def detect(images: jax.Array):
        fmaps = yolov3_forward_int8(qparams, images)
        return postprocess_prefilter(
            fmaps, anchors, num_classes, img_size, max_out=max_out,
            box_topk=box_topk, pre_topk=box_topk, score_thresh=score_thresh,
            iou_thresh=iou_thresh)

    return detect, qparams
