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
from yolov3_tensorflow_tpu.models.layers import upsample_nearest_2x
from yolov3_tensorflow_tpu.models.yolov3 import (BACKBONE_PLAN,
                                                 _backbone_forward,
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
    hundred representative images for production use. The observation
    forward runs as ONE jitted program (op-by-op dispatch costs a compile +
    RPC per conv on remotely-attached devices).
    """
    folded = fold_batch_norm(variables, dtype=compute_dtype)

    @jax.jit
    def observe_all(images):
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
        return maxes

    maxes = jax.device_get(observe_all(images))   # one round trip
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


# ---------------------------------------------------------------------------
# int8-chained forward: activations stay int8 between layers
# ---------------------------------------------------------------------------
#
# The basic int8 path above nominally keeps activations bf16 between layers
# (write-bf16 + read-bf16 + write-int8 + read-int8 = 6 bytes/elem on paper).
# MEASURED OUTCOME on v5e: this variant is only ~1% faster end-to-end
# (38.7 vs 38.8 ms/batch-128 forward) — XLA already fuses the consumer's
# quantize pass into single-consumer producers' epilogues, so the bf16
# intermediate mostly never hits HBM in the basic path either. The chained
# form is kept because it (a) makes that guarantee explicit rather than
# fusion-dependent, (b) eliminates the FPN concat tensors entirely, and
# (c) is the substrate for any future int8 work. Design:
#
# - every activation tensor is int8 with a static (trace-time) scale; a conv
#   consuming (x8, s) uses eff = w_scale * s exactly — no requantization is
#   ever needed to "match" a consumer
# - scales come from the EXISTING calibration (per-conv input abs-max): a
#   conv's emission scale is its consumer conv's input scale
# - residual adds are fused into the closing 3x3 conv's epilogue in the
#   dequantized domain (models.yolov3._backbone_forward fused_residual) —
#   the post-add tensor is the next conv's calibrated input
# - the FPN concats are ELIMINATED: the post-concat 1x1 convs (head conv_8 /
#   conv_16) are split along input channels into one matmul per part, each
#   with its own input scale, summed in the epilogue (same math, and the
#   concat tensor is never materialized)
# - conv_5/conv_13/conv_21 emit bf16 for the (bf16) detection output convs
#
# Accuracy note: vs yolov3_forward_int8 this adds one int8 rounding per
# activation edge (the bf16 intermediate becomes int8). Validate with
# scripts/validate_quantized.py --chained on a trained checkpoint.


def _scale_of(act_scales: Params, scope: str, name: str) -> float:
    return max(float(act_scales[scope][name]), 1e-12) / 127.0


def _requant(y: jax.Array, s_out: float) -> jax.Array:
    return jnp.clip(jnp.round(y * (1.0 / s_out)), -127, 127).astype(jnp.int8)


def _conv_int8_chained(x8: jax.Array, s_in: float, qp: Params, stride: int,
                       *, shortcut=None, s_out=None) -> jax.Array:
    """int8 conv + fused dequant/bias/leaky[/residual-add][/requant] epilogue.

    x8 int8 at scale s_in; shortcut optional (t8, st) added after the
    activation (darknet residual order); s_out None -> emit bf16, else emit
    int8 at s_out."""
    k = qp["w8"].shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x8, qp["w8"], window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (qp["w_scale"] * s_in) + qp["b"]
    y = L.leaky_relu(y)
    if shortcut is not None:
        t8, st = shortcut
        y = y + t8.astype(jnp.float32) * st
    if s_out is None:
        return y.astype(jnp.bfloat16)
    return _requant(y, s_out)


def quantize_model_chained(variables: Params, act_scales: Params) -> Params:
    """Like quantize_model but stores per-channel `w_scale` unmultiplied
    (the chained forward folds the actual input scale in at trace time),
    plus the raw activation-scale table under "act"."""
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
            w = np.asarray(p["w"], np.float32)
            w_absmax = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12)
            w_scale = w_absmax / 127.0
            w8 = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
            q[scope][name] = {
                "w8": jnp.asarray(w8),
                "w_scale": jnp.asarray(w_scale, jnp.float32),
                "b": jnp.asarray(np.asarray(p["b"], np.float32)),
            }
    q["act"] = jax.tree_util.tree_map(float, act_scales)
    return q


def yolov3_forward_int8_chained(qc: Params, images: jax.Array,
                                head: str = "packed"):
    """int8-chained inference forward (see the design note above).

    qc = pack_serving_head(quantize_model_chained(...), C) for head="packed"
    (the three output convs carry {"packed": {w, b}} / plain {"w", "b"} for
    head="plain"). Returns the yolov3_forward_packed contract ("packed") or
    3 raw feature maps ("plain")."""
    from yolov3_tensorflow_tpu.ops.fast_postprocess import (
        apply_packed_output_conv)
    act = qc["act"]

    def s_in_b(idx):
        return _scale_of(act, "backbone", f"conv_{idx}")

    def s_in_h(idx):
        return _scale_of(act, "head", f"conv_{idx}")

    n_backbone = sum(1 for op in BACKBONE_PLAN if op[0] == "conv")

    def backbone_conv(idx, x8, stride, shortcut=None):
        s_out = s_in_b(idx + 1) if idx + 1 < n_backbone else s_in_h(0)
        return _conv_int8_chained(
            x8, s_in_b(idx), qc["backbone"][f"conv_{idx}"], stride,
            shortcut=None if shortcut is None else (shortcut, s_in_b(idx - 1)),
            s_out=s_out)

    x8 = _requant(images.astype(jnp.float32), s_in_b(0))
    routes = _backbone_forward(backbone_conv, x8, fused_residual=True)
    r1_8, r2_8, r3_8 = routes
    # Route tensors carry the scale of the backbone conv that consumes them
    # next (their emission scale): route_1 -> conv_26, route_2 -> conv_43
    # (plan: convs 0-25, route, 26-42, route, 43-51, route); route_3 is the
    # final tensor, emitted at head conv_0's input scale.
    s_r1 = s_in_b(26)
    s_r2 = s_in_b(43)

    def hconv(i, x8, s_in, s_out):
        return _conv_int8_chained(x8, s_in, qc["head"][f"conv_{i}"], 1,
                                  s_out=s_out)

    # ---- scale-32 branch ----
    x = r3_8
    s = s_in_h(0)
    for i in range(5):
        nxt = s_in_h(i + 1)
        x = hconv(i, x, s, nxt)
        s = nxt
    inter1, s_inter1 = x, s                       # inter1 at conv_5's scale
    xb = hconv(5, inter1, s_inter1, None)         # bf16 for the output conv
    fmap_1 = apply_packed_output_conv(qc["head"]["conv_6"], xb) \
        if head == "packed" else L.conv_bias(xb, qc["head"]["conv_6"],
                                             compute_dtype=jnp.bfloat16)

    # ---- scale-16 branch: upsample + SPLIT post-concat conv_8 ----
    a8 = hconv(7, inter1, s_inter1, s_in_h(8))
    a8 = upsample_nearest_2x(a8)                  # int8 passthrough
    x = _concat_split_conv(qc["head"]["conv_8"], a8, s_in_h(8), r2_8, s_r2,
                           s_out=s_in_h(9))
    s = s_in_h(9)
    for i in range(9, 13):
        nxt = s_in_h(i + 1)
        x = hconv(i, x, s, nxt)
        s = nxt
    inter2, s_inter2 = x, s
    xb = hconv(13, inter2, s_inter2, None)
    fmap_2 = apply_packed_output_conv(qc["head"]["conv_14"], xb) \
        if head == "packed" else L.conv_bias(xb, qc["head"]["conv_14"],
                                             compute_dtype=jnp.bfloat16)

    # ---- scale-8 branch ----
    a8 = hconv(15, inter2, s_inter2, s_in_h(16))
    a8 = upsample_nearest_2x(a8)
    x = _concat_split_conv(qc["head"]["conv_16"], a8, s_in_h(16), r1_8, s_r1,
                           s_out=s_in_h(17))
    s = s_in_h(17)
    for i in range(17, 21):
        nxt = s_in_h(i + 1)
        x = hconv(i, x, s, nxt)
        s = nxt
    xb = hconv(21, x, s, None)
    fmap_3 = apply_packed_output_conv(qc["head"]["conv_22"], xb) \
        if head == "packed" else L.conv_bias(xb, qc["head"]["conv_22"],
                                             compute_dtype=jnp.bfloat16)
    return [fmap_1, fmap_2, fmap_3]


def _concat_split_conv(qp: Params, a8: jax.Array, sa: float,
                       b8: jax.Array, sb: float, *, s_out: float
                       ) -> jax.Array:
    """conv(concat([a, b])) as two int8 matmuls with per-part input scales,
    summed in the epilogue — the concat tensor never exists. The 1x1 conv's
    weights are split along input channels; w_scale (per OUTPUT channel) is
    shared by both parts."""
    ca = a8.shape[-1]
    wa = qp["w8"][:, :, :ca, :]
    wb = qp["w8"][:, :, ca:, :]

    def part(x8, w8):
        return jax.lax.conv_general_dilated(
            x8, w8, window_strides=(1, 1), padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32).astype(jnp.float32)

    y = (part(a8, wa) * sa + part(b8, wb) * sb) * qp["w_scale"] + qp["b"]
    return _requant(L.leaky_relu(y), s_out)


# ---------------------------------------------------------------------------
# Hybrid stem-int8 forward: int8-chained early backbone, bf16 rest
# ---------------------------------------------------------------------------
#
# Round-2 profiling localized the bf16 serving forward's gap to roofline in
# the EARLY backbone: the 416^2/208^2/104^2 region is HBM-bandwidth-bound
# (conv_0 alone writes a 1.42 GB bf16 intermediate at batch 128; measured
# 6.0 ms vs a 1.2 ms FLOP roofline), while the 52^2-and-deeper layers run at
# 72-98% of the conv roofline on the MXU. A pure-bf16 Pallas fusion of the
# stem was analyzed and rejected (conv_0's K=27 contraction runs at ~5% MXU
# utilization in any im2col form — docs/BENCHMARKS.md). The TPU-native fix is
# precision, not fusion: execute conv_0..conv_{upto-1} int8-chained (int8
# activations in HBM halve the stem's bytes; int8 x int8 convs run at 2x MXU
# rate) and hand bf16 to the MXU-bound remainder. Box/class logits, decode
# and NMS are bit-identical to the bf16 path; the only approximation is one
# int8 rounding per early activation edge, bounded by the same calibration
# machinery as the full-int8 mode (detection identity on the trained gate
# checkpoint is validated by scripts/validate_quantized.py --stem8).


def stem_int8_safe_boundaries() -> Tuple[int, ...]:
    """Backbone conv indices at which the int8 region may hand off to bf16:
    a handoff is safe when the preceding conv is not inside an open residual
    block (the shortcut and its closing conv must share a domain)."""
    safe = []
    idx = 0
    depth = 0
    for op in BACKBONE_PLAN:
        if op[0] == "conv":
            if depth == 0:
                safe.append(idx)
            idx += 1
        elif op[0] == "res_begin":
            depth += 1
        elif op[0] == "res_end":
            depth -= 1
            safe.append(idx)
    return tuple(sorted(set(safe + [idx])))


def build_stem_int8_packed(variables: Params, act_scales: Params,
                           num_classes: int, *, upto: int = 9) -> Params:
    """Parameter tree for `yolov3_forward_stem_int8_packed`.

    upto=9 covers the 416^2/208^2/104^2 region (conv_0..conv_8), ending at
    the stride-2 transition into the 52^2 stage — every deeper layer is
    MXU-bound and stays bf16.
    """
    if upto not in stem_int8_safe_boundaries():
        raise ValueError(
            f"upto={upto} splits a residual block; safe boundaries: "
            f"{stem_int8_safe_boundaries()}")
    qc = quantize_model_chained(variables, act_scales)
    from yolov3_tensorflow_tpu.ops.fast_postprocess import pack_serving_head
    packed = pack_serving_head(fold_batch_norm(variables, dtype=jnp.bfloat16),
                               num_classes)
    stem = {f"conv_{i}": qc["backbone"][f"conv_{i}"] for i in range(upto)}
    return {"stem": stem, "act": qc["act"], "packed": packed,
            "upto": int(upto)}


def yolov3_forward_stem_int8_packed(hp: Params, images: jax.Array):
    """Packed serving forward, int8-chained conv_0..conv_{upto-1}, bf16 rest.

    hp = build_stem_int8_packed(...). Returns the yolov3_forward_packed
    contract (3 packed logit maps, strides 32/16/8).
    """
    from yolov3_tensorflow_tpu.models.layers import (conv_folded,
                                                     neck_split_folded)
    from yolov3_tensorflow_tpu.models.yolov3 import _head_forward
    from yolov3_tensorflow_tpu.ops.fast_postprocess import (
        apply_packed_output_conv)

    act, packed, upto = hp["act"], hp["packed"], hp["upto"]

    def s_in_b(idx):
        return _scale_of(act, "backbone", f"conv_{idx}")

    def backbone_conv(idx, x, stride, shortcut=None):
        if idx < upto:
            # emit int8 at the next conv's calibrated input scale; the
            # handoff conv emits bf16 for the folded region
            s_out = s_in_b(idx + 1) if idx + 1 < upto else None
            return _conv_int8_chained(
                x, s_in_b(idx), hp["stem"][f"conv_{idx}"], stride,
                shortcut=None if shortcut is None
                else (shortcut, s_in_b(idx - 1)),
                s_out=s_out)
        y = conv_folded(x, packed["backbone"][f"conv_{idx}"], stride=stride)
        if shortcut is not None:
            y = y + shortcut
        return y

    if upto > 0:
        x0 = _requant(images.astype(jnp.float32), s_in_b(0))
    else:
        x0 = images.astype(jnp.bfloat16)
    routes = _backbone_forward(backbone_conv, x0, fused_residual=True)
    return list(_head_forward(
        lambda i, x: conv_folded(x, packed["head"][f"conv_{i}"]),
        lambda i, x: apply_packed_output_conv(packed["head"][f"conv_{i}"], x),
        routes,
        neck_fn=lambda li, fi, inter, route: neck_split_folded(
            inter, route, packed["head"][f"conv_{li}"],
            packed["head"][f"conv_{fi}"])))


def build_detector_int8(variables: Params, anchors, num_classes: int,
                        img_size: Tuple[int, int], *,
                        calibration_images: jax.Array,
                        max_out: int = 200, score_thresh: float = 0.3,
                        iou_thresh: float = 0.45, box_topk: int = 128,
                        mode: str = "prefilter",
                        approx_topk: bool = False):
    """Calibrate + quantize + build a jitted int8 detector.

    Same output contract and mode semantics as
    ops.postprocess.build_detector; modes:
      "prefilter"  bf16-linked int8 forward + prefilter postprocess
      "packed"     packed serving head (fastest; bench configuration)
      "chained"    int8-chained forward (int8 activations end-to-end) +
                   packed postprocess
    """
    from yolov3_tensorflow_tpu.ops.fast_postprocess import (
        pack_serving_head, postprocess_packed, postprocess_prefilter)

    scales = calibrate_activation_scales(variables, calibration_images)
    anchors = np.asarray(anchors, np.float32)

    if mode in ("packed", "chained"):
        if mode == "chained":
            qparams = pack_serving_head(
                quantize_model_chained(variables, scales), num_classes)

            def forward(images):
                return yolov3_forward_int8_chained(qparams, images)
        else:
            qparams = pack_serving_head(quantize_model(variables, scales),
                                        num_classes)

            def forward(images):
                return yolov3_forward_int8_packed(qparams, images)

        @jax.jit
        def detect_packed(images: jax.Array):
            return postprocess_packed(
                forward(images), anchors, num_classes, img_size,
                max_out=max_out, box_topk=box_topk,
                score_thresh=score_thresh, iou_thresh=iou_thresh,
                approx_topk=approx_topk)

        return detect_packed, qparams

    if mode != "prefilter":
        raise ValueError(f"unsupported int8 detector mode: {mode!r}")
    qparams = quantize_model(variables, scales)

    @jax.jit
    def detect(images: jax.Array):
        fmaps = yolov3_forward_int8(qparams, images)
        return postprocess_prefilter(
            fmaps, anchors, num_classes, img_size, max_out=max_out,
            box_topk=box_topk, pre_topk=box_topk, score_thresh=score_thresh,
            iou_thresh=iou_thresh)

    return detect, qparams
