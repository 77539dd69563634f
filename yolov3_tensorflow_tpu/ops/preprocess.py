"""Device-resident inference preprocessing.

The reference letterboxes every frame with cv2 on the host and ships fp32
pixels through feed_dict (test_single_image.py:38-46, video_test.py:67-70).
For serving, this module moves the resize + pad + normalize onto the TPU:
the host transfers raw uint8 frames (4x less PCIe/link traffic than fp32)
and the device performs bilinear letterbox resize into the network input —
fully fused into the same XLA program as the detector.

Static-shape contract: the ORIGINAL frame size is fixed per compiled program
(natural for video streams and batched serving of same-size images).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def letterbox_params(src_hw: Tuple[int, int], dst_hw: Tuple[int, int]
                     ) -> Tuple[float, int, int, int, int]:
    """(resize_ratio, resized_h, resized_w, dh, dw) for a letterbox fit —
    the same geometry as data.augment.letterbox_resize (gray-128 padding,
    centered), so host- and device-preprocessed boxes invert identically."""
    sh, sw = src_hw
    dh_, dw_ = dst_hw
    ratio = min(dw_ / sw, dh_ / sh)
    rw, rh = int(ratio * sw), int(ratio * sh)
    pad_h = (dh_ - rh) // 2
    pad_w = (dw_ - rw) // 2
    return ratio, rh, rw, pad_h, pad_w


def device_letterbox(frames_u8: jax.Array, dst_hw: Tuple[int, int],
                     dtype=jnp.float32) -> jax.Array:
    """uint8 RGB frames [B, H, W, 3] -> letterboxed [B, dh, dw, 3] in [0, 1].

    Bilinear resize on device (jax.image.resize ~ cv2 INTER_LINEAR up to
    sampling-grid convention), gray-128 padding, /255 normalization.
    """
    b, sh, sw, _ = frames_u8.shape
    ratio, rh, rw, pad_h, pad_w = letterbox_params((sh, sw), dst_hw)
    dh_, dw_ = dst_hw

    x = frames_u8.astype(dtype)
    x = jax.image.resize(x, (b, rh, rw, 3), method="bilinear")
    x = jnp.clip(x, 0.0, 255.0)
    x = jnp.pad(x, ((0, 0), (pad_h, dh_ - rh - pad_h),
                    (pad_w, dw_ - rw - pad_w), (0, 0)),
                constant_values=128.0)
    return x / 255.0


def build_streaming_detector(variables, anchors, num_classes: int,
                             src_hw: Tuple[int, int],
                             dst_hw: Tuple[int, int] = (416, 416), *,
                             max_out: int = 200, score_thresh: float = 0.3,
                             iou_thresh: float = 0.45,
                             compute_dtype=jnp.bfloat16,
                             bgr_input: bool = False,
                             mode: str = "prefilter"):
    """End-to-end streaming detector: raw uint8 frames in, detections out.

    One jitted program: device letterbox -> BN-folded forward -> decode ->
    Pallas NMS. Returns (detect_fn, inverse_transform) where
    inverse_transform maps output boxes back to original-frame pixels
    (the (boxes - pad) / ratio math of test_single_image.py:65-70).
    mode: "prefilter" (exact at demo thresholds) or "packed" (the fastest
    serving head — see ops.fast_postprocess).
    """
    from yolov3_tensorflow_tpu.models.yolov3 import (fold_batch_norm,
                                                     yolov3_forward_folded)
    from yolov3_tensorflow_tpu.ops.fast_postprocess import (
        pack_serving_head, postprocess_packed, postprocess_prefilter,
        yolov3_forward_packed)

    folded = fold_batch_norm(variables, dtype=compute_dtype)
    if mode == "packed":
        folded = pack_serving_head(folded, num_classes)
    elif mode != "prefilter":
        raise ValueError(f"unsupported streaming mode: {mode!r}")
    ratio, _, _, pad_h, pad_w = letterbox_params(src_hw, dst_hw)

    @jax.jit
    def detect(frames_u8: jax.Array):
        if bgr_input:  # OpenCV frames: channel flip on device, not host
            frames_u8 = frames_u8[..., ::-1]
        images = device_letterbox(frames_u8, dst_hw)
        if mode == "packed":
            outs = yolov3_forward_packed(folded, images,
                                         compute_dtype=compute_dtype)
            # approx_topk=False: both streaming modes use EXACT candidate
            # top-k so switching mode never changes selection semantics
            # (postprocess_packed alone defaults to approx_max_k)
            return postprocess_packed(
                outs, anchors, num_classes, dst_hw, max_out=max_out,
                box_topk=128, score_thresh=score_thresh,
                iou_thresh=iou_thresh, approx_topk=False)
        fmaps = yolov3_forward_folded(folded, images,
                                      compute_dtype=compute_dtype)
        return postprocess_prefilter(
            fmaps, anchors, num_classes, dst_hw, max_out=max_out,
            box_topk=128, pre_topk=128, score_thresh=score_thresh,
            iou_thresh=iou_thresh)

    def invert(boxes):
        import numpy as np
        boxes = np.asarray(boxes).copy()
        boxes[..., [0, 2]] = (boxes[..., [0, 2]] - pad_w) / ratio
        boxes[..., [1, 3]] = (boxes[..., [1, 3]] - pad_h) / ratio
        return boxes

    return detect, invert
