"""High-throughput fused postprocess: prefilter -> sparse decode -> NMS.

The exact path (ops.postprocess) decodes and scores all A anchors for all C
classes and runs a per-class top_k over [B, C, A] — semantically identical to
the reference gpu_nms but dominated by 80 top-k passes over 10647 anchors and
by materializing the [B, A, C] fp32 score tensor.

This path restructures the computation around a box-level prefilter, the way
production TPU detectors do:

  1. objectness scores for all anchors: sigmoid(conf) * sigmoid(max_c logit)
     — max over class *logits* (sigmoid is monotone), so the [B, A, C] class
     probabilities are never materialized
  2. ONE top_k of A per image selects K_box candidate anchors
  3. boxes are decoded only for candidates, using precomputed flat per-anchor
     tables (grid offset, anchor size, stride) gathered by candidate index
  4. per-class top_k + Pallas greedy NMS over the K_box-candidate set

Exactness: identical to the exact path whenever every box that passes the
score threshold in ANY class ranks in the top K_box by its best-class score —
guaranteed when #above-threshold boxes <= K_box (always true at demo
thresholds; use the exact path for mAP evaluation at score_thresh=0.01).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _decode_tables(img_h: int, img_w: int, anchors_key: Tuple[float, ...]
                   ) -> Tuple[np.ndarray, ...]:
    """Flat per-anchor decode constants in predict_boxes order
    (scale 32 -> 16 -> 8; row-major y, x, anchor within each scale)."""
    anchors = np.asarray(anchors_key, np.float32).reshape(9, 2)
    groups = [anchors[6:9], anchors[3:6], anchors[0:3]]
    xs, ys, rws, rhs, aws, ahs = [], [], [], [], [], []
    for stride, group in zip((32, 16, 8), groups):
        hg, wg = img_h // stride, img_w // stride
        yy, xx = np.mgrid[0:hg, 0:wg]
        for arr, val in ((xs, np.repeat(xx[..., None], 3, -1)),
                         (ys, np.repeat(yy[..., None], 3, -1))):
            arr.append(val.reshape(-1).astype(np.float32))
        n = hg * wg * 3
        rws.append(np.full(n, img_w / wg, np.float32))
        rhs.append(np.full(n, img_h / hg, np.float32))
        aws.append(np.tile(group[:, 0], hg * wg).astype(np.float32))
        ahs.append(np.tile(group[:, 1], hg * wg).astype(np.float32))
    return tuple(np.concatenate(v) for v in (xs, ys, rws, rhs, aws, ahs))


def flatten_feature_maps(feature_maps: Sequence[jax.Array], num_classes: int
                         ) -> jax.Array:
    """[N,Hg,Wg,3*(5+C)] x3 -> [N, A, 5+C] raw rows, predict_boxes order."""
    rows = []
    for fmap in feature_maps:
        n = fmap.shape[0]
        rows.append(fmap.reshape(n, -1, 5 + num_classes))
    return jnp.concatenate(rows, axis=1)


# ---------------------------------------------------------------------------
# Lane-aligned serving head
# ---------------------------------------------------------------------------
#
# The natural head layout packs each anchor's (5+C) block back-to-back
# (channels 3*(5+C) = 255 for COCO), so downstream reshapes/slices of the
# per-anchor rows cross TPU lane boundaries. This utility instead pads each
# anchor's block to the 128-lane width inside the OUTPUT CONV WEIGHTS so that
# [B,Hg,Wg,384] -> [B,HgWg*3,128] is a layout-exact reshape (+~3% model
# FLOPs). Measured outcome on v5e: bit-identical outputs but NO end-to-end
# speedup in the fused detector (XLA's fusion already absorbs the relayouts),
# so it is OFF by default — kept as a tested building block for future
# postprocess kernels that consume aligned rows directly.

_LANE = 128


def head_row_width(num_classes: int) -> int:
    """Per-anchor channel block, padded to the lane width."""
    need = 5 + num_classes
    return ((need + _LANE - 1) // _LANE) * _LANE


def pad_output_convs_aligned(head_params: dict, num_classes: int) -> dict:
    """Pad the 3 detection convs' weights/bias from 3*(5+C) to 3*row_width
    output channels (anchor blocks lane-aligned, zeros elsewhere)."""
    row = head_row_width(num_classes)
    need = 5 + num_classes
    out = dict(head_params)
    for name in ("conv_6", "conv_14", "conv_22"):
        p = head_params[name]
        w = np.asarray(p["w"], np.float32)            # [1,1,cin,3*need]
        b = np.asarray(p["b"], np.float32)
        cin = w.shape[2]
        w2 = np.zeros((1, 1, cin, 3 * row), np.float32)
        b2 = np.zeros((3 * row,), np.float32)
        for a in range(3):
            w2[..., a * row:a * row + need] = w[..., a * need:(a + 1) * need]
            b2[a * row:a * row + need] = b[a * need:(a + 1) * need]
        out[name] = {"w": jnp.asarray(w2).astype(jnp.asarray(p["w"]).dtype),
                     "b": jnp.asarray(b2)}
    return out


def flatten_feature_maps_aligned(feature_maps: Sequence[jax.Array],
                                 num_classes: int) -> jax.Array:
    """Aligned-head fmaps [N,Hg,Wg,3*row] x3 -> [N, A, row] (zero-cost
    reshapes; row = head_row_width)."""
    row = head_row_width(num_classes)
    parts = []
    for fmap in feature_maps:
        n = fmap.shape[0]
        parts.append(fmap.reshape(n, -1, row))
    return jnp.concatenate(parts, axis=1)


def postprocess_prefilter(feature_maps: Sequence[jax.Array],
                          anchors: np.ndarray, num_classes: int,
                          img_size: Tuple[int, int], *,
                          max_out: int = 50, box_topk: int = 256,
                          pre_topk: int = 128, score_thresh: float = 0.3,
                          iou_thresh: float = 0.45,
                          use_pallas: Optional[bool] = None,
                          aligned_head: bool = False,
                          approx_topk: bool = False
                          ) -> Dict[str, jax.Array]:
    """Fast batched detection from raw feature maps.

    Returns the same contract as ops.postprocess: dict of [B, C*max_out, ...]
    ("boxes" xyxy input pixels, "scores", "labels", "valid").

    aligned_head=True expects feature maps produced with lane-aligned output
    convs (pad_output_convs_aligned) — removes the relayout copies that
    otherwise dominate this stage.

    approx_topk=True selects candidates with lax.approx_max_k (recall
    target 0.95) instead of exact top_k — ~3-4% end-to-end throughput on
    v5e (XLA's exact top_k is the single most expensive postprocess op per
    profiler trace). Accuracy measured on the trained overfit-gate
    checkpoint: 108/108 detections identical to exact top-k at serving
    thresholds (scripts/validate_quantized.py, docs/BENCHMARKS.md);
    intended for the serving path.
    """
    img_h, img_w = int(img_size[0]), int(img_size[1])
    anchors = np.asarray(anchors, np.float32)
    if aligned_head:
        raw = flatten_feature_maps_aligned(feature_maps, num_classes)
    else:
        raw = flatten_feature_maps(feature_maps, num_classes)  # [B,A,5+C]
    b, a = raw.shape[0], raw.shape[1]
    k_box = min(box_topk, a)

    # 1. objectness prefilter on logits (no [B, A, C] materialization)
    conf_logit = raw[..., 4].astype(jnp.float32)             # [B, A]
    best_cls_logit = jnp.max(raw[..., 5:5 + num_classes],
                             axis=-1).astype(jnp.float32)
    obj_score = jax.nn.sigmoid(conf_logit) * jax.nn.sigmoid(best_cls_logit)

    # 2. one top_k per image
    if approx_topk:
        _, cand_idx = jax.lax.approx_max_k(obj_score, k_box,
                                           recall_target=0.95)
    else:
        _, cand_idx = jax.lax.top_k(obj_score, k_box)        # [B, K]
    cand_rows = jnp.take_along_axis(
        raw.astype(jnp.float32), cand_idx[..., None], axis=1)  # [B, K, 5+C]

    # 3. sparse decode via flat tables
    tx, ty, rw, rh, aw, ah = (jnp.asarray(t) for t in _decode_tables(
        img_h, img_w, tuple(anchors.reshape(-1).tolist())))
    gx = jnp.take(tx, cand_idx)
    gy = jnp.take(ty, cand_idx)
    grw = jnp.take(rw, cand_idx)
    grh = jnp.take(rh, cand_idx)
    gaw = jnp.take(aw, cand_idx)
    gah = jnp.take(ah, cand_idx)

    cx = (jax.nn.sigmoid(cand_rows[..., 0]) + gx) * grw
    cy = (jax.nn.sigmoid(cand_rows[..., 1]) + gy) * grh
    w = jnp.exp(cand_rows[..., 2]) * gaw
    h = jnp.exp(cand_rows[..., 3]) * gah
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                      axis=-1)                               # [B, K, 4]

    conf = jax.nn.sigmoid(cand_rows[..., 4:5])
    probs = jax.nn.sigmoid(cand_rows[..., 5:5 + num_classes])
    scores = conf * probs                                    # [B, K, C]

    # 4. per-class NMS over the candidate set
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # shared-candidate kernel: all classes score the same K boxes, so no
        # per-class top_k/gather staging is needed at all
        from yolov3_tensorflow_tpu.ops.nms_pallas import (
            batched_nms_shared_pallas)
        return batched_nms_shared_pallas(
            boxes, scores, max_out=max_out, score_thresh=score_thresh,
            iou_thresh=iou_thresh)
    from yolov3_tensorflow_tpu.ops.nms import batched_nms
    return batched_nms(boxes, scores, max_out=max_out,
                       pre_topk=min(pre_topk, k_box),
                       score_thresh=score_thresh, iou_thresh=iou_thresh)
