"""Fixed-shape, mask-based per-class NMS for TPU.

TPU-native equivalent of the reference's GPU NMS
(/root/reference/utils/nms_utils.py:8-48 `gpu_nms`): score threshold, per-class
greedy non-max suppression with a per-class output cap, all classes
concatenated. The reference emits ragged outputs from a C++ op; TPUs need
static shapes, so every stage here is a fixed-capacity top-k + validity mask:

  1. per class: top `pre_topk` candidates by score (score < thresh -> invalid)
  2. exact greedy suppression over the sorted candidates via a precomputed
     IoU matrix and a `fori_loop` (sequential in K only, vectorized over
     batch x class by vmap)
  3. per class: keep the top `max_out` surviving candidates
  4. flatten classes -> [C * max_out] slots with a validity mask

`suppression_mask` is also the XLA reference implementation that the Pallas
kernel (ops/nms_pallas.py) is tested against; `py_nms` is the trivially
correct host oracle (the reference ships its own numpy NMS as nms_utils.py:51).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.ops.boxes import iou_xyxy


def suppression_mask(boxes: jax.Array, valid: jax.Array,
                     iou_thresh: float) -> jax.Array:
    """Exact greedy NMS keep-mask over score-descending sorted boxes.

    boxes: [K, 4] xyxy sorted by score descending; valid: [K] bool.
    Returns keep: [K] bool. A box is kept iff it is valid and not overlapped
    (IoU > thresh) by any higher-ranked *kept* box — identical semantics to
    tf.image.non_max_suppression (nms_utils.py:36).
    """
    k = boxes.shape[0]
    iou = iou_xyxy(boxes, boxes)                      # [K, K]
    ranks = jnp.arange(k)

    # scan over precomputed IoU rows (each step consumes one row as a scanned
    # input) instead of a fori_loop with dynamic row indexing — the
    # dynamic-slice-in-loop form compiles pathologically slowly on TPU when
    # vmapped over many (image, class) pairs.
    def step(keep, row):
        i, iou_row = row
        # if candidate i survived, kill every lower-ranked overlapping box
        suppress = keep[i] & (iou_row > iou_thresh) & (ranks > i)
        return keep & ~suppress, None

    keep, _ = jax.lax.scan(step, valid, (ranks, iou))
    return keep


def _single_class_nms(boxes: jax.Array, scores: jax.Array, *,
                      pre_topk: int, max_out: int,
                      score_thresh: float, iou_thresh: float
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """NMS for one class of one image.

    boxes: [A, 4]; scores: [A]. Returns (boxes [max_out, 4],
    scores [max_out], valid [max_out]).
    """
    k = min(pre_topk, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = jnp.take(boxes, top_idx, axis=0)
    valid = top_scores >= score_thresh                # tf.greater_equal parity

    keep = suppression_mask(top_boxes, valid, iou_thresh)

    # compact surviving candidates into max_out slots (score-descending)
    out_scores = jnp.where(keep, top_scores, -jnp.inf)
    m = min(max_out, k)
    sel_scores, sel = jax.lax.top_k(out_scores, m)
    sel_boxes = jnp.take(top_boxes, sel, axis=0)
    sel_valid = jnp.isfinite(sel_scores)
    sel_scores = jnp.where(sel_valid, sel_scores, 0.0)
    if m < max_out:
        pad = max_out - m
        sel_boxes = jnp.pad(sel_boxes, ((0, pad), (0, 0)))
        sel_scores = jnp.pad(sel_scores, (0, pad))
        sel_valid = jnp.pad(sel_valid, (0, pad))
    return sel_boxes, sel_scores, sel_valid


def per_class_nms(boxes: jax.Array, scores: jax.Array, *,
                  max_out: int = 50, pre_topk: int = 256,
                  score_thresh: float = 0.5, iou_thresh: float = 0.5
                  ) -> Dict[str, jax.Array]:
    """Per-class NMS for a single image — `gpu_nms` parity, fixed shapes.

    boxes: [A, 4] xyxy; scores: [A, C] (= conf * prob).
    Returns dict with "boxes" [C*max_out, 4], "scores"/"labels"/"valid"
    [C*max_out]; slots of class c occupy rows [c*max_out, (c+1)*max_out).
    """
    num_classes = scores.shape[1]
    fn = functools.partial(_single_class_nms, pre_topk=pre_topk,
                           max_out=max_out, score_thresh=score_thresh,
                           iou_thresh=iou_thresh)
    # vmap over the class axis: scores.T is [C, A]
    cls_boxes, cls_scores, cls_valid = jax.vmap(fn, in_axes=(None, 0))(
        boxes, scores.T)
    labels = jnp.broadcast_to(
        jnp.arange(num_classes, dtype=jnp.int32)[:, None],
        (num_classes, max_out))
    return {
        "boxes": cls_boxes.reshape(-1, 4),
        "scores": cls_scores.reshape(-1),
        "labels": labels.reshape(-1),
        "valid": cls_valid.reshape(-1),
    }


def batched_nms(boxes: jax.Array, scores: jax.Array, *,
                max_out: int = 50, pre_topk: int = 256,
                score_thresh: float = 0.5, iou_thresh: float = 0.5
                ) -> Dict[str, jax.Array]:
    """Batch version: boxes [B, A, 4], scores [B, A, C] ->
    dict of [B, C*max_out, ...] arrays."""
    fn = functools.partial(per_class_nms, max_out=max_out, pre_topk=pre_topk,
                           score_thresh=score_thresh, iou_thresh=iou_thresh)
    return jax.vmap(fn)(boxes, scores)


def batched_nms_auto(boxes: jax.Array, scores: jax.Array, *,
                     max_out: int = 50, pre_topk: int = 256,
                     score_thresh: float = 0.5, iou_thresh: float = 0.5
                     ) -> Dict[str, jax.Array]:
    """Backend-dispatching batched per-class NMS.

    On TPU the Pallas suppression kernel is used (the XLA fallback's vmapped
    sequential loop compiles pathologically slowly there at full detector
    shapes); elsewhere the pure-XLA path runs.
    """
    kwargs = dict(max_out=max_out, pre_topk=pre_topk,
                  score_thresh=score_thresh, iou_thresh=iou_thresh)
    if jax.default_backend() == "tpu":
        from yolov3_tensorflow_tpu.ops.nms_pallas import batched_nms_pallas
        return batched_nms_pallas(boxes, scores, **kwargs)
    return batched_nms(boxes, scores, **kwargs)


# ---------------------------------------------------------------------------
# Host oracle
# ---------------------------------------------------------------------------

def py_nms(boxes: np.ndarray, scores: np.ndarray, max_boxes: int = 50,
           iou_thresh: float = 0.5, offset: float = 0.0) -> list:
    """Trivially correct numpy greedy NMS (test oracle).

    Same role as reference nms_utils.py:51 `py_nms`. `offset=0` matches the
    production tf.image.non_max_suppression convention; the reference's own
    numpy version uses the legacy +1 pixel convention, selectable here via
    `offset=1.0`.
    """
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0] + offset) * (boxes[:, 3] - boxes[:, 1] + offset)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        if len(keep) >= max_boxes:
            break
        xx0 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy0 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx1 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy1 = np.minimum(boxes[i, 3], boxes[:, 3])
        w = np.maximum(0.0, xx1 - xx0 + offset)
        h = np.maximum(0.0, yy1 - yy0 + offset)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > iou_thresh
        suppressed[i] = True  # already kept; never revisit
    return keep


def cpu_nms(boxes: np.ndarray, scores: np.ndarray, num_classes: int,
            max_boxes: int = 50, score_thresh: float = 0.5,
            iou_thresh: float = 0.5):
    """Host per-class NMS (reference nms_utils.py:91 `cpu_nms` parity).

    boxes: [A, 4] or [1, A, 4]; scores: [A, C] or [1, A, C].
    Returns (boxes [N, 4], scores [N], labels [N]) or (None, None, None).
    """
    boxes = boxes.reshape(-1, 4)
    scores = scores.reshape(-1, num_classes)
    picked_b, picked_s, picked_l = [], [], []
    for c in range(num_classes):
        idx = np.where(scores[:, c] >= score_thresh)[0]
        if idx.size == 0:
            continue
        fb, fs = boxes[idx], scores[idx, c]
        keep = py_nms(fb, fs, max_boxes=max_boxes, iou_thresh=iou_thresh)
        picked_b.append(fb[keep])
        picked_s.append(fs[keep])
        picked_l.append(np.full(len(keep), c, np.int32))
    if not picked_b:
        return None, None, None
    return (np.concatenate(picked_b), np.concatenate(picked_s),
            np.concatenate(picked_l))
