"""Box geometry primitives (IoU, format conversion).

Covers the IoU variants used across the reference:
- broadcast center-format IoU used by the loss ignore mask
  (/root/reference/model.py:307-345 `box_iou`)
- corner-format IoU used by batch eval (/root/reference/utils/eval_utils.py:13
  `calc_iou`)
All fully vectorized, fp32, usable under jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    """(cx, cy, w, h) -> (x0, y0, x1, y1) on the last axis."""
    center, size = boxes[..., 0:2], boxes[..., 2:4]
    half = size * 0.5
    return jnp.concatenate([center - half, center + half], axis=-1)


def xyxy_to_xywh(boxes: jax.Array) -> jax.Array:
    """(x0, y0, x1, y1) -> (cx, cy, w, h) on the last axis."""
    mins, maxs = boxes[..., 0:2], boxes[..., 2:4]
    return jnp.concatenate([(mins + maxs) * 0.5, maxs - mins], axis=-1)


def iou_xywh(pred_boxes: jax.Array, true_boxes: jax.Array,
             eps: float = 1e-10) -> jax.Array:
    """Broadcast IoU between center-format boxes.

    pred_boxes: [..., 4] (cx, cy, w, h); true_boxes: [V, 4].
    Returns [..., V]. Same math as reference model.py:307-345 including the
    1e-10 denominator epsilon.
    """
    pred_xy = pred_boxes[..., None, 0:2]
    pred_wh = pred_boxes[..., None, 2:4]
    true_xy = true_boxes[:, 0:2]
    true_wh = true_boxes[:, 2:4]

    mins = jnp.maximum(pred_xy - pred_wh * 0.5, true_xy - true_wh * 0.5)
    maxs = jnp.minimum(pred_xy + pred_wh * 0.5, true_xy + true_wh * 0.5)
    wh = jnp.maximum(maxs - mins, 0.0)

    inter = wh[..., 0] * wh[..., 1]
    pred_area = pred_wh[..., 0] * pred_wh[..., 1]
    true_area = true_wh[:, 0] * true_wh[:, 1]
    return inter / (pred_area + true_area - inter + eps)


def giou_xywh(boxes_a: jax.Array, boxes_b: jax.Array,
              eps: float = 1e-10) -> jax.Array:
    """Elementwise Generalized IoU between center-format boxes.

    boxes_a/boxes_b: [..., 4] (cx, cy, w, h) -> [...] in [-1, 1].
    GIoU = IoU - (enclosing_area - union) / enclosing_area
    (Rezatofighi et al. 2019 — the optional modern box loss; the reference
    only has the grid-space MSE terms, model.py:248-277).
    """
    a_min = boxes_a[..., 0:2] - boxes_a[..., 2:4] * 0.5
    a_max = boxes_a[..., 0:2] + boxes_a[..., 2:4] * 0.5
    b_min = boxes_b[..., 0:2] - boxes_b[..., 2:4] * 0.5
    b_max = boxes_b[..., 0:2] + boxes_b[..., 2:4] * 0.5

    inter_wh = jnp.maximum(jnp.minimum(a_max, b_max)
                           - jnp.maximum(a_min, b_min), 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    area_a = boxes_a[..., 2] * boxes_a[..., 3]
    area_b = boxes_b[..., 2] * boxes_b[..., 3]
    union = area_a + area_b - inter
    iou = inter / (union + eps)

    enc_wh = jnp.maximum(jnp.maximum(a_max, b_max)
                         - jnp.minimum(a_min, b_min), 0.0)
    enc = enc_wh[..., 0] * enc_wh[..., 1]
    return iou - (enc - union) / (enc + eps)


def iou_xyxy(boxes_a: jax.Array, boxes_b: jax.Array,
             eps: float = 1e-10) -> jax.Array:
    """Pairwise IoU between corner-format boxes: [N, 4] x [M, 4] -> [N, M].

    Same math as reference eval_utils.py:13-45 `calc_iou` (0-offset
    convention, 1e-10 epsilon).
    """
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    mins = jnp.maximum(a[..., 0:2], b[..., 0:2])
    maxs = jnp.minimum(a[..., 2:4], b[..., 2:4])
    wh = jnp.maximum(maxs - mins, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter + eps)
