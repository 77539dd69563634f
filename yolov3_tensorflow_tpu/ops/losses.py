"""YOLOv3 training loss, fully vectorized for TPU.

Bit-parity rebuild of reference model.py `loss_layer`/`compute_loss`
(model.py:192-304, 348-365) with one structural change: the reference computes
the ignore mask with a per-image tf.while_loop + ragged boolean_mask
(model.py:220-239) because the ground-truth count V varies per image. Here the
ragged gather is replaced by a fixed-capacity `top_k` over the dense y_true
objectness grid, so the whole loss is one static-shape XLA program (SURVEY.md
§3.2). Semantics are identical: padded GT slots have zero area, giving IoU 0,
and an image with no GT gets best_iou 0 < 0.5 -> ignored, matching TF's
reduce_max over an empty axis (-inf) comparison.

Loss terms (per scale, summed over 3 scales, each term /batch_size):
- xy: squared error of in-cell sigmoid offsets, weighted by object mask,
  box_loss_scale = 2 - w*h/img_area (model.py:267), and mixup weight
- wh: squared error in log-anchor space with the ==0 -> 1 substitution and
  [1e-9, 1e9] clip (model.py:256-262)
- conf: BCE over all cells; negatives multiplied by the ignore mask; optional
  focal modulation alpha=1, gamma=2 (model.py:286-291)
- class: BCE on object cells, optional label smoothing delta=0.01
  (model.py:296-298)
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.models.decode import decode_feature_map
from yolov3_tensorflow_tpu.ops.boxes import iou_xywh


def sigmoid_bce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically-stable sigmoid cross-entropy
    (tf.nn.sigmoid_cross_entropy_with_logits parity):
    max(x, 0) - x*z + log(1 + exp(-|x|))."""
    return (jnp.maximum(logits, 0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _ignore_mask(pred_boxes: jax.Array, y_true: jax.Array,
                 max_gt: int = 64) -> jax.Array:
    """Cells whose best IoU against any GT box of the same image is < 0.5.

    pred_boxes: [N, H, W, 3, 4] decoded (cx, cy, w, h) in input pixels.
    y_true: [N, H, W, 3, 6+C] dense label grid of the same scale.
    Returns [N, H, W, 3, 1] float mask (reference model.py:220-239).
    """
    n, h, w, a = y_true.shape[:4]
    obj = y_true[..., 4].reshape(n, -1)                # [N, HWA]
    gt_boxes = y_true[..., 0:4].reshape(n, -1, 4)      # [N, HWA, 4]

    k = min(max_gt, obj.shape[1])
    # top_k over the {0,1} objectness grid picks the occupied cells first;
    # padding slots come back with obj=0 and (0,0,0,0) boxes -> IoU 0.
    top_obj, top_idx = jax.lax.top_k(obj, k)
    top_boxes = jnp.take_along_axis(gt_boxes, top_idx[..., None], axis=1)
    top_boxes = top_boxes * top_obj[..., None]         # zero out padding

    iou = jax.vmap(iou_xywh)(pred_boxes, top_boxes)    # [N, H, W, 3, k]
    best_iou = jnp.max(iou, axis=-1)
    return (best_iou < 0.5).astype(jnp.float32)[..., None]


def loss_scale(feature_map: jax.Array, y_true: jax.Array,
               anchors: jax.Array, num_classes: int,
               img_size: Tuple[int, int], *,
               use_label_smooth: bool = False, use_focal_loss: bool = False,
               max_gt: int = 64, box_loss: str = "reference"
               ) -> Tuple[jax.Array, ...]:
    """Loss for one scale; reference model.py `loss_layer` (model.py:192-304).

    box_loss: "reference" (grid-space xy/wh MSE, exact parity) or "giou"
    (1 - GIoU on decoded boxes; reported under the "xy" term, "wh"=0).

    feature_map: [N, Hg, Wg, 3*(5+C)] raw conv output (fp32).
    y_true: [N, Hg, Wg, 3, 6+C]; channels 0:4 = (cx, cy, w, h) in input
    pixels, 4 = objectness, 5:5+C = one-hot class, last = mixup weight.
    Returns (xy_loss, wh_loss, conf_loss, class_loss), each a scalar already
    divided by batch size.
    """
    img_h, img_w = img_size
    n_f = jnp.asarray(feature_map.shape[0], jnp.float32)
    hg, wg = feature_map.shape[1], feature_map.shape[2]
    ratio_w = float(img_w) / wg
    ratio_h = float(img_h) / hg
    anchors = jnp.asarray(anchors, jnp.float32)

    xy_offset, pred_boxes, conf_logits, prob_logits = decode_feature_map(
        feature_map, anchors, num_classes, img_size)

    y_true = y_true.astype(jnp.float32)
    object_mask = y_true[..., 4:5]
    ignore_mask = _ignore_mask(pred_boxes, y_true, max_gt=max_gt)

    # in-cell offsets, range 0..1 (model.py:248-249)
    wh_ratio = jnp.asarray([ratio_w, ratio_h], jnp.float32)
    true_xy = y_true[..., 0:2] / wh_ratio - xy_offset
    pred_xy = pred_boxes[..., 0:2] / wh_ratio - xy_offset

    # log-space wh with the ==0 -> 1 substitution (model.py:254-262).
    # Predicted side: the reference re-logs the exp-decoded size,
    # log(clip(exp(t_wh)*a/a, 1e-9, 1e9)); algebraically that is exactly
    # clip(t_wh, log 1e-9, log 1e9), so compute it straight from the raw
    # logits. Going through exp first is not just redundant — once any wh
    # logit exceeds 88.7, exp overflows to inf, the clip saves the FORWARD
    # value (log 1e9) but its VJP is clip'(inf)=0 times exp'(t)=inf = NaN,
    # which silently NaNs the whole gradient one step before the loss shows
    # it (observed as the r4 reference-recipe gate abort at step 333: loss
    # finite at 332, params NaN at 333 — same failure mode the reference's
    # own NaN abort, train.py:163-166, papers over).
    true_tw_th = y_true[..., 2:4] / anchors
    true_tw_th = jnp.where(true_tw_th == 0.0, 1.0, true_tw_th)
    true_tw_th = jnp.log(jnp.clip(true_tw_th, 1e-9, 1e9))
    raw_wh = feature_map.reshape(
        *y_true.shape[:4], 5 + num_classes)[..., 2:4].astype(jnp.float32)
    log_bound = float(np.log(1e9))
    pred_tw_th = jnp.clip(raw_wh, -log_bound, log_bound)

    # smaller boxes get bigger weight (model.py:267)
    box_loss_scale = 2.0 - (y_true[..., 2:3] / float(img_w)) * (
        y_true[..., 3:4] / float(img_h))

    mix_w = y_true[..., -1:]

    if box_loss == "giou":
        # modern alternative to the reference's grid-space MSE terms:
        # 1 - GIoU on the decoded absolute boxes, same masking/weights
        from yolov3_tensorflow_tpu.ops.boxes import giou_xywh
        giou = giou_xywh(pred_boxes, y_true[..., 0:4])[..., None]
        xy_loss = jnp.sum((1.0 - giou) * object_mask
                          * box_loss_scale * mix_w) / n_f
        wh_loss = jnp.float32(0.0)
    else:
        xy_loss = jnp.sum(jnp.square(true_xy - pred_xy) * object_mask
                          * box_loss_scale * mix_w) / n_f
        wh_loss = jnp.sum(jnp.square(true_tw_th - pred_tw_th) * object_mask
                          * box_loss_scale * mix_w) / n_f

    conf_pos = object_mask * sigmoid_bce(conf_logits, object_mask)
    conf_neg = (1.0 - object_mask) * ignore_mask * sigmoid_bce(
        conf_logits, object_mask)
    conf_loss = conf_pos + conf_neg
    if use_focal_loss:
        alpha, gamma = 1.0, 2.0
        focal = alpha * jnp.power(
            jnp.abs(object_mask - jax.nn.sigmoid(conf_logits)), gamma)
        conf_loss = conf_loss * focal
    conf_loss = jnp.sum(conf_loss * mix_w) / n_f

    if use_label_smooth:
        delta = 0.01
        label_target = (1 - delta) * y_true[..., 5:-1] + delta / num_classes
    else:
        label_target = y_true[..., 5:-1]
    class_loss = jnp.sum(object_mask * sigmoid_bce(prob_logits, label_target)
                         * mix_w) / n_f

    return xy_loss, wh_loss, conf_loss, class_loss


def compute_loss(feature_maps: Sequence[jax.Array],
                 y_true: Sequence[jax.Array], anchors: np.ndarray,
                 num_classes: int, img_size: Tuple[int, int], *,
                 use_label_smooth: bool = False, use_focal_loss: bool = False,
                 max_gt: int = 64, box_loss: str = "reference"
                 ) -> Dict[str, jax.Array]:
    """Total loss over 3 scales (reference model.py:348-365).

    Returns {"total", "xy", "wh", "conf", "class"} scalars.
    """
    anchors = np.asarray(anchors, np.float32)
    groups = [anchors[6:9], anchors[3:6], anchors[0:3]]
    terms = [jnp.float32(0)] * 4
    for fmap, yt, group in zip(feature_maps, y_true, groups):
        out = loss_scale(fmap, yt, group, num_classes, img_size,
                         use_label_smooth=use_label_smooth,
                         use_focal_loss=use_focal_loss, max_gt=max_gt,
                         box_loss=box_loss)
        terms = [t + o for t, o in zip(terms, out)]
    xy, wh, conf, cls = terms
    return {"total": xy + wh + conf + cls, "xy": xy, "wh": wh,
            "conf": conf, "class": cls}


def l2_regularization(params, weight_decay: float) -> jax.Array:
    """L2 penalty over conv kernels only (slim weights_regularizer parity,
    reference model.py:49 + train.py:78): TF slim's l2_regularizer(scale)
    returns scale * tf.nn.l2_loss(w) where l2_loss(w) = sum(w**2) / 2, so
    this computes weight_decay * 0.5 * sum(||w||^2) over all conv kernels
    (biases and BN params excluded, matching slim's weights-only default)."""
    total = jnp.float32(0)
    for scope in params.values():
        for p in scope.values():
            total = total + jnp.sum(jnp.square(p["w"]))
    return weight_decay * 0.5 * total
