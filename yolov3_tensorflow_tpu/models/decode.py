"""Anchor-box decoding of raw feature maps.

Vectorized equivalents of reference model.py `reorg_layer` (model.py:82-137)
and `predict` (model.py:140-190). Everything is fp32 and shape-static; XLA
fuses the sigmoid/exp/scale chain into the preceding conv output.

Conventions (identical to the reference):
- anchors are (w, h) in input-pixel units
- decoded box centers/sizes are in input-pixel units
- `predict` returns corner boxes (x_min, y_min, x_max, y_max)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def decode_feature_map(feature_map: jax.Array, anchors: jax.Array,
                       num_classes: int, img_size: Tuple[int, int]
                       ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Decode one scale's raw feature map into absolute boxes + logits.

    Args:
      feature_map: [N, Hg, Wg, 3*(5+C)] raw conv output.
      anchors: [3, 2] (w, h) in input pixels for this scale.
      img_size: (height, width) of the network input.

    Returns (xy_offset [Hg, Wg, 1, 2], boxes [N, Hg, Wg, 3, 4] as
    (cx, cy, w, h) in input pixels, conf_logits [N, Hg, Wg, 3, 1],
    prob_logits [N, Hg, Wg, 3, C]) — the reorg_layer contract
    (model.py:128-137).
    """
    n, hg, wg = feature_map.shape[0], feature_map.shape[1], feature_map.shape[2]
    img_h, img_w = img_size
    ratio_h = float(img_h) / hg
    ratio_w = float(img_w) / wg

    fmap = feature_map.astype(jnp.float32).reshape(n, hg, wg, 3, 5 + num_classes)
    box_xy = fmap[..., 0:2]
    box_wh = fmap[..., 2:4]
    conf_logits = fmap[..., 4:5]
    prob_logits = fmap[..., 5:]

    # mesh offsets, (x, y) order like model.py:108-115
    x_off = jax.lax.broadcasted_iota(jnp.float32, (hg, wg), 1)
    y_off = jax.lax.broadcasted_iota(jnp.float32, (hg, wg), 0)
    xy_offset = jnp.stack([x_off, y_off], axis=-1)[:, :, None, :]  # [Hg,Wg,1,2]

    centers = (jax.nn.sigmoid(box_xy) + xy_offset) * jnp.asarray(
        [ratio_w, ratio_h], jnp.float32)
    # exp clamp: a wh logit > 88.7 overflows exp to inf, and even a
    # structurally-zero cotangent flowing back through the concat/slice pair
    # evaluates 0 * exp'(t) = 0 * inf = NaN in the VJP, NaN-ing every grad
    # while the loss still reads finite. min(t, 60) is behavior-neutral
    # (e^60 ~ 1.1e26 px is beyond any representable box; the reference's
    # unclamped tf.exp, model.py:123-126, is where its own NaN aborts come
    # from) and keeps the backward finite.
    sizes = jnp.exp(jnp.minimum(box_wh, 60.0)) * jnp.asarray(
        anchors, jnp.float32)

    boxes = jnp.concatenate([centers, sizes], axis=-1)
    return xy_offset, boxes, conf_logits, prob_logits


def predict_boxes(feature_maps: Sequence[jax.Array], anchors: np.ndarray,
                  num_classes: int, img_size: Tuple[int, int]
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode all three scales into flat corner boxes + sigmoid scores.

    Equivalent of reference model.py `predict` (model.py:140-190): anchor
    groups [6:9]/[3:6]/[0:3] for strides 32/16/8, flatten + concat to
    [N, A, ...] with A = 3*(H/32*W/32 + H/16*W/16 + H/8*W/8)
    (= 10647 at 416x416).

    Returns (boxes [N, A, 4] xyxy in input pixels, confs [N, A, 1],
    probs [N, A, C]) — confs/probs already sigmoided.
    """
    anchors = np.asarray(anchors, np.float32)
    groups = [anchors[6:9], anchors[3:6], anchors[0:3]]

    boxes_list, confs_list, probs_list = [], [], []
    for fmap, group in zip(feature_maps, groups):
        n = fmap.shape[0]
        _, boxes, conf_logits, prob_logits = decode_feature_map(
            fmap, group, num_classes, img_size)
        boxes_list.append(boxes.reshape(n, -1, 4))
        confs_list.append(jax.nn.sigmoid(conf_logits.reshape(n, -1, 1)))
        probs_list.append(jax.nn.sigmoid(prob_logits.reshape(n, -1, num_classes)))

    boxes = jnp.concatenate(boxes_list, axis=1)
    confs = jnp.concatenate(confs_list, axis=1)
    probs = jnp.concatenate(probs_list, axis=1)

    center, size = boxes[..., 0:2], boxes[..., 2:4]
    half = size * 0.5
    boxes_xyxy = jnp.concatenate([center - half, center + half], axis=-1)
    return boxes_xyxy, confs, probs
