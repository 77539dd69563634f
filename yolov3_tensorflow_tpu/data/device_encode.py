"""Device-resident y_true label encoding: host sends padded GT boxes, the
TPU builds the dense label grids.

The host encoder (data/encoder.py, reference utils/data_utils.py:51-115
`process_box`) materializes three dense [H/s, W/s, 3, 6+C] fp32 grids per
image and ships them to the device every step. At 416^2 COCO-80 that is
~3.6 MB per image — more than the image itself — and on a remote-attached
device that transfer dominates the step. This module is the TPU twin: the
host pads the post-augmentation ground truth to a static [M, 5] box array
(+ labels + validity mask, ~2 KB per image) and the grids are scattered
on-device inside the jitted train step.

Parity contract (tests/test_device_encode.py): bit-identical grids vs the
host `encode_labels` on the same padded inputs, including the reference's
exact collision semantics — the host loop only ever SETS channels, so when
two GT boxes land in the same (cell, anchor) slot the LAST one in
annotation order wins for coords/objectness/mixup-weight while the class
one-hot bits of ALL colliding boxes remain set (a union). Both are
reproduced vectorially: coords scatter with later-writer dedup (unique
indices, no sequential loop), class bits scatter-max over every valid box.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

_STRIDES = (32, 16, 8)


def encode_labels_device(gt_boxes, gt_labels, gt_mask,
                         img_size: Tuple[int, int], num_classes: int,
                         anchors: np.ndarray) -> List:
    """Batched on-device label encoding (jit/vmap-ready).

    gt_boxes: [B, M, 5] xyxy + per-box mixup weight (pad rows all-zero);
    gt_labels: [B, M] int32; gt_mask: [B, M] bool; img_size: STATIC
    (width, height). Returns the 3 dense grids [B, H/s, W/s, 3, 6+C] for
    strides 32/16/8 — same contract as stacking host `encode_labels`.
    """
    import jax
    import jax.numpy as jnp

    w_img, h_img = int(img_size[0]), int(img_size[1])
    anchors = jnp.asarray(anchors, jnp.float32)          # [9, 2]
    nch = 6 + num_classes

    def encode_one(boxes, labels, mask):
        m = boxes.shape[0]
        centers = (boxes[:, 0:2] + boxes[:, 2:4]) * 0.5  # [M, 2]
        sizes = boxes[:, 2:4] - boxes[:, 0:2]            # [M, 2]
        mix_w = boxes[:, 4]

        # width/height-only anchor IoU (encoder.anchor_iou twin)
        wh = jnp.minimum(sizes[:, None, :], anchors[None, :, :])
        inter = wh[..., 0] * wh[..., 1]
        union = (sizes[:, None, 0] * sizes[:, None, 1]
                 + anchors[:, 0] * anchors[:, 1] - inter)
        best = jnp.argmax(inter / (union + 1e-10), axis=1)  # [M]

        scale = 2 - best // 3     # anchor 6..8 -> scale 0 (stride 32)
        k = best % 3              # slot within the scale's anchor group

        # class channels zero here; they are unioned in a second scatter so
        # a slot collision keeps BOTH classes' bits (host/reference parity)
        rows = jnp.concatenate([
            centers, sizes,
            jnp.ones((m, 1), jnp.float32),
            jnp.zeros((m, num_classes), jnp.float32),
            mix_w[:, None],
        ], axis=-1)                                       # [M, 6+C]

        order = jnp.arange(m)
        grids = []
        for s_idx, stride in enumerate(_STRIDES):
            gw, gh = w_img // stride, h_img // stride
            x = jnp.clip((centers[:, 0] // stride).astype(jnp.int32),
                         0, gw - 1)
            y = jnp.clip((centers[:, 1] // stride).astype(jnp.int32),
                         0, gh - 1)
            flat = (y * gw + x) * 3 + k                   # [M]
            sel = mask & (scale == s_idx)
            # reference write-order: the LAST valid box into a slot wins —
            # drop i iff some later valid box j targets the same slot
            same = (flat[None, :] == flat[:, None]) \
                & sel[None, :] & (order[None, :] > order[:, None])
            keep = sel & ~jnp.any(same, axis=1)
            idx = jnp.where(keep, flat, gh * gw * 3)      # OOB -> dropped

            base = jnp.zeros((gh * gw * 3, nch), jnp.float32)
            base = base.at[:, -1].set(1.0)                # mixup-w default
            grid = base.at[idx].set(rows, mode="drop")
            # class-bit union over ALL valid writers (incl. shadowed ones)
            idx_all = jnp.where(sel, flat, gh * gw * 3)
            cls_ch = 5 + jnp.clip(labels, 0, num_classes - 1)
            grid = grid.at[idx_all, cls_ch].max(1.0, mode="drop")
            grids.append(grid.reshape(gh, gw, 3, nch))
        return tuple(grids)

    return list(jax.vmap(encode_one)(gt_boxes, gt_labels, gt_mask))
