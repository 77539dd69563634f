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


# ---------------------------------------------------------------------------
# Split serving head: boxconf + lane-aligned class convs
# ---------------------------------------------------------------------------
#
# The fused detector's dominant non-conv cost (profiled in-pipeline, not
# standalone) is relayouting the 255-channel fp32 feature maps into per-anchor
# rows: [B,Hg,Wg,3*(5+C)] -> [B,A,5+C] crosses lane tiles for every element.
# Splitting each 1x1 detection conv into
#   boxconf: 15 = 3 anchors x (4 box + 1 conf) channels, fp32, anchor-major
#   cls:     3 x 128 lane-aligned class blocks, bf16 (48 zero-weight pad
#            classes with bias -30 -> sigmoid ~ 0)
# is algebraically the same matmul split along output columns, but makes
# every downstream reshape layout-exact: [B,Hg,Wg,3*128] -> [B,Hg*Wg*3,128]
# is free, the class max is a lane reduction, and candidate gathers read
# per-scale operands directly (no [B,A,5+C] concat is ever materialized).


def split_serving_head(folded: dict, num_classes: int,
                       cls_dtype=None) -> dict:
    """Rewrite folded head output convs for `yolov3_forward_split`.

    Returns a new folded tree where head conv_6/conv_14/conv_22 become
    {"boxconf": {w, b}, "cls": {w, b}} with the channel layouts above.
    """
    import jax.numpy as _jnp
    cls_dtype = cls_dtype or _jnp.bfloat16
    row = head_row_width(num_classes)
    need = 5 + num_classes
    out = {scope: dict(v) for scope, v in folded.items()}
    out["head"] = dict(folded["head"])
    for name in ("conv_6", "conv_14", "conv_22"):
        p = folded["head"][name]
        w = np.asarray(p["w"], np.float32)              # [1,1,cin,3*need]
        b = np.asarray(p["b"], np.float32)
        cin = w.shape[2]
        wbc = np.zeros((1, 1, cin, 15), np.float32)
        bbc = np.zeros((15,), np.float32)
        wcl = np.zeros((1, 1, cin, 3 * row), np.float32)
        bcl = np.full((3 * row,), -30.0, np.float32)    # pad classes -> ~0
        for a in range(3):
            src = a * need
            wbc[..., a * 5:a * 5 + 5] = w[..., src:src + 5]
            bbc[a * 5:a * 5 + 5] = b[src:src + 5]
            wcl[..., a * row:a * row + num_classes] = \
                w[..., src + 5:src + 5 + num_classes]
            bcl[a * row:a * row + num_classes] = b[src + 5:src + 5 + num_classes]
        dt = jnp.asarray(p["w"]).dtype
        out["head"][name] = {
            "boxconf": {"w": jnp.asarray(wbc, dt), "b": jnp.asarray(bbc)},
            "cls": {"w": jnp.asarray(wcl, dt),
                    "b": jnp.asarray(bcl, cls_dtype)},
        }
    return out


def apply_split_output_conv(p: dict, x: jax.Array, *,
                            compute_dtype=None, cls_dtype=None):
    """Apply one split detection conv {boxconf, cls} (see split_serving_head).
    Returns (boxconf fp32 [N,Hg,Wg,15], cls logits cls_dtype [N,Hg,Wg,3*row]).
    Shared by the bf16 and int8 serving forwards."""
    import jax.numpy as _jnp
    compute_dtype = compute_dtype or _jnp.bfloat16
    cls_dtype = cls_dtype or _jnp.bfloat16
    from yolov3_tensorflow_tpu.models.layers import conv2d
    bc = conv2d(x, p["boxconf"]["w"], compute_dtype=compute_dtype)
    bc = bc.astype(jnp.float32) + p["boxconf"]["b"]
    cl = conv2d(x, p["cls"]["w"], compute_dtype=compute_dtype)
    cl = (cl + p["cls"]["b"].astype(cl.dtype)).astype(cls_dtype)
    return (bc, cl)


def _serving_body(folded: dict, images: jax.Array, out_fn, *,
                  compute_dtype, stem_s2d: bool):
    """Shared serving forward: folded backbone + head convs, custom output
    conv application `out_fn(i, x)` for conv_6/conv_14/conv_22. FPN
    junctions use the exact split-neck rewrite (layers.neck_split_folded):
    no upsample/concat HBM materialization."""
    from yolov3_tensorflow_tpu.models.layers import (conv_folded,
                                                     conv_folded_asym,
                                                     neck_split_folded,
                                                     space_to_depth_2x)
    from yolov3_tensorflow_tpu.models.yolov3 import (_backbone_forward,
                                                     _head_forward)

    def bn_conv(scope, name, x, stride=1):
        return conv_folded(x, folded[scope][name], stride=stride,
                           compute_dtype=compute_dtype)

    x = images.astype(compute_dtype)
    if stem_s2d:
        def backbone_conv(i, x, s):
            if i == 0:
                return conv_folded(x, folded["backbone"]["conv_0"], stride=1,
                                   compute_dtype=compute_dtype)
            if i == 1:
                return conv_folded_asym(
                    x, folded["backbone"]["conv_1"],
                    padding=((1, 0), (1, 0)), compute_dtype=compute_dtype)
            return bn_conv("backbone", f"conv_{i}", x, s)
        x = space_to_depth_2x(x)
    else:
        def backbone_conv(i, x, s):
            return bn_conv("backbone", f"conv_{i}", x, s)

    def neck_fn(lat_idx, first_idx, inter, route):
        return neck_split_folded(
            inter, route, folded["head"][f"conv_{lat_idx}"],
            folded["head"][f"conv_{first_idx}"],
            compute_dtype=compute_dtype)

    routes = _backbone_forward(backbone_conv, x)
    return list(_head_forward(
        lambda i, x: bn_conv("head", f"conv_{i}", x), out_fn, routes,
        neck_fn=neck_fn))


def yolov3_forward_split(folded: dict, images: jax.Array, *,
                         compute_dtype=None, stem_s2d: bool = False,
                         cls_dtype=None):
    """Forward pass emitting split head outputs.

    Returns a list of 3 (boxconf, cls) pairs, strides (32, 16, 8):
      boxconf [N, Hg, Wg, 15] fp32 — per anchor a: channels a*5+0..3 box
        logits, a*5+4 conf logit
      cls     [N, Hg, Wg, 3*row] cls_dtype — anchor-major lane-aligned class
        logit blocks (row = head_row_width)
    Params must come from `split_serving_head` (and `space_to_depth_stem`
    when stem_s2d=True).
    """
    import jax.numpy as _jnp
    compute_dtype = compute_dtype or _jnp.bfloat16
    cls_dtype = cls_dtype or _jnp.bfloat16

    def out_split(i, x):
        return apply_split_output_conv(folded["head"][f"conv_{i}"], x,
                                       compute_dtype=compute_dtype,
                                       cls_dtype=cls_dtype)

    return _serving_body(folded, images, out_split,
                         compute_dtype=compute_dtype, stem_s2d=stem_s2d)


# ---------------------------------------------------------------------------
# Packed serving head: one lane-aligned block per anchor
# ---------------------------------------------------------------------------
#
# One step further than the split head: a SINGLE 1x1 detection conv per scale
# whose output channels are 3 anchor blocks of `row` (=128) lanes each, laid
# out as
#   [0:C)      class logits
#   [C]        objectness/conf logit
#   [C+1:C+5)  box logits tx, ty, tw, th
#   [C+5:row)  padding, bias -30 (sigmoid ~ 0, never wins a lane max)
# Everything downstream becomes layout-native: [B,Hg,Wg,3*row] ->
# [B,Hg*Wg*3,row] is a free reshape whose leading index IS the global anchor
# index (scale-major, then row-major y, x, anchor — the _decode_tables
# order), candidate rows are ONE take_along_axis per scale (no anchor-block
# select, no second gather), and the candidate-selection score is a plain
# lane reduction.
#
# Candidate selection masks the lane max to the class lanes (an iota compare
# fused into the reduction), so the selection score is exactly
# sigmoid(conf) * sigmoid(best_class_logit) — the same ranking as the split/
# prefilter paths. (An earlier version maxed over the whole block, which let
# large conf/box logits inflate a candidate's rank; fixed per round-2 advisor
# finding.) Selection can still be approximate via approx_max_k
# (recall_target 0.95); validate detection identity on a trained checkpoint
# like the other serving approximations (scripts/validate_quantized.py).


def pack_serving_head(folded: dict, num_classes: int,
                      out_dtype=None) -> dict:
    """Rewrite folded head output convs for `yolov3_forward_packed`.

    Returns a new folded tree where head conv_6/conv_14/conv_22 become
    {"packed": {w [1,1,cin,3*row], b}} with the block layout above.
    Requires num_classes + 5 <= head_row_width(num_classes).
    """
    import jax.numpy as _jnp
    out_dtype = out_dtype or _jnp.bfloat16
    row = head_row_width(num_classes)
    need = 5 + num_classes
    if need > row:
        raise ValueError(f"packed head needs C+5 <= row, got C={num_classes}")
    out = {scope: dict(v) for scope, v in folded.items()}
    out["head"] = dict(folded["head"])
    for name in ("conv_6", "conv_14", "conv_22"):
        p = folded["head"][name]
        w = np.asarray(p["w"], np.float32)              # [1,1,cin,3*need]
        b = np.asarray(p["b"], np.float32)
        cin = w.shape[2]
        wp = np.zeros((1, 1, cin, 3 * row), np.float32)
        bp = np.full((3 * row,), -30.0, np.float32)     # pad lanes -> ~0
        for a in range(3):
            src = a * need
            dst = a * row
            # classes first (lane max mostly == class max), then conf, box
            wp[..., dst:dst + num_classes] = w[..., src + 5:src + need]
            bp[dst:dst + num_classes] = b[src + 5:src + need]
            wp[..., dst + num_classes] = w[..., src + 4]        # conf
            bp[dst + num_classes] = b[src + 4]
            wp[..., dst + num_classes + 1:dst + num_classes + 5] = \
                w[..., src:src + 4]                             # tx ty tw th
            bp[dst + num_classes + 1:dst + num_classes + 5] = b[src:src + 4]
        dt = jnp.asarray(p["w"]).dtype
        out["head"][name] = {"packed": {
            "w": jnp.asarray(wp, dt), "b": jnp.asarray(bp, out_dtype)}}
    return out


def apply_packed_output_conv(p: dict, x: jax.Array, *,
                             compute_dtype=None, out_dtype=None) -> jax.Array:
    """Apply one packed detection conv (see pack_serving_head).
    Returns logits out_dtype [N,Hg,Wg,3*row]. Shared by bf16/int8 forwards."""
    import jax.numpy as _jnp
    compute_dtype = compute_dtype or _jnp.bfloat16
    out_dtype = out_dtype or _jnp.bfloat16
    from yolov3_tensorflow_tpu.models.layers import conv2d
    y = conv2d(x, p["packed"]["w"], compute_dtype=compute_dtype)
    return (y + p["packed"]["b"].astype(y.dtype)).astype(out_dtype)


def yolov3_forward_packed(folded: dict, images: jax.Array, *,
                          compute_dtype=None, stem_s2d: bool = False,
                          out_dtype=None):
    """Forward pass emitting packed head outputs: a list of 3 arrays
    [N, Hg, Wg, 3*row] out_dtype, strides (32, 16, 8). Params must come
    from `pack_serving_head`."""
    import jax.numpy as _jnp
    compute_dtype = compute_dtype or _jnp.bfloat16
    out_dtype = out_dtype or _jnp.bfloat16

    def out_packed(i, x):
        return apply_packed_output_conv(folded["head"][f"conv_{i}"], x,
                                        compute_dtype=compute_dtype,
                                        out_dtype=out_dtype)

    return _serving_body(folded, images, out_packed,
                         compute_dtype=compute_dtype, stem_s2d=stem_s2d)


def postprocess_packed(packed_outs, anchors: np.ndarray, num_classes: int,
                       img_size: Tuple[int, int], *,
                       max_out: int = 128, box_topk: int = 128,
                       score_thresh: float = 0.3, iou_thresh: float = 0.45,
                       approx_topk: bool = True,
                       use_pallas: Optional[bool] = None,
                       pallas_interpret: bool = False,
                       cell_major: bool = True,
                       score_dtype=None
                       ) -> Dict[str, jax.Array]:
    """Batched detection from packed head outputs (`yolov3_forward_packed`).

    Same output contract as postprocess_split; candidate selection uses a
    class-lane-masked max (see the packed-head note above), final scores are
    exact. The fastest serving pipeline measured on v5e.

    cell_major=True (default, round 5) never forms the per-anchor
    [B, A, row] view (whose anchor index interleaves into the sublane
    dimension — a relayout in the general case). Instead the conv outputs
    are read in their native cell layout ([B, Hg*Wg, 3*row] is layout-free)
    with each anchor block a lane-tile-aligned static slice; candidate rows
    are fetched with cell-level gathers + anchor-block selects. Measured
    END-TO-END NEUTRAL on v5e at batch 128 (1987.5 vs 1985.5 img/s —
    XLA was already fusing the per-anchor relayout into cheap consumers),
    kept as the default because it guarantees no relayout regardless of
    fusion decisions and reads more bytes-honestly. The candidate order
    (scale-major, then y, x, anchor) and all outputs are identical
    (scripts/exp_postprocess.py, round-5 BENCHMARKS.md).

    score_dtype: dtype for the objectness selection score (default fp32).
    bf16 halves the top-k operand; final detection scores stay exact fp32
    either way — only candidate *ranking* feels the rounding.
    """
    img_h, img_w = int(img_size[0]), int(img_size[1])
    anchors = np.asarray(anchors, np.float32)
    row = head_row_width(num_classes)
    c = num_classes
    sdt = jnp.float32 if score_dtype is None else (
        jnp.bfloat16 if score_dtype in ("bf16", jnp.bfloat16) else score_dtype)

    # class-lane mask: restrict the selection max to lanes [0, C) so conf/box
    # logits can never inflate a candidate's selection score (round-2 advisor)
    lane = jax.lax.broadcasted_iota(jnp.int32, (row,), 0)
    neg = jnp.asarray(-jnp.inf, packed_outs[0].dtype)

    ops, objs, offsets, counts = [], [], [], []
    off = 0
    for p in packed_outs:
        b, hg, wg, _ = p.shape
        na = hg * wg * 3
        if cell_major:
            nc = hg * wg
            # score straight off the 4D conv output: the [B,nc,3*row]
            # reshape costs ~0.6 ms/batch-128 in the score fusion context
            # (scripts/exp_score.py v0 1.43 vs v2 0.85 ms) even though the
            # same reshape is free inside the einsum gather below — lane-
            # aligned 4D slices sidestep the question entirely
            obj_a = []
            for a3 in range(3):
                blk = p[..., a3 * row:(a3 + 1) * row]     # lane-aligned 4D
                lane_max = jnp.max(jnp.where(lane < c, blk, neg),
                                   axis=-1).astype(sdt)
                conf = blk[..., c].astype(sdt)
                obj_a.append(jax.nn.sigmoid(conf) * jax.nn.sigmoid(lane_max))
            # anchor-minor stack == the global candidate order (y, x, anchor)
            objs.append(jnp.stack(obj_a, axis=-1).reshape(b, na))
            ops.append(p.reshape(b, nc, 3 * row))         # einsum operand
        else:
            pr = p.reshape(b, na, row)                # per-anchor relayout
            lane_max = jnp.max(jnp.where(lane < c, pr, neg),
                               axis=-1).astype(sdt)
            conf = pr[..., c].astype(sdt)
            objs.append(jax.nn.sigmoid(conf) * jax.nn.sigmoid(lane_max))
            ops.append(pr)
        offsets.append(off)
        counts.append(na)
        off += na
    a = off
    obj = jnp.concatenate(objs, axis=1)               # [B, A]
    k_box = min(box_topk, a)

    if approx_topk:
        _, cand_idx = jax.lax.approx_max_k(obj, k_box, recall_target=0.95)
    else:
        _, cand_idx = jax.lax.top_k(obj, k_box)       # [B, K]

    if cell_major:
        rows = _gather_cells_onehot(
            ops, cand_idx, offsets, [na // 3 for na in counts], row)
    else:
        rows = None
        for op, ofs, na in zip(ops, offsets, counts):
            local = jnp.clip(cand_idx - ofs, 0, na - 1)
            g = jnp.take_along_axis(op, local[..., None], axis=1)  # [B,K,row]
            in_scale = ((cand_idx >= ofs) & (cand_idx < ofs + na))[..., None]
            rows = g if rows is None else jnp.where(in_scale, g, rows)

    tx, ty, rw, rh, aw, ah = (jnp.asarray(t) for t in _decode_tables(
        img_h, img_w, tuple(anchors.reshape(-1).tolist())))
    gx = jnp.take(tx, cand_idx)
    gy = jnp.take(ty, cand_idx)
    grw = jnp.take(rw, cand_idx)
    grh = jnp.take(rh, cand_idx)
    gaw = jnp.take(aw, cand_idx)
    gah = jnp.take(ah, cand_idx)

    box = rows[..., c + 1:c + 5].astype(jnp.float32)  # tx ty tw th
    cx = (jax.nn.sigmoid(box[..., 0]) + gx) * grw
    cy = (jax.nn.sigmoid(box[..., 1]) + gy) * grh
    w = jnp.exp(box[..., 2]) * gaw
    h = jnp.exp(box[..., 3]) * gah
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                      axis=-1)                        # [B, K, 4]

    conf = jax.nn.sigmoid(rows[..., c:c + 1].astype(jnp.float32))
    probs = jax.nn.sigmoid(rows[..., :c].astype(jnp.float32))
    scores = conf * probs                             # [B, K, C]

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from yolov3_tensorflow_tpu.ops.nms_pallas import (
            batched_nms_shared_pallas)
        if k_box % 8:                 # pad to the NMS kernel's sublane unit
            pad = 8 - k_box % 8
            boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
            # sentinel below any threshold so degenerate pad boxes can never
            # pass the validity test even at score_thresh <= 0
            scores = jnp.pad(scores, ((0, 0), (0, pad), (0, 0)),
                             constant_values=-1.0)
        return batched_nms_shared_pallas(
            boxes, scores, max_out=max_out, score_thresh=score_thresh,
            iou_thresh=iou_thresh, interpret=pallas_interpret)
    from yolov3_tensorflow_tpu.ops.nms import batched_nms
    return batched_nms(boxes, scores, max_out=max_out,
                       pre_topk=k_box, score_thresh=score_thresh,
                       iou_thresh=iou_thresh)


def _gather_cells_onehot(cell_ops: Sequence[jax.Array],
                         cand_idx: jax.Array,
                         offsets: Sequence[int],
                         cells: Sequence[int],
                         block: int) -> jax.Array:
    """Candidate-row fetch as a one-hot MXU matmul instead of a row gather.

    Same contract as `_gather_cells_per_scale`, different mechanism:
    `take_along_axis` lowers to one DMA per gathered row (B*K*scales ~ 25k
    independent ~768 B reads at the bench shape) and is LATENCY-bound —
    measured 1.59 ms/batch-128 despite touching only ~56 MB. A one-hot
    [B, K, ncells] x [B, ncells, 3*block] einsum instead streams the
    operand at full HBM bandwidth through the MXU: measured 0.62 ms for
    the identical result (scripts/exp_tail.py, round-5 BENCHMARKS.md).
    Exactness: one-hot rows select a single product of 1.0 * value — no
    rounding at any dtype, so gathered rows are bit-identical.
    """
    out = None
    for op, off, nc in zip(cell_ops, offsets, cells):
        local = jnp.clip(cand_idx - off, 0, nc * 3 - 1)
        cell = local // 3
        a_l = local % 3
        onehot = jax.nn.one_hot(cell, nc, dtype=op.dtype)     # [B, K, nc]
        g = jnp.einsum("bkn,bnd->bkd", onehot, op)            # [B,K,3*block]
        g = _select_anchor_block(g, a_l, block, 3)            # [B,K,block]
        in_scale = ((cand_idx >= off) & (cand_idx < off + nc * 3))[..., None]
        out = g if out is None else jnp.where(in_scale, g, out)
    return out


def _select_anchor_block(rows: jax.Array, a_l: jax.Array, block: int,
                         nblocks: int) -> jax.Array:
    """rows [B, K, nblocks*block] -> [B, K, block], picking per-row block
    a_l [B, K]. Static lane-aligned slices + select (no strided gather)."""
    out = None
    for a in range(nblocks):
        blk = rows[..., a * block:(a + 1) * block]
        sel = (a_l == a)[..., None]
        out = blk if out is None else jnp.where(sel, blk, out)
    return out


def _gather_cells_per_scale(cell_ops: Sequence[jax.Array],
                            cand_idx: jax.Array,
                            offsets: Sequence[int],
                            cells: Sequence[int],
                            block: int) -> jax.Array:
    """Gather per-anchor blocks by global anchor index from per-scale CELL
    operands (native conv layout [B, Hg*Wg, 3*block] — a free reshape of the
    conv output, never relaid out). cand_idx [B, K] indexes the virtual
    per-anchor concat (scale-major, then row-major y, x, anchor).
    Returns [B, K, block]."""
    out = None
    for op, off, nc in zip(cell_ops, offsets, cells):
        local = jnp.clip(cand_idx - off, 0, nc * 3 - 1)
        cell = local // 3
        a_l = local % 3
        g = jnp.take_along_axis(op, cell[..., None], axis=1)  # [B,K,3*block]
        g = _select_anchor_block(g, a_l, block, 3)            # [B,K,block]
        in_scale = ((cand_idx >= off) & (cand_idx < off + nc * 3))[..., None]
        out = g if out is None else jnp.where(in_scale, g, out)
    return out


def postprocess_split(split_outs, anchors: np.ndarray, num_classes: int,
                      img_size: Tuple[int, int], *,
                      max_out: int = 50, box_topk: int = 128,
                      score_thresh: float = 0.3, iou_thresh: float = 0.45,
                      approx_topk: bool = True,
                      use_pallas: Optional[bool] = None
                      ) -> Dict[str, jax.Array]:
    """Batched detection from split head outputs (`yolov3_forward_split`).

    Same output contract and same math as postprocess_prefilter, restructured
    so the big class tensor is only ever touched through lane-tile-aligned
    slices of its native conv layout: scoring reduces each 128-wide anchor
    block in place, and candidate rows are fetched with cell-level gathers +
    block selects (profiled: the per-anchor [B, A, D] flattening relayouts
    were the single largest non-conv cost of the fused detector).
    """
    img_h, img_w = int(img_size[0]), int(img_size[1])
    anchors = np.asarray(anchors, np.float32)
    row = head_row_width(num_classes)

    bc_cells, cls_cells, objs, offsets, cells = [], [], [], [], []
    off = 0
    for bc, cl in split_outs:
        b, hg, wg, _ = bc.shape
        nc = hg * wg
        bcc = bc.reshape(b, nc, 15)                       # free reshape
        clc = cl.reshape(b, nc, 3 * row)                  # free reshape
        conf = jnp.stack([bcc[..., a * 5 + 4] for a in range(3)], axis=-1)
        cmax = jnp.stack(
            [jnp.max(clc[..., a * row:(a + 1) * row], axis=-1)
             for a in range(3)], axis=-1).astype(jnp.float32)  # [B, nc, 3]
        obj = jax.nn.sigmoid(conf) * jax.nn.sigmoid(cmax)
        objs.append(obj.reshape(b, nc * 3))
        bc_cells.append(bcc)
        cls_cells.append(clc)
        offsets.append(off)
        cells.append(nc)
        off += nc * 3
    a = off
    obj = jnp.concatenate(objs, axis=1)                   # [B, A] fp32
    k_box = min(box_topk, a)

    if approx_topk:
        _, cand_idx = jax.lax.approx_max_k(obj, k_box, recall_target=0.95)
    else:
        _, cand_idx = jax.lax.top_k(obj, k_box)           # [B, K]

    bc_rows = _gather_cells_per_scale(bc_cells, cand_idx, offsets, cells, 5)
    cls_rows = _gather_cells_per_scale(cls_cells, cand_idx, offsets, cells,
                                       row)               # [B, K, row]

    tx, ty, rw, rh, aw, ah = (jnp.asarray(t) for t in _decode_tables(
        img_h, img_w, tuple(anchors.reshape(-1).tolist())))
    gx = jnp.take(tx, cand_idx)
    gy = jnp.take(ty, cand_idx)
    grw = jnp.take(rw, cand_idx)
    grh = jnp.take(rh, cand_idx)
    gaw = jnp.take(aw, cand_idx)
    gah = jnp.take(ah, cand_idx)

    cx = (jax.nn.sigmoid(bc_rows[..., 0]) + gx) * grw
    cy = (jax.nn.sigmoid(bc_rows[..., 1]) + gy) * grh
    w = jnp.exp(bc_rows[..., 2]) * gaw
    h = jnp.exp(bc_rows[..., 3]) * gah
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                      axis=-1)                            # [B, K, 4]

    conf = jax.nn.sigmoid(bc_rows[..., 4:5])
    probs = jax.nn.sigmoid(cls_rows[..., :num_classes].astype(jnp.float32))
    scores = conf * probs                                 # [B, K, C]

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from yolov3_tensorflow_tpu.ops.nms_pallas import (
            batched_nms_shared_pallas)
        if k_box % 8:                 # pad to the NMS kernel's sublane unit
            pad = 8 - k_box % 8
            boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
            # sentinel below any threshold so degenerate pad boxes can never
            # pass the validity test even at score_thresh <= 0
            scores = jnp.pad(scores, ((0, 0), (0, pad), (0, 0)),
                             constant_values=-1.0)
        return batched_nms_shared_pallas(
            boxes, scores, max_out=max_out, score_thresh=score_thresh,
            iou_thresh=iou_thresh)
    from yolov3_tensorflow_tpu.ops.nms import batched_nms
    return batched_nms(boxes, scores, max_out=max_out,
                       pre_topk=k_box, score_thresh=score_thresh,
                       iou_thresh=iou_thresh)


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
