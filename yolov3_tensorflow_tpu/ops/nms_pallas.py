"""Pallas TPU kernel for per-class greedy NMS suppression.

The one genuinely kernel-shaped component of the framework (SURVEY.md §2.1):
the replacement for the reference's C++ tf.image.non_max_suppression
(nms_utils.py:36). Top-k candidate selection stays in XLA (its top_k is
already optimal); this kernel computes the greedy keep-mask for all
(image, class) pairs.

Algorithm — exact greedy via the matrix-NMS fixpoint:
    M[i, j] = (IoU(box_i, box_j) > t) and i < j        (score-desc order)
    keep   <- valid
    repeat: keep <- valid and not (keep @ M > 0)   until unchanged

Any fixpoint of that map equals the sequential greedy solution (unique by
strong induction over candidate rank), and iterate-until-stable reaches it in
at most the suppression-chain depth (typically < 8) iterations. Each
iteration is one [1,K]x[K,K] matvec on the MXU over VMEM-resident data — no
HBM traffic for the K^2 IoU matrix and no K-step sequential scalar loop, the
two costs that make naive TPU NMS slow.

Grid: one program per (image*class); candidates per program K (static,
multiple of 128). Inputs are produced by the same XLA top-k staging as
ops.nms (boxes sorted score-descending + validity mask).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, iou_thresh_ref, keep_ref):
    """One (image, class) program: boxes [1, K, 4] -> keep mask [1, 1, K]."""
    k = boxes_ref.shape[1]
    boxes = boxes_ref[0].astype(jnp.float32)          # [K, 4]
    valid = valid_ref[0, 0].astype(jnp.float32)       # [K]
    thresh = iou_thresh_ref[0]

    x0 = boxes[:, 0]
    y0 = boxes[:, 1]
    x1 = boxes[:, 2]
    y1 = boxes[:, 3]
    area = (x1 - x0) * (y1 - y0)                      # [K]

    # pairwise IoU, [K, K] in VMEM
    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    iw = jnp.maximum(ix1 - ix0, 0.0)
    ih = jnp.maximum(iy1 - iy0, 0.0)
    inter = iw * ih
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-10)

    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # suppressor matrix: higher-ranked i (i < j) with IoU > t
    m = ((iou > thresh) & (rows < cols)).astype(jnp.float32)

    valid_row = valid[None, :]                        # [1, K]

    def cond(carry):
        keep, prev, it = carry
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(carry):
        keep, _, it = carry
        suppressed = jnp.dot(keep, m, preferred_element_type=jnp.float32)
        new_keep = valid_row * (suppressed <= 0.0).astype(jnp.float32)
        return new_keep, keep, it + 1

    init = (valid_row, -jnp.ones_like(valid_row), jnp.int32(0))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    keep_ref[0, 0, :] = keep[0]


def nms_keep_mask_pallas(boxes: jax.Array, valid: jax.Array,
                         iou_thresh: float,
                         interpret: bool = False) -> jax.Array:
    """Greedy NMS keep masks for a batch of candidate sets.

    boxes: [G, K, 4] xyxy, each row score-descending; valid: [G, K] bool.
    Returns keep [G, K] bool. K must be a multiple of 128 (pad upstream).
    """
    g, k, _ = boxes.shape
    if k % 128 != 0:
        raise ValueError(f"K must be a multiple of 128, got {k}")
    thresh = jnp.full((1,), iou_thresh, jnp.float32)

    # valid/keep carry a singleton middle axis so every block's trailing two
    # dims are (1, K) == the array dims (Mosaic tiling requirement)
    keep = pl.pallas_call(
        _nms_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 1, k), jnp.float32),
        interpret=interpret,
    )(boxes.astype(jnp.float32),
      valid.astype(jnp.float32)[:, None, :], thresh)
    return keep[:, 0, :] > 0.5


def _nms_shared_kernel(boxes_ref, scores_ref, thresh_ref, act_ref, keep_ref,
                       iou_scratch):
    """A *block of images* per program: all classes share one candidate set
    per image.

    boxes_ref:  [IB, K, 4]  candidate boxes (any order)
    scores_ref: [IB, C, K]  per-class scores of the same candidates
                            (class-major so each class is a sublane slice)
    thresh_ref: [2] SMEM    (iou_thresh, score_thresh)
    act_ref:    [IB, C/CH] SMEM  1 where the class chunk has any score >=
                            score_thresh (precomputed in XLA — deciding this
                            in-kernel costs a vector->scalar pipeline drain
                            per chunk, which dominated the sparse case)
    keep_ref:   [IB, C, K]  keep masks
    iou_scratch:[IB, K, K]  VMEM scratch for the block's IoU>t masks

    Per image, the IoU>t mask is computed ONCE; classes are processed in
    chunks of _CLASS_CHUNK: the score-rank ordering mask (greedy order =
    score-descending, ties by candidate index) is built vectorized for the
    whole chunk, and one fixpoint loop runs the chunk jointly (it converges
    when the chunk's deepest suppression chain does — typically 2-3
    iterations). Chunking amortizes the loop/slice overhead that dominates a
    per-class loop: 80 classes = 10 chunk iterations instead of 80 class
    iterations. Chunks whose best score is below the score threshold skip the
    mask build + fixpoint entirely (semantically identity — all-invalid
    classes yield all-zero keep masks), which is the common case for a
    trained detector firing on a handful of classes per image.

    The image loop lives INSIDE the program (grid = B / IB) because each
    image's work is only ~10 us: at grid = B the per-program launch overhead
    was the dominant cost of the whole NMS stage (measured ~2x the compute).
    """
    ib = boxes_ref.shape[0]
    k = boxes_ref.shape[1]
    c = scores_ref.shape[1]
    chunk = _CLASS_CHUNK
    iou_t = thresh_ref[0]
    score_t = thresh_ref[1]

    # one bulk zero-fill instead of a per-inactive-chunk store: the common
    # trained-detector case is most chunks inactive, where the loop body
    # used to pay a store + pipeline drain per (image, chunk) just to write
    # zeros (round 5; measured as loop overhead dominating the kernel)
    keep_ref[...] = jnp.zeros((ib, c, k), jnp.float32)

    rows_lt_cols = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
                    < jax.lax.broadcasted_iota(jnp.int32, (k, k), 1))

    # IoU masks for the whole image block in one vectorized pass — a
    # per-image build is latency-bound (short serial op chains on [K, K]
    # tiles), which dominated the kernel at ~10 us/image.
    bx = boxes_ref[...].astype(jnp.float32)                # [IB, K, 4]
    x0, y0, x1, y1 = bx[..., 0], bx[..., 1], bx[..., 2], bx[..., 3]
    area = (x1 - x0) * (y1 - y0)
    ix0 = jnp.maximum(x0[:, :, None], x0[:, None, :])
    iy0 = jnp.maximum(y0[:, :, None], y0[:, None, :])
    ix1 = jnp.minimum(x1[:, :, None], x1[:, None, :])
    iy1 = jnp.minimum(y1[:, :, None], y1[:, None, :])
    iw = jnp.maximum(ix1 - ix0, 0.0)
    ih = jnp.maximum(iy1 - iy0, 0.0)
    inter = iw * ih
    iou = inter / (area[:, :, None] + area[:, None, :] - inter + 1e-10)
    iou_scratch[...] = (iou > iou_t).astype(jnp.float32)   # [IB, K, K]

    def per_image(im, _):
        iou_mask = iou_scratch[im] > 0.5                   # [K, K], shared

        def per_chunk(ch, _):
            active = act_ref[im, ch]

            @pl.when(active != 0)
            def _suppress():
                # dynamic slicing must address the ref directly (Mosaic req.)
                s = scores_ref[im, pl.ds(ch * chunk, chunk), :].astype(
                    jnp.float32)
                valid = (s >= score_t).astype(jnp.float32)        # [CH, K]
                # rank mask per class: i precedes j in greedy order
                rank = (s[:, :, None] > s[:, None, :]) | (
                    (s[:, :, None] == s[:, None, :]) & rows_lt_cols[None])
                m = (iou_mask[None] & rank).astype(jnp.float32)  # [CH, K, K]

                def cond(carry):
                    keep, prev, it = carry
                    return jnp.logical_and(it < k, jnp.any(keep != prev))

                def body(carry):
                    keep, _, it = carry
                    # suppressed_cj = max_i keep_ci * m_cij (> 0 iff any
                    # kept higher-ranked overlapping box) — VPU sublane
                    # reduction, vectorized over the chunk
                    suppressed = jnp.max(m * keep[:, :, None], axis=1)
                    return (valid * (suppressed <= 0.0).astype(jnp.float32),
                            keep, it + 1)

                keep, _, _ = jax.lax.while_loop(
                    cond, body, (valid, -jnp.ones_like(valid), jnp.int32(0)))
                keep_ref[im, pl.ds(ch * chunk, chunk), :] = keep

            return 0

        jax.lax.fori_loop(0, c // chunk, per_chunk, 0)
        return 0

    jax.lax.fori_loop(0, ib, per_image, 0)


import os as _os

_CLASS_CHUNK = int(_os.environ.get("YOLOV3_TPU_NMS_CLASS_CHUNK", "16"))
# class-chunk width for the shared kernel (vectorized rank build); the env
# override exists for A/B sweeps (scripts/exp_postprocess.py). 16 measured
# best end-to-end at the bench config (chunk 32 halves the serial loop count
# but its [32, K, K] rank masks left the e2e number flat-to-worse).


# Note on a rejected design: a "class-parallel" v3 kernel (one global
# fixpoint loop updating all classes per iteration via [CHUNK, K, K] VPU
# max-reductions) measured ~2x SLOWER than the per-class while-loop above in
# both dense synthetic and real-detector regimes: the global loop runs until
# the deepest class converges, re-paying full C*K^2 work per iteration, while
# the per-class loop exits most classes after 1-2 iterations.


def nms_keep_mask_shared_pallas(boxes: jax.Array, scores: jax.Array,
                                score_thresh: float, iou_thresh: float,
                                interpret: bool = False) -> jax.Array:
    """All-class keep masks over a shared candidate set.

    boxes: [B, K, 4]; scores: [B, K, C] -> keep [B, C, K] bool.
    K must be a multiple of 8 (the sublane unit — see the check below);
    classes are padded to a multiple of _CLASS_CHUNK (16) internally.
    """
    b, k, _ = boxes.shape
    c = scores.shape[2]
    if k % 8 != 0:
        # K sits on the SUBLANE dimension of every [*, K, K] mask the kernel
        # builds, so sublane granularity (8) is the real alignment unit;
        # lane-dim K < 128 is padded internally by Mosaic. Running the bench
        # config at its true K=64 instead of padding to 128 halves the
        # rank-mask/fixpoint vector volume (round-5 BENCHMARKS.md).
        raise ValueError(f"K must be a multiple of 8, got {k}")
    thresh = jnp.asarray([iou_thresh, score_thresh], jnp.float32)
    scores_ck = jnp.swapaxes(scores, 1, 2)                  # [B, C, K]
    c_pad = ((c + _CLASS_CHUNK - 1) // _CLASS_CHUNK) * _CLASS_CHUNK
    if c_pad != c:
        scores_ck = jnp.pad(scores_ck, ((0, 0), (0, c_pad - c), (0, 0)),
                            constant_values=-1.0)           # padded -> invalid
    # Images per program: amortize launch overhead (see kernel docstring),
    # bounded by VMEM (double-buffered score/keep blocks + the IoU scratch;
    # IB=64 at C=80 measured over the 16 MB scoped-vmem limit).
    per_img = k * 4 * (4 * c_pad + k + 8)
    ib = 1
    for cand_ib in (2, 4, 8, 16, 32):
        if b % cand_ib == 0 and cand_ib * per_img <= 10 * 1024 * 1024:
            ib = cand_ib
    # chunk-activity bits, computed where they fuse into the score producer
    act = (jnp.max(
        scores_ck.reshape(b, c_pad // _CLASS_CHUNK, _CLASS_CHUNK, k),
        axis=(2, 3)) >= score_thresh).astype(jnp.int32)     # [B, C/CH]

    keep = pl.pallas_call(
        _nms_shared_kernel,
        grid=(b // ib,),
        in_specs=[
            pl.BlockSpec((ib, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ib, c_pad, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ib, c_pad // _CLASS_CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ib, c_pad, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_pad, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ib, k, k), jnp.float32)],
        interpret=interpret,
    )(boxes.astype(jnp.float32), scores_ck.astype(jnp.float32), thresh, act)
    return keep[:, :c, :] > 0.5


def batched_nms_shared_pallas(boxes: jax.Array, scores: jax.Array, *,
                              max_out: int = 50, score_thresh: float = 0.5,
                              iou_thresh: float = 0.5,
                              interpret: bool = False) -> Dict[str, jax.Array]:
    """Per-class NMS where every class scores the SAME candidate boxes.

    boxes: [B, K, 4] (any order); scores: [B, K, C].
    Same output contract as batched_nms. This is the fast-detector backend:
    candidates come from the objectness prefilter, so no per-class top_k or
    gather is needed before the kernel.
    """
    b, k, _ = boxes.shape
    c = scores.shape[2]
    keep = nms_keep_mask_shared_pallas(boxes, scores, score_thresh,
                                       iou_thresh, interpret=interpret)
    scores_ck = jnp.swapaxes(scores, 1, 2)                  # [B, C, K]

    if max_out >= k:
        # Every candidate fits in the output: no per-class top_k needed at
        # all (profiled at ~3.4 ms/batch-128 in the fused detector). Rows
        # come out in candidate order, not per-class score order — every
        # consumer (VOC eval, demo drawing) sorts or is order-agnostic.
        sel_scores = jnp.where(keep, scores_ck, 0.0)        # [B, C, K]
        sel_boxes = jnp.broadcast_to(boxes[:, None, :, :], (b, c, k, 4))
        sel_valid = keep
        if max_out > k:
            pad = max_out - k
            sel_boxes = jnp.pad(sel_boxes,
                                ((0, 0), (0, 0), (0, pad), (0, 0)))
            sel_scores = jnp.pad(sel_scores, ((0, 0), (0, 0), (0, pad)))
            sel_valid = jnp.pad(sel_valid, ((0, 0), (0, 0), (0, pad)))
        labels = jnp.broadcast_to(
            jnp.arange(c, dtype=jnp.int32)[None, :, None], (b, c, max_out))
        return {
            "boxes": sel_boxes.reshape(b, c * max_out, 4),
            "scores": sel_scores.reshape(b, c * max_out),
            "labels": labels.reshape(b, c * max_out),
            "valid": sel_valid.reshape(b, c * max_out),
        }

    # final per-class compaction (scores broadcast to [B, C, K])
    out_scores = jnp.where(keep, scores_ck, -jnp.inf)
    m = min(max_out, k)
    sel_scores, sel = jax.lax.top_k(out_scores, m)          # [B, C, M]
    sel_boxes = jnp.take_along_axis(
        boxes[:, None, :, :], sel[..., None], axis=2)
    sel_valid = jnp.isfinite(sel_scores)
    sel_scores = jnp.where(sel_valid, sel_scores, 0.0)
    if m < max_out:
        pad = max_out - m
        sel_boxes = jnp.pad(sel_boxes, ((0, 0), (0, 0), (0, pad), (0, 0)))
        sel_scores = jnp.pad(sel_scores, ((0, 0), (0, 0), (0, pad)))
        sel_valid = jnp.pad(sel_valid, ((0, 0), (0, 0), (0, pad)))
    labels = jnp.broadcast_to(
        jnp.arange(c, dtype=jnp.int32)[None, :, None], (b, c, max_out))
    return {
        "boxes": sel_boxes.reshape(b, c * max_out, 4),
        "scores": sel_scores.reshape(b, c * max_out),
        "labels": labels.reshape(b, c * max_out),
        "valid": sel_valid.reshape(b, c * max_out),
    }


def batched_nms_pallas(boxes: jax.Array, scores: jax.Array, *,
                       max_out: int = 50, pre_topk: int = 256,
                       score_thresh: float = 0.5, iou_thresh: float = 0.5,
                       interpret: bool = False) -> Dict[str, jax.Array]:
    """Drop-in batched per-class NMS with the Pallas suppression kernel.

    Same contract as ops.nms.batched_nms: boxes [B, A, 4], scores [B, A, C]
    -> dict of [B, C*max_out, ...]. XLA stages top-k candidate selection and
    the final per-class compaction; Pallas computes all B*C keep masks in one
    launch.
    """
    b, a, _ = boxes.shape
    c = scores.shape[2]
    k = min(pre_topk, a)

    # [B, C, A]: per-class scores
    scores_t = jnp.swapaxes(scores, 1, 2)
    top_scores, top_idx = jax.lax.top_k(scores_t, k)          # [B, C, K]
    top_boxes = jnp.take_along_axis(
        boxes[:, None, :, :], top_idx[..., None], axis=2)      # [B, C, K, 4]
    valid = top_scores >= score_thresh

    # pad the candidate axis to the TPU lane width with invalid entries
    k_pad = ((k + 127) // 128) * 128
    if k_pad != k:
        pad = k_pad - k
        kern_boxes = jnp.pad(top_boxes, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kern_valid = jnp.pad(valid, ((0, 0), (0, 0), (0, pad)))
    else:
        kern_boxes, kern_valid = top_boxes, valid

    keep = nms_keep_mask_pallas(
        kern_boxes.reshape(b * c, k_pad, 4), kern_valid.reshape(b * c, k_pad),
        iou_thresh, interpret=interpret).reshape(b, c, k_pad)[..., :k]

    out_scores = jnp.where(keep, top_scores, -jnp.inf)
    m = min(max_out, k)
    sel_scores, sel = jax.lax.top_k(out_scores, m)             # [B, C, M]
    sel_boxes = jnp.take_along_axis(top_boxes, sel[..., None], axis=2)
    sel_valid = jnp.isfinite(sel_scores)
    sel_scores = jnp.where(sel_valid, sel_scores, 0.0)
    if m < max_out:
        pad = max_out - m
        sel_boxes = jnp.pad(sel_boxes, ((0, 0), (0, 0), (0, pad), (0, 0)))
        sel_scores = jnp.pad(sel_scores, ((0, 0), (0, 0), (0, pad)))
        sel_valid = jnp.pad(sel_valid, ((0, 0), (0, 0), (0, pad)))
    labels = jnp.broadcast_to(
        jnp.arange(c, dtype=jnp.int32)[None, :, None], (b, c, max_out))
    return {
        "boxes": sel_boxes.reshape(b, c * max_out, 4),
        "scores": sel_scores.reshape(b, c * max_out),
        "labels": labels.reshape(b, c * max_out),
        "valid": sel_valid.reshape(b, c * max_out),
    }
