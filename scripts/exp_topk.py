"""Round-5 isolation: what exactly costs inside the packed postprocess?

Measures, each from PRECOMPUTED device-resident operands (chained):
  score-only        objectness from packed outs (sum-reduced, no DCE)
  topk-approx       approx_max_k(64) from a precomputed [B, A] obj tensor
  topk-exact        top_k(64) from the same
  topk-approx@r     approx_max_k at recall 0.85 / 0.7
  gather+decode     candidate rows + box decode from precomputed cand_idx
  nms               Pallas shared NMS from precomputed boxes/scores
  score->topk       score + topk fused in one jit (what the pipeline pays)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, *args, n1=5, n2=25, reps=3):
    import jax.numpy as jnp
    fb = fn(*args, jnp.float32(0))
    np.asarray(fb)

    def run(n):
        fb = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            fb = fn(*args, fb)
        np.asarray(fb)
        return time.perf_counter() - t0

    diffs = []
    for _ in range(reps):
        t1, t2 = run(n1), run(n2)
        diffs.append((t2 - t1) / (n2 - n1))
    return max(min(diffs), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS
    from yolov3_tensorflow_tpu.models.yolov3 import fold_batch_norm, init_yolov3
    from yolov3_tensorflow_tpu.ops import fast_postprocess as fpp

    b, num_classes = 128, 80
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    variables = init_yolov3(jax.random.PRNGKey(0), num_classes)
    folded = fold_batch_norm(variables, dtype=jnp.bfloat16)
    packed = fpp.pack_serving_head(folded, num_classes)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (b, 416, 416, 3)).astype(np.float32)))
    row = fpp.head_row_width(num_classes)
    c = num_classes

    packed_outs = jax.jit(
        lambda im: fpp.yolov3_forward_packed(packed, im))(images)
    for x in packed_outs:
        x.block_until_ready()
    np.asarray(packed_outs[0][0, 0, 0, 0].astype(jnp.float32))

    lane = jax.lax.broadcasted_iota(jnp.int32, (row,), 0)

    def scores_cm(po, dtype=jnp.float32):
        neg = jnp.asarray(-jnp.inf, po[0].dtype)
        objs = []
        for p_ in po:
            bb, hg, wg, _ = p_.shape
            pc = p_.reshape(bb, hg * wg, 3 * row)
            obj_a = []
            for a3 in range(3):
                blk = pc[..., a3 * row:(a3 + 1) * row]
                lane_max = jnp.max(jnp.where(lane < c, blk, neg),
                                   axis=-1).astype(dtype)
                conf = blk[..., c].astype(dtype)
                obj_a.append(jax.nn.sigmoid(conf) * jax.nn.sigmoid(lane_max))
            objs.append(jnp.stack(obj_a, axis=-1).reshape(bb, hg * wg * 3))
        return jnp.concatenate(objs, axis=1)

    @jax.jit
    def s_score(po, fb):
        po = tuple(x + fb.astype(x.dtype) for x in po)
        return jnp.sum(scores_cm(po))

    print(f"score-only (cell-major): {measure(s_score, packed_outs)*1e3:7.2f} ms",
          flush=True)

    obj = jax.jit(lambda po: scores_cm(po))(packed_outs)
    obj.block_until_ready()
    np.asarray(obj[0, 0])

    def topk_of(kind, recall=0.95):
        @jax.jit
        def f(o, fb):
            o = o + fb
            if kind == "approx":
                _, idx = jax.lax.approx_max_k(o, 64, recall_target=recall)
            else:
                _, idx = jax.lax.top_k(o, 64)
            return idx[0, 0].astype(jnp.float32)
        return f

    print(f"topk-approx(0.95):       {measure(topk_of('approx'), obj)*1e3:7.2f} ms", flush=True)
    print(f"topk-approx(0.85):       {measure(topk_of('approx', 0.85), obj)*1e3:7.2f} ms", flush=True)
    print(f"topk-approx(0.70):       {measure(topk_of('approx', 0.70), obj)*1e3:7.2f} ms", flush=True)
    print(f"topk-exact:              {measure(topk_of('exact'), obj)*1e3:7.2f} ms", flush=True)

    @jax.jit
    def s_score_topk(po, fb):
        po = tuple(x + fb.astype(x.dtype) for x in po)
        _, idx = jax.lax.approx_max_k(scores_cm(po), 64, recall_target=0.95)
        return idx[0, 0].astype(jnp.float32)

    print(f"score->topk fused:       {measure(s_score_topk, packed_outs)*1e3:7.2f} ms", flush=True)

    _, cand_idx = jax.jit(lambda o: jax.lax.approx_max_k(o, 64))(obj)
    cand_idx.block_until_ready()
    np.asarray(cand_idx[0, 0])

    offsets, cells = [], []
    off = 0
    for p_ in packed_outs:
        _, hg, wg, _ = p_.shape
        offsets.append(off)
        cells.append(hg * wg)
        off += hg * wg * 3

    @jax.jit
    def s_gather(po, idx, fb):
        po = tuple(x + fb.astype(x.dtype) for x in po)
        pcs = [p_.reshape(p_.shape[0], -1, 3 * row) for p_ in po]
        rows = fpp._gather_cells_per_scale(pcs, idx, offsets, cells, row)
        return jnp.sum(rows[0, 0].astype(jnp.float32))

    print(f"gather-only:             {measure(lambda po, fb: s_gather(po, cand_idx, fb), packed_outs)*1e3:7.2f} ms", flush=True)

    # NMS from precomputed boxes/scores
    boxes = jnp.asarray(rng.uniform(0, 416, (b, 128, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 20.0)
    scr = jnp.asarray((rng.uniform(0, 1, (b, 128, c)) ** 4).astype(np.float32))
    boxes, scr = jax.device_put(boxes), jax.device_put(scr)

    from yolov3_tensorflow_tpu.ops.nms_pallas import batched_nms_shared_pallas

    @jax.jit
    def s_nms(bx, sc, fb):
        out = batched_nms_shared_pallas(
            bx, sc + fb * 0.0, max_out=128, score_thresh=0.3, iou_thresh=0.45)
        return out["scores"][0, 0]

    print(f"nms-only (synthetic):    {measure(lambda bx, fb: s_nms(bx, scr, fb), boxes)*1e3:7.2f} ms", flush=True)

    # full postprocess from packed outs, and forward alone, for the delta
    @jax.jit
    def s_post(po, fb):
        out = fpp.postprocess_packed(
            tuple(x + fb.astype(x.dtype) for x in po), anchors, num_classes,
            (416, 416), max_out=128, box_topk=64, score_thresh=0.3,
            iou_thresh=0.45, approx_topk=True, use_pallas=True,
            cell_major=True)
        return out["scores"][0, 0]

    print(f"full postprocess:        {measure(s_post, packed_outs)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
