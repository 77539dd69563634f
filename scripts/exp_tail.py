"""Round-5: standalone cost of the packed-postprocess TAIL stages.

The in-pipeline increments (exp_pp_incr) put forward+score+topk at 60.9
ms/batch-128 vs 64.4 for the full detector: ~3.5 ms live in gather + decode
+ NMS + output compaction. This isolates each, chaining through SMALL
operands only (no full-tensor copy tax):

  gather+decode   candidate rows from packed outs (chain via cand_idx)
  nms kernel      Pallas shared NMS from boxes/scores (chain via scores)
  nms + outputs   + the max_out>=K no-topk compaction
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

    b, c = 128, 80
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    variables = init_yolov3(jax.random.PRNGKey(0), c)
    packed = fpp.pack_serving_head(fold_batch_norm(variables, jnp.bfloat16), c)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (b, 416, 416, 3)).astype(np.float32)))
    row = fpp.head_row_width(c)

    packed_outs = jax.jit(
        lambda im: fpp.yolov3_forward_packed(packed, im))(images)
    for x in packed_outs:
        x.block_until_ready()
    np.asarray(packed_outs[0][0, 0, 0, 0].astype(jnp.float32))

    offsets, cells = [], []
    off = 0
    for p_ in packed_outs:
        _, hg, wg, _ = p_.shape
        offsets.append(off)
        cells.append(hg * wg)
        off += hg * wg * 3
    a_total = off
    cand_idx = jax.device_put(jnp.asarray(
        rng.integers(0, a_total, (b, 64)).astype(np.int32)))

    tables = tuple(jnp.asarray(t) for t in fpp._decode_tables(
        416, 416, tuple(anchors.reshape(-1).tolist())))

    @jax.jit
    def s_gather_decode(po, idx, fb):
        idx = jnp.clip(idx + fb.astype(jnp.int32), 0, a_total - 1)  # tiny chain
        pcs = [p_.reshape(p_.shape[0], -1, 3 * row) for p_ in po]
        rows = fpp._gather_cells_per_scale(pcs, idx, offsets, cells, row)
        tx, ty, rw, rh, aw, ah = tables
        gx = jnp.take(tx, idx)
        gy = jnp.take(ty, idx)
        box = rows[..., c + 1:c + 5].astype(jnp.float32)
        cx = (jax.nn.sigmoid(box[..., 0]) + gx) * jnp.take(rw, idx)
        cy = (jax.nn.sigmoid(box[..., 1]) + gy) * jnp.take(rh, idx)
        w = jnp.exp(box[..., 2]) * jnp.take(aw, idx)
        h = jnp.exp(box[..., 3]) * jnp.take(ah, idx)
        conf = jax.nn.sigmoid(rows[..., c].astype(jnp.float32))
        probs = jax.nn.sigmoid(rows[..., :c].astype(jnp.float32))
        return (jnp.sum(cx[:, 0] + cy[:, 0] + w[:, 0] + h[:, 0])
                + jnp.sum(conf[:, 0]) + jnp.sum(probs[:, 0, 0]))

    t = measure(lambda po, fb: s_gather_decode(po, cand_idx, fb), packed_outs)
    print(f"gather+decode:        {t*1e3:7.2f} ms", flush=True)

    # realistic boxes/scores for the NMS stage (few overlaps, sparse scores)
    boxes_np = rng.uniform(0, 380, (b, 128, 4)).astype(np.float32)
    boxes_np[..., 2:] = boxes_np[..., :2] + rng.uniform(10, 40, (b, 128, 2))
    scr_np = (rng.uniform(0, 1, (b, 128, c)) ** 6).astype(np.float32)
    boxes = jax.device_put(jnp.asarray(boxes_np))
    scr = jax.device_put(jnp.asarray(scr_np))

    from yolov3_tensorflow_tpu.ops.nms_pallas import (
        batched_nms_shared_pallas, nms_keep_mask_shared_pallas)

    @jax.jit
    def s_keep(bx, sc, fb):
        keep = nms_keep_mask_shared_pallas(bx, sc + fb * 0.0,
                                           0.3, 0.45)
        return jnp.sum(keep[:, 0, :].astype(jnp.float32))

    t = measure(lambda bx, fb: s_keep(bx, scr, fb), boxes)
    print(f"nms keep-mask only:   {t*1e3:7.2f} ms", flush=True)

    @jax.jit
    def s_nms_full(bx, sc, fb):
        out = batched_nms_shared_pallas(
            bx, sc + fb * 0.0, max_out=128, score_thresh=0.3, iou_thresh=0.45)
        return out["scores"][0, 0] + out["boxes"][0, 0, 0]

    t = measure(lambda bx, fb: s_nms_full(bx, scr, fb), boxes)
    print(f"nms + compaction:     {t*1e3:7.2f} ms", flush=True)

    # K=64 (true candidate count, no 128 pad): sublane-halved kernel masks
    boxes64 = jax.device_put(jnp.asarray(boxes_np[:, :64]))
    scr64 = jax.device_put(jnp.asarray(scr_np[:, :64]))

    @jax.jit
    def s_keep64(bx, sc, fb):
        keep = nms_keep_mask_shared_pallas(bx, sc + fb * 0.0, 0.3, 0.45)
        return jnp.sum(keep[:, 0, :].astype(jnp.float32))

    t = measure(lambda bx, fb: s_keep64(bx, scr64, fb), boxes64)
    print(f"nms keep-mask K=64:   {t*1e3:7.2f} ms", flush=True)

    @jax.jit
    def s_nms_full64(bx, sc, fb):
        out = batched_nms_shared_pallas(
            bx, sc + fb * 0.0, max_out=128, score_thresh=0.3, iou_thresh=0.45)
        return out["scores"][0, 0] + out["boxes"][0, 0, 0]

    t = measure(lambda bx, fb: s_nms_full64(bx, scr64, fb), boxes64)
    print(f"nms + compact K=64:   {t*1e3:7.2f} ms", flush=True)

    # one-hot MXU gather vs the row-gather above
    @jax.jit
    def s_gather_onehot(po, idx, fb):
        idx = jnp.clip(idx + fb.astype(jnp.int32), 0, a_total - 1)
        rows = None
        for p_, off, nc in zip(po, offsets, cells):
            pc = p_.reshape(p_.shape[0], nc, 3 * row)
            local = jnp.clip(idx - off, 0, nc * 3 - 1)
            cell = local // 3
            onehot = jax.nn.one_hot(cell, nc, dtype=pc.dtype)   # [B,K,nc]
            g = jnp.einsum("bkn,bnd->bkd", onehot, pc)          # MXU gather
            a_l = local % 3
            g = fpp._select_anchor_block(g, a_l, row, 3)
            in_scale = ((idx >= off) & (idx < off + nc * 3))[..., None]
            rows = g if rows is None else jnp.where(in_scale, g, rows)
        return jnp.sum(rows[:, 0, :8].astype(jnp.float32))

    t = measure(lambda po, fb: s_gather_onehot(po, cand_idx, fb), packed_outs)
    print(f"gather one-hot MXU:   {t*1e3:7.2f} ms", flush=True)

    # how much of the keep-mask time is the score transpose + act staging?
    scr_ck = jax.device_put(jnp.swapaxes(scr, 1, 2))

    @jax.jit
    def s_stage(sc, fb):
        sck = jnp.swapaxes(sc + fb * 0.0, 1, 2)
        act = (jnp.max(sck.reshape(b, 80 // 16, 16, 128), axis=(2, 3))
               >= 0.3).astype(jnp.int32)
        return jnp.sum(sck[:, 0, 0]) + jnp.sum(act.astype(jnp.float32))

    t = measure(lambda sc, fb: s_stage(sc, fb), scr)
    print(f"transpose+act only:   {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
