"""Round-5: IN-PIPELINE incremental cost of each packed-postprocess stage.

Measures complete jitted programs (forward + progressively more of the
postprocess), all chained through a scalar feedback into the score
threshold (the production detector's own chaining trick — no operand copy
tax). Differences between consecutive rows are the true in-pipeline cost of
each stage, including whatever fusion XLA manages.

  fwd          packed forward, fetch one element per scale
  +score       + objectness over all anchors (sum-reduced)
  +topk        + approx_max_k(64)  [also at recall 0.85]
  +gather      + candidate rows + decode to boxes/scores
  +nms         + Pallas shared NMS + compaction (= the full detector)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, images, n1=5, n2=25, reps=3):
    import jax.numpy as jnp
    fb = fn(images, jnp.float32(0))
    np.asarray(fb)

    def run(n):
        fb = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            fb = fn(images, fb)
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
    lane = jax.lax.broadcasted_iota(jnp.int32, (row,), 0)

    def fwd(im):
        return fpp.yolov3_forward_packed(packed, im)

    def scores_cm(po, sdt=jnp.float32):
        neg = jnp.asarray(-jnp.inf, po[0].dtype)
        objs = []
        for p_ in po:
            bb, hg, wg, _ = p_.shape
            pc = p_.reshape(bb, hg * wg, 3 * row)
            obj_a = []
            for a3 in range(3):
                blk = pc[..., a3 * row:(a3 + 1) * row]
                lane_max = jnp.max(jnp.where(lane < c, blk, neg),
                                   axis=-1).astype(sdt)
                conf = blk[..., c].astype(sdt)
                obj_a.append(jax.nn.sigmoid(conf) * jax.nn.sigmoid(lane_max))
            objs.append(jnp.stack(obj_a, axis=-1).reshape(bb, hg * wg * 3))
        return jnp.concatenate(objs, axis=1)

    @jax.jit
    def s_fwd(im, fb):
        po = fwd(im + fb * 0.0)
        return sum(x[0, 0, 0, 0].astype(jnp.float32) for x in po)

    def s_score_of(sdt):
        @jax.jit
        def f(im, fb):
            po = fwd(im + fb * 0.0)
            return jnp.sum(scores_cm(po, sdt).astype(jnp.float32))
        return f

    def s_topk_of(sdt, recall):
        @jax.jit
        def f(im, fb):
            po = fwd(im + fb * 0.0)
            _, idx = jax.lax.approx_max_k(scores_cm(po, sdt), 64,
                                          recall_target=recall)
            return jnp.sum(idx[:, 0].astype(jnp.float32))
        return f

    def post_of(**kw):
        @jax.jit
        def f(im, fb):
            po = fwd(im)
            out = fpp.postprocess_packed(
                po, anchors, c, (416, 416), max_out=128, box_topk=64,
                score_thresh=0.3 + fb * 0.0, iou_thresh=0.45,
                approx_topk=True, use_pallas=True, cell_major=True, **kw)
            return out["scores"][0, 0]
        return f

    stages = [
        ("fwd only", s_fwd),
        ("+score fp32", s_score_of(jnp.float32)),
        ("+score bf16", s_score_of(jnp.bfloat16)),
        ("+topk  (bf16, r.95)", s_topk_of(jnp.bfloat16, 0.95)),
        ("+topk  (bf16, r.85)", s_topk_of(jnp.bfloat16, 0.85)),
        ("full   (fp32 score)", post_of()),
        ("full   (bf16 score)", post_of(score_dtype="bf16")),
    ]
    for name, fn in stages:
        dt = measure(fn, images)
        print(f"{name:<24s} {dt*1e3:8.2f} ms/batch ({b/dt:7.1f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
