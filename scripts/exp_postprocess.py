"""Round-5 experiment: trim the packed-path postprocess (score+topk stage).

The r4 profile put the packed postprocess at ~4.2 ms/batch-128 end-to-end
with ~2.5 ms in the score+approx-topk stage. Hypothesis: the per-anchor
reshape [B,Hg,Wg,3*row] -> [B,Hg*Wg*3,row] is NOT layout-free (the anchor
index interleaves into the sublane dimension), so the score stage pays a
full relayout of the ~349 MB of packed head outputs. A cell-major
formulation ([B,Hg*Wg,3*row] is a free reshape; each anchor block is a
lane-tile-aligned static slice) reads the conv outputs in their native
layout.

Variants measured end-to-end (full detector, chained-differential):
  A  current postprocess_packed (per-anchor reshape)
  B  cell-major score + cell-gather (postprocess_packed_cm)
  C  B with bf16 objectness scores
Plus a batch sweep for the winner.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, images, n1=5, n2=25, reps=3):
    import jax.numpy as jnp
    out, fb = fn(images, jnp.float32(0))
    np.asarray(fb)

    def run(n):
        fb = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            out, fb = fn(images, fb)
        np.asarray(fb)
        return time.perf_counter() - t0

    diffs = []
    for _ in range(reps):
        t1, t2 = run(n1), run(n2)
        diffs.append((t2 - t1) / (n2 - n1))
    return max(min(diffs), 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--sweep", type=str, default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS
    from yolov3_tensorflow_tpu.models.yolov3 import fold_batch_norm, init_yolov3
    from yolov3_tensorflow_tpu.ops import fast_postprocess as fpp

    num_classes = 80
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    variables = init_yolov3(jax.random.PRNGKey(0), num_classes)
    folded = fold_batch_norm(variables, dtype=jnp.bfloat16)
    packed = fpp.pack_serving_head(folded, num_classes)
    rng = np.random.default_rng(0)
    use_pallas = jax.default_backend() == "tpu"

    def detector(post_kwargs):
        @jax.jit
        def f(images, feedback):
            outs = fpp.yolov3_forward_packed(packed, images)
            out = fpp.postprocess_packed(
                outs, anchors, num_classes, (416, 416), max_out=128,
                box_topk=64, score_thresh=0.3 + feedback * 0.0,
                iou_thresh=0.45, approx_topk=use_pallas,
                use_pallas=use_pallas, **post_kwargs)
            return out, out["scores"][0, 0]
        return f

    variants = [
        ("A per-anchor (current)", {"cell_major": False}),
        ("B cell-major", {"cell_major": True}),
        ("C cell-major bf16 score", {"cell_major": True, "score_dtype": "bf16"}),
    ]

    if args.sweep:
        batches = [int(x) for x in args.sweep.split(",")]
        images_of = {b: jax.device_put(jnp.asarray(
            rng.uniform(0, 1, (b, 416, 416, 3)).astype(np.float32)))
            for b in batches}
        for b in batches:
            f = detector({"cell_major": True})
            dt = measure(f, images_of[b])
            print(f"cell-major batch {b}: {b/dt:.1f} img/s "
                  f"({dt*1e3:.2f} ms/batch)", flush=True)
        return

    b = args.batch
    images = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (b, 416, 416, 3)).astype(np.float32)))
    for name, kw in variants:
        try:
            f = detector(kw)
            dt = measure(f, images)
            print(f"{name}: {b/dt:.1f} img/s ({dt*1e3:.2f} ms/batch)",
                  flush=True)
        except TypeError as e:
            print(f"{name}: skipped ({e})", flush=True)


if __name__ == "__main__":
    main()
