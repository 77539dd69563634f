"""Experiment: stem-int8 hybrid serving forward throughput vs pure bf16.

Measures the packed-head detector at batch 128 with the early backbone
executed int8-chained up to conv_{upto-1}, for several handoff points.
Chained-differential timing (see bench.py methodology).

Usage: python scripts/exp_stem_int8.py [--batch 128] [--upto 4 9 12]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, images, n1=5, n2=25):
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
    for _ in range(3):
        t1, t2 = run(n1), run(n2)
        diffs.append((t2 - t1) / (n2 - n1))
    return max(min(diffs), 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--upto", type=int, nargs="+", default=[4, 9, 12])
    args = p.parse_args()
    b = args.batch

    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS
    from yolov3_tensorflow_tpu.models.yolov3 import (fold_batch_norm,
                                                     init_yolov3)
    from yolov3_tensorflow_tpu.ops.fast_postprocess import (
        pack_serving_head, postprocess_packed, yolov3_forward_packed)
    from yolov3_tensorflow_tpu.ops.quantize import (
        build_stem_int8_packed, calibrate_activation_scales,
        yolov3_forward_stem_int8_packed)

    num_classes = 80
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    variables = init_yolov3(jax.random.PRNGKey(0), num_classes)
    folded = fold_batch_norm(variables, dtype=jnp.bfloat16)
    packed = pack_serving_head(folded, num_classes)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (b, 416, 416, 3)).astype(np.float32)))
    scales = calibrate_activation_scales(variables, images[:8])

    def post(outs, feedback):
        return postprocess_packed(
            outs, anchors, num_classes, (416, 416), max_out=128,
            box_topk=64, score_thresh=0.3 + feedback * 0.0, iou_thresh=0.45,
            approx_topk=True, use_pallas=True)

    @jax.jit
    def detect_bf16(images, feedback):
        out = post(yolov3_forward_packed(packed, images), feedback)
        return out, out["scores"][0, 0]

    t = measure(detect_bf16, images)
    print(f"bf16 packed:        {t*1e3:7.2f} ms/batch  {b/t:7.1f} img/s",
          flush=True)

    for upto in args.upto:
        hp = build_stem_int8_packed(variables, scales, num_classes, upto=upto)

        @jax.jit
        def detect_h(images, feedback, hp=hp):
            out = post(yolov3_forward_stem_int8_packed(hp, images), feedback)
            return out, out["scores"][0, 0]

        t = measure(detect_h, images)
        print(f"stem-int8 upto={upto:2d}:  {t*1e3:7.2f} ms/batch  "
              f"{b/t:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
