"""Experiment: int8 serving policy at high resolution (VERDICT r2 weak #4).

Round 2 found `--dtype int8` (per-layer quantize/dequant around every conv)
is SLOWER than bf16 at 896x1344 (148 vs 200 img/s): the dequant/requant
passes are pure HBM bandwidth, and at high resolution the low-channel
layers are bandwidth-bound. Candidate fixes measured here, all on the packed
serving head at a given size:

  bf16           pure bf16 (the round-2 winner at 896x1344)
  int8-packed    per-layer quantize/dequant (the round-2 loser)
  stem8 upto=K   int8-CHAINED early backbone, bf16 from conv_K on — int8
                 activations stay int8 across the bandwidth-bound stem (no
                 per-layer round trips), the MXU-bound deep layers keep bf16

Usage: python scripts/exp_highres_int8.py [--size 896 1344] [--batch 16]
       [--upto 9 12 15]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, images, n1=3, n2=13):
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
    p.add_argument("--size", type=int, nargs=2, default=[896, 1344])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--upto", type=int, nargs="+", default=[9, 12, 15])
    args = p.parse_args()
    b = args.batch
    img_h, img_w = args.size

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
        build_stem_int8_packed, calibrate_activation_scales, quantize_model,
        yolov3_forward_int8_packed, yolov3_forward_stem_int8_packed)

    num_classes = 80
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    variables = init_yolov3(jax.random.PRNGKey(0), num_classes)
    folded = fold_batch_norm(variables, dtype=jnp.bfloat16)
    packed = pack_serving_head(folded, num_classes)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (b, img_h, img_w, 3)).astype(np.float32)))
    scales = calibrate_activation_scales(variables, images[:4])
    qpacked = pack_serving_head(quantize_model(variables, scales),
                                num_classes)

    def post(outs, feedback):
        return postprocess_packed(
            outs, anchors, num_classes, (img_h, img_w), max_out=128,
            box_topk=64, score_thresh=0.3 + feedback * 0.0, iou_thresh=0.45,
            approx_topk=True, use_pallas=True)

    @jax.jit
    def d_bf16(images, feedback):
        out = post(yolov3_forward_packed(packed, images), feedback)
        return out, out["scores"][0, 0]

    @jax.jit
    def d_int8(images, feedback):
        out = post(yolov3_forward_int8_packed(qpacked, images), feedback)
        return out, out["scores"][0, 0]

    t = measure(d_bf16, images)
    print(f"{img_h}x{img_w} bf16:          {t*1e3:8.2f} ms/batch "
          f"{b/t:7.1f} img/s", flush=True)
    t = measure(d_int8, images)
    print(f"{img_h}x{img_w} int8-packed:   {t*1e3:8.2f} ms/batch "
          f"{b/t:7.1f} img/s", flush=True)

    for upto in args.upto:
        hp = build_stem_int8_packed(variables, scales, num_classes,
                                    upto=upto)

        @jax.jit
        def d_h(images, feedback, hp=hp):
            out = post(yolov3_forward_stem_int8_packed(hp, images), feedback)
            return out, out["scores"][0, 0]

        t = measure(d_h, images)
        print(f"{img_h}x{img_w} stem8 upto={upto:<3d} {t*1e3:8.2f} ms/batch "
              f"{b/t:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
