"""Benchmark: batched YOLOv3-416 COCO inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "images_per_sec_416_inference", "value": N, "unit": "img/s",
   "vs_baseline": N / 43.5}

Baseline: the reference implementation's published ~23 ms per 416x416 image
(~43.5 img/s, Titan XP, batch 1, TF graph incl. GPU NMS — BASELINE.md).
The measured pipeline here is the same end-to-end surface: BN-folded forward
+ anchor decode + score threshold + per-class NMS, batched.

Extra diagnostics (p50 NMS-only latency, per-batch timing) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 43.5


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS
    from yolov3_tensorflow_tpu.models.decode import predict_boxes
    from yolov3_tensorflow_tpu.models.yolov3 import (fold_batch_norm,
                                                     init_yolov3,
                                                     yolov3_forward_folded)
    from yolov3_tensorflow_tpu.ops.postprocess import postprocess

    backend = jax.default_backend()
    _log(f"backend: {backend}, devices: {jax.devices()}")

    num_classes = 80
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    variables = init_yolov3(jax.random.PRNGKey(0), num_classes)
    folded = fold_batch_norm(variables, dtype=jnp.bfloat16)

    use_pallas = backend == "tpu"

    from yolov3_tensorflow_tpu.ops.fast_postprocess import postprocess_prefilter

    def detect(images):
        fmaps = yolov3_forward_folded(folded, images,
                                      compute_dtype=jnp.bfloat16)
        return postprocess_prefilter(
            fmaps, anchors, num_classes, (416, 416), max_out=50,
            box_topk=128, pre_topk=128, score_thresh=0.3, iou_thresh=0.45,
            use_pallas=use_pallas)

    detect_jit = jax.jit(detect)

    best = 0.0
    best_batch = 0
    batches = (64, 128) if backend == "tpu" else (8,)
    rng = np.random.default_rng(0)
    for batch in batches:
        # device-resident input: measures the device pipeline, not the
        # dev-tunnel host link (production feeds via async device_put)
        images = jax.device_put(jnp.asarray(
            rng.uniform(0, 1, (batch, 416, 416, 3)).astype(np.float32)))
        # warmup + compile
        out = detect_jit(images)
        jax.block_until_ready(out)
        # steady state
        iters = 20 if backend == "tpu" else 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = detect_jit(images)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        ips = batch * iters / dt
        _log(f"batch {batch}: {ips:.1f} img/s ({dt / iters * 1e3:.2f} ms/batch)")
        if ips > best:
            best, best_batch = ips, batch

    # NMS-only p50 latency (the postprocess stage in isolation)
    batch = best_batch
    images = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (batch, 416, 416, 3)).astype(np.float32)))
    fmaps = jax.jit(lambda im: yolov3_forward_folded(
        folded, im, compute_dtype=jnp.bfloat16))(images)
    jax.block_until_ready(fmaps)

    def nms_only(fm):
        return postprocess_prefilter(
            fm, anchors, num_classes, (416, 416), max_out=50, box_topk=128,
            pre_topk=128, score_thresh=0.3, iou_thresh=0.45,
            use_pallas=use_pallas)

    nms_jit = jax.jit(nms_only)
    jax.block_until_ready(nms_jit(fmaps))
    # pipelined timing: per-call blocking would measure the host-device RPC
    # round trip, not the kernel
    times = []
    for _ in range(5 if backend == "tpu" else 2):
        t0 = time.perf_counter()
        out = None
        for _ in range(10):
            out = nms_jit(fmaps)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / 10)
    p50_ms = float(np.median(times)) * 1e3
    _log(f"decode+NMS p50: {p50_ms:.2f} ms/batch of {batch} "
         f"({p50_ms / batch:.3f} ms/img)")

    print(json.dumps({
        "metric": "images_per_sec_416_inference",
        "value": round(best, 1),
        "unit": "img/s",
        "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
