"""Benchmark: batched YOLOv3-416 COCO inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "images_per_sec_416_inference", "value": N, "unit": "img/s",
   "vs_baseline": N / 43.5}

Baseline: the reference implementation's published ~23 ms per 416x416 image
(~43.5 img/s, Titan XP, batch 1, TF graph incl. GPU NMS — BASELINE.md). The
measured pipeline is the same end-to-end surface: forward + anchor decode +
score threshold + per-class NMS, batched.

The headline number is the default serving configuration: the packed head
with the HBM-bandwidth-bound early backbone (conv_0..conv_11) executed
int8-chained and everything from the 52^2 stage on in bf16 (the "stem8"
mode of ops/postprocess.build_detector). That early-stage int8 is a serving
approximation with measured evidence behind it: on the trained overfit-gate
checkpoint the hybrid's mAP delta vs the exact bf16 path is recorded by
scripts/validate_quantized.py (docs/results/quantize_validation.json,
detection-identity + max-score-deviation columns). The pure-bf16 packed
path and the full-int8 PTQ mode are also measured and reported on stderr
so the record always carries all three numbers.

Timing methodology (important on this dev tunnel): iterations are CHAINED
through a scalar data dependency and synced by fetching bytes to host;
per-iteration time is the differential (T(N2)-T(N1))/(N2-N1), which cancels
fixed dispatch/fetch overhead. Plain block_until_ready through the tunnel
returns before execution finishes and both under- and over-reports.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 43.5


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _measure_chained(fn, images, n1: int = 5, n2: int = 25) -> float:
    """Per-iteration seconds of fn(images, feedback) -> (out, scalar)."""
    import jax
    import jax.numpy as jnp

    out, fb = fn(images, jnp.float32(0))
    np.asarray(fb)  # compile + full sync

    def run(n):
        fb = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            out, fb = fn(images, fb)
        np.asarray(fb)
        return time.perf_counter() - t0

    # independent differentials; take the min (clock/thermal noise on a
    # shared dev chip only ever inflates the measurement)
    diffs = []
    for _ in range(3):
        t1, t2 = run(n1), run(n2)
        diffs.append((t2 - t1) / (n2 - n1))
    return max(min(diffs), 1e-9)


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, nargs=2, default=[416, 416],
                   metavar=("H", "W"),
                   help="inference resolution (e.g. --size 608 608 or "
                        "--size 896 1344); default 416 416 (the driver's "
                        "headline configuration)")
    p.add_argument("--batches", type=str, default="",
                   help="comma-separated batch sizes (default: 64,128 on TPU)")
    args = p.parse_args(argv)
    img_h, img_w = args.size

    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS
    from yolov3_tensorflow_tpu.models.yolov3 import (fold_batch_norm,
                                                     init_yolov3,
                                                     yolov3_forward_folded)
    from yolov3_tensorflow_tpu.ops.fast_postprocess import (
        pack_serving_head, postprocess_packed, postprocess_prefilter,
        yolov3_forward_packed)

    backend = jax.default_backend()
    _log(f"backend: {backend}, devices: {jax.devices()}, "
         f"size: {img_h}x{img_w}")

    num_classes = 80
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    variables = init_yolov3(jax.random.PRNGKey(0), num_classes)
    folded = fold_batch_norm(variables, dtype=jnp.bfloat16)
    packed = pack_serving_head(folded, num_classes)
    use_pallas = backend == "tpu"
    rng = np.random.default_rng(0)

    # serving config: packed detection head, 64 objectness-prefiltered
    # candidates, approx top-k, Pallas shared-candidate NMS (candidates
    # padded to its 128-lane width), every surviving candidate emitted
    # (max_out >= padded K skips the per-class compaction top_k entirely)
    #
    # Iteration chaining rides the (scalar) score threshold: every
    # iteration's NMS depends on the previous iteration's output, so the
    # final fetched scalar transitively depends on all N executions (nothing
    # can be elided), without paying a full-image add pass per iteration
    # (chaining through the input cost a measurable 0.65 ms/batch of
    # HBM-bandwidth scaffolding that the real detector does not have).
    @jax.jit
    def detect_bf16(images, feedback):
        outs = yolov3_forward_packed(packed, images)
        out = postprocess_packed(
            outs, anchors, num_classes, (img_h, img_w), max_out=128,
            box_topk=64, score_thresh=0.3 + feedback * 0.0, iou_thresh=0.45,
            approx_topk=use_pallas, use_pallas=use_pallas)
        return out, out["scores"][0, 0]

    best = 0.0
    best_batch = 0
    best_mode = "bf16"
    if args.batches:
        batches = tuple(int(b) for b in args.batches.split(","))
    else:
        # 128 is the measured throughput knee on v5e: scanned 64 (1698
        # img/s), 96 (1887), 128 (~2000-2017), 160 (1736), 192 (1723),
        # 256 (1837); larger batches fall off a VMEM/scheduling cliff.
        batches = (128,) if backend == "tpu" else (4,)
    for batch in batches:
        images = jax.device_put(jnp.asarray(
            rng.uniform(0, 1, (batch, img_h, img_w, 3)).astype(np.float32)))
        if backend != "tpu":
            dt = _measure_chained(detect_bf16, images, 1, 3)
        else:
            dt = _measure_chained(detect_bf16, images)
        ips = batch / dt
        _log(f"bf16 batch {batch}: {ips:.1f} img/s ({dt * 1e3:.2f} ms/batch)")
        if ips > best:
            best, best_batch = ips, batch

    if backend == "tpu":
        # stem-int8 hybrid: int8-chained conv_0..conv_11, bf16 rest (the
        # serving default; headline when it wins — it harvests the measured
        # 416^2/208^2/104^2 HBM-bandwidth headroom, see ops/quantize.py)
        from yolov3_tensorflow_tpu.ops.quantize import (
            build_stem_int8_packed, calibrate_activation_scales,
            yolov3_forward_stem_int8_packed)
        batch = best_batch
        images = jax.device_put(jnp.asarray(
            rng.uniform(0, 1, (batch, img_h, img_w, 3)).astype(np.float32)))
        scales = calibrate_activation_scales(variables, images[:8])
        hp = build_stem_int8_packed(variables, scales, num_classes, upto=12)

        @jax.jit
        def detect_stem8(images, feedback):
            outs = yolov3_forward_stem_int8_packed(hp, images)
            out = postprocess_packed(
                outs, anchors, num_classes, (img_h, img_w), max_out=128,
                box_topk=64, score_thresh=0.3 + feedback * 0.0,
                iou_thresh=0.45, approx_topk=True, use_pallas=use_pallas)
            return out, out["scores"][0, 0]

        dth = _measure_chained(detect_stem8, images)
        ips = batch / dth
        _log(f"stem-int8 hybrid (upto=12) batch {batch}: {ips:.1f} img/s "
             f"({dth * 1e3:.2f} ms/batch)")
        if ips > best:
            best, best_mode = ips, "stem_int8_hybrid"

    if backend == "tpu":
        # int8 PTQ serving mode (stderr diagnostic; see module docstring)
        from yolov3_tensorflow_tpu.ops.quantize import (
            quantize_model, yolov3_forward_int8_packed)
        qpacked = pack_serving_head(quantize_model(variables, scales),
                                    num_classes)

        @jax.jit
        def detect_int8(images, feedback):
            outs = yolov3_forward_int8_packed(qpacked, images)
            out = postprocess_packed(
                outs, anchors, num_classes, (img_h, img_w), max_out=128,
                box_topk=64, score_thresh=0.3 + feedback * 0.0,
                iou_thresh=0.45, approx_topk=True, use_pallas=use_pallas)
            return out, out["scores"][0, 0]

        dt8 = _measure_chained(detect_int8, images)
        _log(f"int8 batch {batch}: {batch / dt8:.1f} img/s "
             f"({dt8 * 1e3:.2f} ms/batch)")

        # decode+NMS-only p50 (postprocess stage in isolation)
        fmaps = jax.jit(lambda im: yolov3_forward_folded(
            folded, im, compute_dtype=jnp.bfloat16))(images)
        np.asarray(fmaps[0][0, 0, 0, 0].astype(jnp.float32))

        @jax.jit
        def nms_only(fm, feedback):
            out = postprocess_prefilter(
                fm, anchors, num_classes, (img_h, img_w), max_out=50,
                box_topk=128, pre_topk=128,
                score_thresh=0.3 + feedback * 0.0, iou_thresh=0.45,
                use_pallas=use_pallas, approx_topk=use_pallas)
            return out, out["scores"][0, 0]

        dtn = _measure_chained(lambda im, fb: nms_only(fmaps, fb), images)
        _log(f"decode+NMS p50: {dtn * 1e3:.2f} ms/batch of {batch} "
             f"({dtn / batch * 1e3:.3f} ms/img)")

    print(json.dumps({
        "metric": "images_per_sec_416_inference",
        "value": round(best, 1),
        "unit": "img/s",
        "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 2),
        "mode": best_mode,
    }))


if __name__ == "__main__":
    main()
