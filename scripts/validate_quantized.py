"""Validate int8 PTQ accuracy + approx_topk detection identity on a real
trained checkpoint (the overfit-gate model).

Round-1 shipped int8 serving and the approx_max_k prefilter with throughput
numbers but no accuracy evidence (random weights only). This script closes
that: on the overfit-gate checkpoint + its 50-image synthetic set it reports

1. bf16 mAP through the exact eval NMS path (sanity anchor vs the gate)
2. int8 PTQ mAP through the identical decode/NMS (target: within 1 point)
3. approx_topk vs exact-topk prefilter postprocess: detection identity rate
   at serving thresholds on real score distributions
4. the packed serving head (mode=packed, box_topk=64, approx_topk — the
   bench configuration) vs the exact prefilter path: detection identity
   rate, validating the whole-block lane-max selection heuristic and the
   bf16 box logits on a trained model

  python scripts/validate_quantized.py \
      --ckpt ./data/overfit/ckpt/overfit_final \
      --data ./data/overfit/data/train.txt [--names .../synth.names]

Prints one JSON summary line; writes <out>/quantize_validation.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data", required=True, help="annotation txt")
    p.add_argument("--names", default="")
    p.add_argument("--img_size", type=int, default=416)
    p.add_argument("--stem_upto", type=int, default=12,
                   help="conv index boundary of the stem-int8 hybrid under "
                        "test; MUST match the benched configuration "
                        "(bench.py builds upto=12) so the accuracy claim is "
                        "tied to the exact headline config — recorded in "
                        "the output artifact")
    p.add_argument("--out", default="./data/overfit")
    args = p.parse_args(argv)

    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.cli.common import load_variables
    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.data.loader import DataLoader
    from yolov3_tensorflow_tpu.evaluation.metrics import detections_to_pred_rows
    from yolov3_tensorflow_tpu.evaluation.voc import (evaluate_map,
                                                      parse_gt_records)
    from yolov3_tensorflow_tpu.models.decode import predict_boxes
    from yolov3_tensorflow_tpu.models.yolov3 import (fold_batch_norm,
                                                     yolov3_forward_folded)
    from yolov3_tensorflow_tpu.ops.fast_postprocess import postprocess_prefilter
    from yolov3_tensorflow_tpu.ops.nms import batched_nms_auto
    from yolov3_tensorflow_tpu.ops.quantize import (
        calibrate_activation_scales, quantize_model, yolov3_forward_int8)

    cfg = Config()
    if args.names:
        cfg.data.class_name_path = args.names
    cfg.data.val_file = args.data
    cfg.finalize()
    num_classes = cfg.model.num_classes
    anchors = np.asarray(cfg.anchors, np.float32)
    size = (args.img_size, args.img_size)  # (h, w)

    variables = load_variables(args.ckpt, num_classes)
    loader = DataLoader(args.data, num_classes, anchors, 8, size, mode="val",
                        letterbox=True, num_threads=8)
    batches = list(loader.epoch(0))
    calib = np.concatenate([b.images for b in batches[:1]])[:8]

    folded = fold_batch_norm(variables, dtype=jnp.bfloat16)
    scales = calibrate_activation_scales(variables, jnp.asarray(calib))
    qparams = quantize_model(variables, scales)
    e = cfg.eval
    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def eval_bf16(images):
        fmaps = yolov3_forward_folded(folded, images,
                                      compute_dtype=jnp.bfloat16)
        boxes, confs, probs = predict_boxes(fmaps, anchors, num_classes, size)
        return batched_nms_auto(boxes, confs * probs, max_out=e.nms_topk,
                                pre_topk=e.pre_nms_topk,
                                score_thresh=e.score_threshold,
                                iou_thresh=e.nms_threshold)

    @jax.jit
    def eval_int8(images):
        fmaps = yolov3_forward_int8(qparams, images)
        boxes, confs, probs = predict_boxes(fmaps, anchors, num_classes, size)
        return batched_nms_auto(boxes, confs * probs, max_out=e.nms_topk,
                                pre_topk=e.pre_nms_topk,
                                score_thresh=e.score_threshold,
                                iou_thresh=e.nms_threshold)

    from yolov3_tensorflow_tpu.ops.quantize import (quantize_model_chained,
                                                    yolov3_forward_int8_chained)
    qchained = quantize_model_chained(variables, scales)

    @jax.jit
    def eval_int8_chained(images):
        fmaps = yolov3_forward_int8_chained(qchained, images, head="plain")
        boxes, confs, probs = predict_boxes(fmaps, anchors, num_classes, size)
        return batched_nms_auto(boxes, confs * probs, max_out=e.nms_topk,
                                pre_topk=e.pre_nms_topk,
                                score_thresh=e.score_threshold,
                                iou_thresh=e.nms_threshold)

    def run_map(step):
        rows = []
        for b in batches:
            dets = step(jnp.asarray(b.images))
            dets_np = jax.device_get(dets)  # one host round trip
            rows.extend(detections_to_pred_rows(dets_np, b.image_ids))
        gt = parse_gt_records(args.data, size, True)
        return evaluate_map(gt, rows, num_classes, e.eval_threshold,
                            e.use_voc_07_metric)

    map_bf16 = run_map(eval_bf16)
    map_int8 = run_map(eval_int8)
    map_int8_chained = run_map(eval_int8_chained)

    # ---- approx_topk vs exact prefilter at serving thresholds ----
    def serving(approx):
        @jax.jit
        def f(images):
            fmaps = yolov3_forward_folded(folded, images,
                                          compute_dtype=jnp.bfloat16)
            return postprocess_prefilter(
                fmaps, anchors, num_classes, size, max_out=50, box_topk=128,
                pre_topk=128, score_thresh=0.3, iou_thresh=0.45,
                use_pallas=use_pallas, approx_topk=approx)
        return f

    def identity_vs_exact(exact_f, cand_f, iou_min=0.98):
        """Detection identity rate: fraction of exact-path detections with a
        same-label counterpart at IoU >= iou_min (greedy one-to-one match —
        set equality on rounded coordinates is too brittle for the packed
        path's bf16 box logits, whose ~0.1 px deviations flip rounding)."""
        total = matched = 0
        score_dev = 0.0
        for b in batches:
            de = jax.device_get(exact_f(jnp.asarray(b.images)))
            da = jax.device_get(cand_f(jnp.asarray(b.images)))
            for i in range(b.images.shape[0]):
                ve = de["valid"][i].astype(bool)
                va = da["valid"][i].astype(bool)
                eb, el = de["boxes"][i][ve], de["labels"][i][ve]
                es = de["scores"][i][ve]
                ab, al = da["boxes"][i][va], da["labels"][i][va]
                as_ = da["scores"][i][va]
                used = np.zeros(len(ab), bool)
                total += len(eb)
                for bx, lb, sc in zip(eb, el, es):
                    best, best_iou = -1, iou_min
                    for j in range(len(ab)):
                        if used[j] or al[j] != lb:
                            continue
                        ix0 = np.maximum(bx[:2], ab[j][:2])
                        ix1 = np.minimum(bx[2:], ab[j][2:])
                        iw = np.maximum(ix1 - ix0, 0.0)
                        inter = iw[0] * iw[1]
                        ua = (np.prod(bx[2:] - bx[:2])
                              + np.prod(ab[j][2:] - ab[j][:2]) - inter)
                        iou = inter / max(ua, 1e-9)
                        if iou >= best_iou:
                            best, best_iou = j, iou
                    if best >= 0:
                        used[best] = True
                        matched += 1
                        score_dev = max(score_dev,
                                        float(abs(sc - as_[best])))
        return total, matched, score_dev

    exact_f, approx_f = serving(False), serving(True)
    total, matched, score_dev = identity_vs_exact(exact_f, approx_f)

    # ---- packed serving head (the bench configuration) vs exact ----
    from yolov3_tensorflow_tpu.ops.fast_postprocess import (
        pack_serving_head, postprocess_packed, yolov3_forward_packed)
    packed_params = pack_serving_head(folded, num_classes)

    @jax.jit
    def packed_f(images):
        outs = yolov3_forward_packed(packed_params, images)
        return postprocess_packed(
            outs, anchors, num_classes, size, max_out=128, box_topk=64,
            score_thresh=0.3, iou_thresh=0.45, approx_topk=use_pallas,
            use_pallas=use_pallas)

    p_total, p_matched, p_score_dev = identity_vs_exact(exact_f, packed_f)

    # ---- stem-int8 hybrid (bf16 with the first --stem_upto convs
    # int8-chained; bench.py headlines upto=12) vs exact: mAP + identity ----
    from yolov3_tensorflow_tpu.ops.quantize import (
        build_stem_int8_packed, yolov3_forward_stem_int8_packed)
    hp = build_stem_int8_packed(variables, scales, num_classes,
                                upto=args.stem_upto)

    @jax.jit
    def stem8_f(images):
        outs = yolov3_forward_stem_int8_packed(hp, images)
        return postprocess_packed(
            outs, anchors, num_classes, size, max_out=128, box_topk=64,
            score_thresh=0.3, iou_thresh=0.45, approx_topk=use_pallas,
            use_pallas=use_pallas)

    s_total, s_matched, s_score_dev = identity_vs_exact(exact_f, stem8_f)

    @jax.jit
    def eval_stem8(images):
        fmaps = yolov3_forward_stem_int8_packed(hp, images)
        from yolov3_tensorflow_tpu.ops.fast_postprocess import head_row_width
        row = head_row_width(num_classes)
        need = 5 + num_classes
        # packed logits -> raw feature-map layout for the exact eval path
        raws = []
        for f in fmaps:
            n, hg, wg, _ = f.shape
            fr = f.reshape(n, hg, wg, 3, row).astype(jnp.float32)
            cls = fr[..., :num_classes]
            conf = fr[..., num_classes:num_classes + 1]
            box = fr[..., num_classes + 1:num_classes + 5]
            raws.append(jnp.concatenate([box, conf, cls], axis=-1)
                        .reshape(n, hg, wg, 3 * need))
        boxes, confs, probs = predict_boxes(raws, anchors, num_classes, size)
        return batched_nms_auto(boxes, confs * probs, max_out=e.nms_topk,
                                pre_topk=e.pre_nms_topk,
                                score_thresh=e.score_threshold,
                                iou_thresh=e.nms_threshold)

    map_stem8 = run_map(eval_stem8)

    summary = {
        "checkpoint": args.ckpt,
        "dataset": args.data,
        "images": sum(b.images.shape[0] for b in batches),
        "mAP_bf16": round(float(map_bf16["mAP"]), 4),
        "mAP_int8": round(float(map_int8["mAP"]), 4),
        "mAP_int8_chained": round(float(map_int8_chained["mAP"]), 4),
        "int8_map_delta": round(float(map_bf16["mAP"] - map_int8["mAP"]), 4),
        "approx_topk_identity": round(matched / max(total, 1), 4),
        "approx_topk_exact_dets": total,
        "approx_topk_max_score_dev": round(score_dev, 5),
        "packed_serving_identity": round(p_matched / max(p_total, 1), 4),
        "packed_serving_exact_dets": p_total,
        "packed_serving_max_score_dev": round(p_score_dev, 5),
        "stem_int8_upto": args.stem_upto,
        "mAP_stem_int8": round(float(map_stem8["mAP"]), 4),
        "stem_int8_map_delta": round(
            float(map_bf16["mAP"] - map_stem8["mAP"]), 4),
        "stem_int8_identity": round(s_matched / max(s_total, 1), 4),
        "stem_int8_exact_dets": s_total,
        "stem_int8_max_score_dev": round(s_score_dev, 5),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "quantize_validation.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
