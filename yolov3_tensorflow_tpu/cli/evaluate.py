"""Standalone full-dataset evaluation (reference eval.py parity).

  python -m yolov3_tensorflow_tpu.cli.evaluate \
      --eval_file val.txt --restore_path ./ckpt/best_model_... \
      [eval.batch_size=16 ...]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.cli.common import load_variables, str2bool
from yolov3_tensorflow_tpu.config import load_config
from yolov3_tensorflow_tpu.data.loader import DataLoader
from yolov3_tensorflow_tpu.evaluation.metrics import (AverageMeter,
                                                      detections_to_pred_rows)
from yolov3_tensorflow_tpu.evaluation.voc import evaluate_map, parse_gt_records
from yolov3_tensorflow_tpu.train.trainer import make_eval_step


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="YOLOv3 TPU evaluation.")
    p.add_argument("--eval_file", type=str, required=True)
    p.add_argument("--restore_path", type=str, required=True)
    p.add_argument("--config", type=str, default="")
    p.add_argument("--anchor_path", type=str, default="")
    p.add_argument("--class_name_path", type=str, default="")
    p.add_argument("--img_size", nargs="*", type=int, default=[416, 416])
    p.add_argument("--letterbox_resize", type=str2bool, default=True)
    p.add_argument("--num_threads", type=int, default=10)
    p.add_argument("overrides", nargs="*", default=[])
    return p


def run_eval(args) -> dict:
    """The full evaluation pipeline; returns the evaluate_map result dict
    (plus per-term mean losses under "losses"). Used by main() and by the
    overfit gate (scripts/overfit_gate.py), so asserting on the returned mAP
    exercises exactly the CLI's loader -> eval_step -> VOC path."""
    cfg = load_config(args.config or None, args.overrides)
    cfg.data.val_file = args.eval_file
    cfg.data.anchor_path = args.anchor_path
    cfg.data.class_name_path = args.class_name_path
    cfg.data.img_size = tuple(args.img_size)
    cfg.data.letterbox_resize = args.letterbox_resize
    cfg.finalize()

    variables = load_variables(args.restore_path, cfg.model.num_classes)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    eval_step = make_eval_step(cfg)

    loader = DataLoader(
        args.eval_file, cfg.model.num_classes, cfg.anchors,
        cfg.eval.batch_size, cfg.data.img_size, mode="val",
        letterbox=cfg.data.letterbox_resize, num_threads=args.num_threads)

    meters = {k: AverageMeter() for k in ("total", "xy", "wh", "conf", "class")}
    rows = []
    for batch in loader.epoch(0):
        losses, dets = eval_step(
            state, jnp.asarray(batch.images),
            tuple(jnp.asarray(y) for y in batch.y_true))
        # ONE host round trip per batch: each per-array fetch costs a full
        # RPC on remotely-attached devices (~29 ms measured), and this loop
        # used to pay 9 of them (5 loss scalars + 4 detection arrays)
        losses_np, dets_np = jax.device_get((losses, dets))
        rows.extend(detections_to_pred_rows(dets_np, batch.image_ids))
        for k in meters:
            meters[k].update(float(losses_np[k]), batch.images.shape[0])

    gt = parse_gt_records(args.eval_file, cfg.data.img_size,
                          cfg.data.letterbox_resize)
    result = evaluate_map(gt, rows, cfg.model.num_classes,
                          cfg.eval.eval_threshold, cfg.eval.use_voc_07_metric)
    result["losses"] = {k: m.average for k, m in meters.items()}
    return result


def main(argv=None) -> int:
    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    result = run_eval(args)
    meters = result["losses"]
    for c, r in result["per_class"].items():
        print(f"EVAL: Class {c}: Recall: {r['recall']:.4f}, "
              f"Precision: {r['precision']:.4f}, AP: {r['ap']:.4f}")
    print(f"EVAL: Recall: {result['recall']:.4f}, "
          f"Precison: {result['precision']:.4f}, mAP: {result['mAP']:.4f}")
    print("EVAL: loss: total: {:.2f}, xy: {:.2f}, wh: {:.2f}, conf: {:.2f}, "
          "class: {:.2f}".format(*[meters[k] for k in
                                   ("total", "xy", "wh", "conf", "class")]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
