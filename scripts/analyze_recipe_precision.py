"""Round-5: explain the reference-recipe gate's precision collapse (0.0126).

The three overfit-gate artifacts all pass mAP >= 0.95 but report wildly
different precision at the eval threshold (reference recipe 0.0126 vs adam
0.35 / device 0.71). Precision there counts EVERY detection above the NMS
score threshold 0.01 (config.eval.score_threshold — same convention as the
reference, eval.py + args.py eval knobs), so it is a statement about the
low-confidence tail, not about ranking quality (mAP sorts by confidence).

This script quantifies WHERE the tail mass comes from for each trained gate
checkpoint, on its own 50-image gate set, through the real eval path:

  1. precision/recall/mAP at a sweep of post-hoc score cutoffs
     (0.01 ... 0.5) — if precision recovers by ~0.1 while mAP stays put,
     the collapse is a thresholding artifact, not a ranking bug;
  2. a decomposition of every above-0.01 detection's score into
     sigmoid(conf) * class_prob by re-running predict_boxes — separating
     "conf is mis-calibrated" (focal: easy negatives keep non-tiny conf
     because (1-p)^2 kills their gradient) from "class probs are floored"
     (label smoothing trains class targets to delta/C > 0, reference
     model.py:296-298).

Writes docs/results/recipe_precision_note.md with the committed numbers.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GATES = [
    ("reference", "data/overfit_ref"),
    ("adam", "data/overfit"),
    ("device", "data/overfit_dev"),
]


def analyze(label: str, out_dir: str) -> dict:
    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.cli.common import load_variables
    from yolov3_tensorflow_tpu.config import load_config
    from yolov3_tensorflow_tpu.data.loader import DataLoader
    from yolov3_tensorflow_tpu.evaluation.metrics import detections_to_pred_rows
    from yolov3_tensorflow_tpu.evaluation.voc import (evaluate_map,
                                                      parse_gt_records)
    from yolov3_tensorflow_tpu.models.decode import predict_boxes
    from yolov3_tensorflow_tpu.models.yolov3 import yolov3_forward
    from yolov3_tensorflow_tpu.train.trainer import make_eval_step

    ann = os.path.join(out_dir, "data", "train.txt")
    names = os.path.join(out_dir, "data", "synth.names")
    ckpt = os.path.join(out_dir, "ckpt", "overfit_final")

    cfg = load_config(None, [])
    cfg.data.val_file = ann
    cfg.data.class_name_path = names
    cfg.data.img_size = (416, 416)
    cfg.finalize()

    variables = load_variables(ckpt, cfg.model.num_classes)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    eval_step = make_eval_step(cfg)

    loader = DataLoader(ann, cfg.model.num_classes, cfg.anchors,
                        cfg.eval.batch_size, cfg.data.img_size, mode="val",
                        letterbox=cfg.data.letterbox_resize, num_threads=4)
    rows = []
    conf_probs = []      # (conf, best_prob) of every anchor with score>0.01
    anchors = np.asarray(cfg.anchors, np.float32)

    @jax.jit
    def raw_scores(images):
        fmaps, _ = yolov3_forward(state, images, train=False)
        # predict_boxes returns confs/probs ALREADY sigmoided
        # (models/decode.py:80) — the same contract ops.postprocess relies
        # on when it forms scores = confs * probs directly
        boxes, confs, probs = predict_boxes(
            fmaps, anchors, cfg.model.num_classes, (416, 416))
        conf = confs[..., 0]
        best_prob = jnp.max(probs, axis=-1)
        return conf, best_prob

    for batch in loader.epoch(0):
        images = jnp.asarray(batch.images)
        losses, dets = eval_step(state, images,
                                 tuple(jnp.asarray(y) for y in batch.y_true))
        dets_np = jax.device_get(dets)
        rows.extend(detections_to_pred_rows(dets_np, batch.image_ids))
        conf, best_prob = jax.device_get(raw_scores(images))
        score = conf * best_prob
        sel = score > 0.01
        conf_probs.append(np.stack([conf[sel], best_prob[sel]], -1))

    gt = parse_gt_records(ann, cfg.data.img_size, cfg.data.letterbox_resize)
    sweep = {}
    for cut in (0.01, 0.03, 0.05, 0.1, 0.2, 0.3, 0.5):
        kept = [r for r in rows if r[5] >= cut]
        res = evaluate_map(gt, kept, cfg.model.num_classes,
                           cfg.eval.eval_threshold,
                           cfg.eval.use_voc_07_metric)
        sweep[cut] = {"n_dets": len(kept),
                      "recall": round(res["recall"], 4),
                      "precision": round(res["precision"], 4),
                      "mAP": round(res["mAP"], 4)}
        print(f"[{label}] cut {cut:.2f}: n={len(kept):6d} "
              f"recall {res['recall']:.4f} precision {res['precision']:.4f} "
              f"mAP {res['mAP']:.4f}", flush=True)

    cp = np.concatenate(conf_probs, 0) if conf_probs else np.zeros((0, 2))
    decomp = {}
    if len(cp):
        decomp = {
            "n_anchors_above_001": int(len(cp)),
            "conf_quantiles_50_90_99": [round(float(q), 4) for q in
                                        np.quantile(cp[:, 0], [.5, .9, .99])],
            "prob_quantiles_50_90_99": [round(float(q), 4) for q in
                                        np.quantile(cp[:, 1], [.5, .9, .99])],
            # how many owe their crossing to conf>0.1 (conf-driven tail)
            # vs prob>0.1 (smoothing-floored probs can't reach 0.1)
            "frac_conf_gt_0.1": round(float((cp[:, 0] > 0.1).mean()), 4),
            "frac_prob_gt_0.1": round(float((cp[:, 1] > 0.1).mean()), 4),
            "frac_conf_gt_0.5": round(float((cp[:, 0] > 0.5).mean()), 4),
        }
        print(f"[{label}] decomposition: {decomp}", flush=True)
    return {"sweep": sweep, "decomposition": decomp}


def main() -> int:
    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for label, rel in GATES:
        out_dir = os.path.join(repo, rel)
        if not os.path.isdir(os.path.join(out_dir, "ckpt")):
            print(f"[{label}] missing checkpoint dir, skipped", flush=True)
            continue
        results[label] = analyze(label, out_dir)
    out = os.path.join(repo, "docs", "results", "recipe_precision_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
