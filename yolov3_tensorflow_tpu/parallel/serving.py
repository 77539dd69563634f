"""Batch-parallel inference over a device mesh.

The serving analogue of `parallel.data_parallel`: detection is
embarrassingly parallel over images, so a multi-chip deployment shards the
batch over the mesh's `data` axis and runs the full per-image pipeline
(forward + decode + Pallas NMS) independently on every device — no
collectives at all, so throughput scales linearly with chips on ICI.

`shard_map` (rather than plain jit + sharded inputs) is deliberate: the
Pallas NMS kernel is a custom call that GSPMD cannot partition, but under
shard_map each device traces and runs its own complete program, custom
calls included. Reference counterpart: none (single-GPU sess.run,
test_single_image.py:62); this is the SURVEY §2.3 DP plan applied to
serving.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from yolov3_tensorflow_tpu.models.yolov3 import fold_batch_norm

Params = Dict


def make_sharded_detector(variables: Params, anchors: np.ndarray,
                          num_classes: int, img_size: Tuple[int, int],
                          mesh: Mesh, *,
                          mode: str = "packed", max_out: int = 128,
                          box_topk: int = 64, score_thresh: float = 0.3,
                          iou_thresh: float = 0.45,
                          approx_topk: bool = False,
                          use_pallas=None,
                          pallas_interpret: bool = False,
                          calibration_images=None,
                          stem_int8_upto: int = 12,
                          axis_name: str = "data") -> Callable:
    """Jitted detector whose batch is sharded over `mesh`'s `axis_name`.

    images [B, H, W, 3] with B divisible by the mesh size -> the usual
    {"boxes", "scores", "labels", "valid"} dict, every output batch-sharded
    the same way. Weights are closed over and replicated to every device.

    mode: "packed" (fastest exact serving path), "prefilter" (exact at demo
    thresholds) or "stem8" (the stem-int8 hybrid — the single-chip serving
    headline, measured fastest accuracy-validated mode at every benched
    resolution; needs `calibration_images` for its activation scales) —
    same semantics as ops.postprocess.build_detector.
    """
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.ops.fast_postprocess import (
        pack_serving_head, postprocess_packed, postprocess_prefilter,
        yolov3_forward_packed)
    from yolov3_tensorflow_tpu.models.yolov3 import yolov3_forward_folded

    anchors = np.asarray(anchors, np.float32)
    if mode == "stem8":
        from yolov3_tensorflow_tpu.ops.quantize import (
            build_stem_int8_packed, calibrate_activation_scales,
            yolov3_forward_stem_int8_packed)
        if calibration_images is None:
            raise ValueError("mode='stem8' needs calibration_images")
        scales = calibrate_activation_scales(variables, calibration_images)
        hybrid = build_stem_int8_packed(variables, scales, num_classes,
                                        upto=stem_int8_upto)
    else:
        folded = fold_batch_norm(variables, dtype=jnp.bfloat16)
        if mode == "packed":
            folded = pack_serving_head(folded, num_classes)
        elif mode != "prefilter":
            raise ValueError(f"unsupported sharded serving mode: {mode!r}")

    def local(images: jax.Array) -> Dict[str, jax.Array]:
        if mode in ("packed", "stem8"):
            if mode == "stem8":
                outs = yolov3_forward_stem_int8_packed(hybrid, images)
            else:
                outs = yolov3_forward_packed(folded, images)
            return postprocess_packed(
                outs, anchors, num_classes, img_size, max_out=max_out,
                box_topk=box_topk, score_thresh=score_thresh,
                iou_thresh=iou_thresh, approx_topk=approx_topk,
                use_pallas=use_pallas, pallas_interpret=pallas_interpret)
        fmaps = yolov3_forward_folded(folded, images,
                                      compute_dtype=jnp.bfloat16)
        return postprocess_prefilter(
            fmaps, anchors, num_classes, img_size, max_out=max_out,
            box_topk=max(box_topk, 128), pre_topk=128,
            score_thresh=score_thresh, iou_thresh=iou_thresh,
            use_pallas=use_pallas)

    spec = PartitionSpec(axis_name)
    sharded = jax.shard_map(local, mesh=mesh, in_specs=spec, out_specs=spec,
                            check_vma=False)
    return jax.jit(sharded)
