"""Data-parallel training over a device mesh via shard_map.

Delivers the reference's unimplemented "multi-GPUs with sync batch norm" TODO
(README.md:210) the TPU-native way:

- the global batch's leading dim is sharded over the mesh `data` axis
- each shard runs the same jitted train step; gradients are `lax.pmean`-ed
  across the axis before the optimizer, so parameters stay bit-identical
  replicas
- batch-norm moments are `lax.pmean`-ed inside the forward pass
  (models.layers.batch_norm axis_name) — true cross-replica sync BN
- all collectives are XLA psum/pmean over ICI; no host participation

Also hosts the eval-side sharded detector used for batched inference.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.train.trainer import make_train_step


def make_dp_train_step(cfg: Config, optimizer: optax.GradientTransformation,
                       mesh: Mesh, axis_name: str = "data",
                       schedule: Callable = None,
                       device_augment: bool = False,
                       device_encode: bool = False,
                       out_size=None) -> Callable:
    """Build the sharded train step.

    Call with (state, images, y_true) where `images`/`y_true` have a global
    batch divisible by the mesh size. `state` is fully replicated; the output
    state remains replicated because gradients are averaged before the
    (deterministic) optimizer update.

    device_augment=True: `images` is the loader's (staged, staged2,
    aug_params) triple instead; the augmentation prologue runs sharded over
    the same data axis (every device augments only its batch rows).
    device_encode=True: `y_true` is the padded (gt_boxes, gt_labels, gt_mask)
    triple and the grids are scattered on-device per shard; with
    device_augment also on, the STATIC `out_size` picks the resolution
    (one compiled step per multi-scale bucket — trainer caches them).
    """
    step_fn = make_train_step(cfg, optimizer, axis_name=axis_name,
                              schedule=schedule,
                              device_augment=device_augment,
                              device_encode=device_encode,
                              out_size=out_size)

    def wrapped(state, images, y_true):
        new_state, metrics = step_fn(state, images, y_true)
        metrics = jax.tree_util.tree_map(
            lambda m: jax.lax.pmean(m, axis_name), metrics)
        return new_state, metrics

    if device_augment:
        # (staged, staged2, {param arrays}) all batch-sharded; the param
        # dict's spec must mirror its pytree structure
        aug_spec = (P(axis_name), P(axis_name),
                    {k: P(axis_name) for k in
                     ("lam", "color", "crop", "rect", "interp", "flip")})
        batch_spec = aug_spec
    else:
        batch_spec = P(axis_name)
    sharded = jax.shard_map(
        wrapped, mesh=mesh,
        in_specs=(P(), batch_spec, (P(axis_name),) * 3),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_dp_eval_forward(cfg: Config, mesh: Mesh, axis_name: str = "data"
                         ) -> Callable:
    """Sharded eval-mode forward + decode + NMS over the mesh: the batched
    high-throughput inference path (each device handles its batch shard
    independently; no collectives needed)."""
    from yolov3_tensorflow_tpu.models.decode import predict_boxes
    from yolov3_tensorflow_tpu.models.yolov3 import yolov3_forward
    from yolov3_tensorflow_tpu.ops.nms import batched_nms_auto

    anchors = np.asarray(cfg.anchors, np.float32)
    m, e = cfg.model, cfg.eval
    compute_dtype = jnp.dtype(m.compute_dtype)

    def forward(state, images):
        img_size = (images.shape[1], images.shape[2])
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        fmaps, _ = yolov3_forward(variables, images, train=False,
                                  compute_dtype=compute_dtype)
        boxes, confs, probs = predict_boxes(fmaps, anchors, m.num_classes,
                                            img_size)
        return batched_nms_auto(boxes, confs * probs, max_out=e.nms_topk,
                           pre_topk=e.pre_nms_topk,
                           score_thresh=e.score_threshold,
                           iou_thresh=e.nms_threshold)

    sharded = jax.shard_map(
        forward, mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(sharded)
