"""yolov3_tensorflow_tpu — a TPU-native (JAX/XLA/Pallas) object-detection framework.

A ground-up rebuild of the capabilities of wizyoung/YOLOv3_TensorFlow
(reference at /root/reference) designed for TPU hardware:

- NHWC bf16 convolutions compiled by XLA onto the MXU
  (reference: utils/layer_utils.py, model.py `forward`)
- fully vectorized anchor decode + loss (no per-image while_loops;
  reference: model.py `reorg_layer`/`loss_layer`)
- fixed-shape, mask-based per-class NMS as a Pallas TPU kernel with an
  XLA fallback (reference: utils/nms_utils.py `gpu_nms`)
- host-side numpy/cv2 augmentation pipeline with explicit PRNG keys and a
  deterministic bucketed multi-scale schedule
  (reference: utils/data_utils.py, utils/data_aug.py)
- optax train step under `jit`, data-parallel `shard_map` over a device
  mesh with cross-replica sync batch-norm (delivers the reference's
  multi-GPU TODO, README.md:210)
- orbax checkpointing with scope-regex partial restore / freeze
  (reference: train.py:81-120, args.py:47-60)
- VOC mAP evaluation (both 07 11-point and area-under-PR metrics;
  reference: utils/eval_utils.py `voc_eval`/`voc_ap`)
"""

__version__ = "0.1.0"
