"""Shared CLI helpers: model loading from either checkpoint format."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from yolov3_tensorflow_tpu.config import (DEFAULT_ANCHORS, parse_anchors,
                                          read_class_names)
from yolov3_tensorflow_tpu.utils.coco import COCO_CLASS_NAMES


def load_anchors(anchor_path: Optional[str]) -> np.ndarray:
    if anchor_path:
        return parse_anchors(anchor_path)
    return np.asarray(DEFAULT_ANCHORS, np.float32)


def load_classes(class_name_path: Optional[str]) -> Dict[int, str]:
    if class_name_path:
        return read_class_names(class_name_path)
    return dict(enumerate(COCO_CLASS_NAMES))


def load_variables(restore_path: str, num_classes: int) -> Dict[str, Any]:
    """Load model variables from an orbax checkpoint directory or a darknet
    .weights file (auto-detected by extension)."""
    import jax

    from yolov3_tensorflow_tpu.models.yolov3 import init_yolov3

    if restore_path.endswith(".weights"):
        from yolov3_tensorflow_tpu.utils.weights import load_darknet_weights
        fresh = init_yolov3(jax.random.PRNGKey(0), num_classes)
        return load_darknet_weights(fresh, restore_path, num_classes)

    from yolov3_tensorflow_tpu.train.checkpoint import CheckpointStore
    store = CheckpointStore(os.path.dirname(os.path.abspath(restore_path))
                            or ".")
    tree = store.restore(os.path.abspath(restore_path))
    return {"params": tree["params"], "batch_stats": tree["batch_stats"]}


def str2bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "on")
