"""Model definitions: Darknet-53 backbone + YOLOv3 FPN heads, anchor decode."""

from yolov3_tensorflow_tpu.models.yolov3 import (  # noqa: F401
    YoloV3,
    init_yolov3,
    yolov3_forward,
    fold_batch_norm,
)
