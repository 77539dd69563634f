"""End-to-end CLI flow on CPU with a tiny config, plus a fixed-seed golden
regression anchor for the full detector pipeline."""

import os

import cv2
import jax
import numpy as np
import pytest

from yolov3_tensorflow_tpu.cli import detect_image
from yolov3_tensorflow_tpu.models.yolov3 import init_yolov3
from yolov3_tensorflow_tpu.ops.postprocess import build_detector
from yolov3_tensorflow_tpu.train.checkpoint import CheckpointStore

ANCHORS = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                    [59, 119], [116, 90], [156, 198], [373, 326]], np.float32)


@pytest.mark.parametrize("mode", ["prefilter", "stem8"])
def test_detect_image_cli_end_to_end(tmp_path, mode):
    """The full demo surface: names file -> ckpt -> CLI main() -> output jpg.
    stem8 also covers the int8-chained-stem serving mode incl. its
    calibrate-on-the-input-image path."""
    names = tmp_path / "names.txt"
    names.write_text("a\nb\nc\n")

    variables = init_yolov3(jax.random.PRNGKey(7), 3)
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save("m", {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]})

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
    img_path = str(tmp_path / "in.jpg")
    cv2.imwrite(img_path, np.asarray(img))
    out_path = str(tmp_path / "out.jpg")

    rc = detect_image.main([
        img_path, "--restore_path", str(tmp_path / "ckpt" / "m"),
        "--class_name_path", str(names), "--new_size", "96", "96",
        "--score_thresh", "0.2", "--max_boxes", "5", "--output", out_path,
        "--mode", mode,
    ])
    assert rc == 0
    assert os.path.exists(out_path)
    assert cv2.imread(out_path).shape == (100, 140, 3)


def test_detector_golden_regression():
    """Fixed seed + fixed input -> detector outputs must stay stable across
    refactors (the reference's analogue is its committed demo-result images,
    SURVEY.md §4). Tolerances cover backend fp variation, not logic changes."""
    variables = init_yolov3(jax.random.PRNGKey(123), 4)
    detect = build_detector(variables, ANCHORS, 4, (96, 96), max_out=4,
                            score_thresh=0.2, iou_thresh=0.5,
                            compute_dtype="float32", use_pallas=False,
                            box_topk=128)
    rng = np.random.default_rng(42)
    images = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
    dets = detect(images)
    valid = np.asarray(dets["valid"][0])
    scores = np.asarray(dets["scores"][0])[valid]
    # regenerate with: print(repr(...)) after an intentional change
    assert int(valid.sum()) == 16
    np.testing.assert_allclose(
        sorted(scores)[-4:],
        [0.27150685, 0.27330402, 0.27973434, 0.28179774], atol=2e-4)


@pytest.mark.parametrize("frame_batch", [1, 4])
def test_detect_video_cli_end_to_end(tmp_path, frame_batch):
    """Video demo surface: mp4 -> streaming (device-preprocess) pipeline
    with the packed serving mode -> annotated mp4 out; exercises the
    in-flight frame queue and the single-buffer detection fetch.
    frame_batch=4 over 6 frames also exercises the batched-RPC path with a
    short (padded) final batch."""
    from yolov3_tensorflow_tpu.cli import detect_video

    names = tmp_path / "names.txt"
    names.write_text("a\nb\nc\n")
    variables = init_yolov3(jax.random.PRNGKey(8), 3)
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save("m", {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]})

    rng = np.random.default_rng(1)
    vid_path = str(tmp_path / "in.mp4")
    vw = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 5,
                         (120, 90))
    for _ in range(6):
        vw.write(rng.integers(0, 255, (90, 120, 3), dtype=np.uint8))
    vw.release()
    out_path = str(tmp_path / "out.mp4")

    rc = detect_video.main([
        vid_path, "--restore_path", str(tmp_path / "ckpt" / "m"),
        "--class_name_path", str(names), "--new_size", "96", "96",
        "--score_thresh", "0.2", "--max_boxes", "5", "--mode", "packed",
        "--pipeline_depth", "3", "--frame_batch", str(frame_batch),
        "--save_video", "true", "--output", out_path,
    ])
    assert rc == 0
    cap = cv2.VideoCapture(out_path)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 6
