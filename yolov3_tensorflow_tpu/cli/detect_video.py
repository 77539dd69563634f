"""Streaming video detection demo (reference video_test.py parity).

TPU-aware twist: frames are processed with a one-frame software pipeline —
the next frame is preprocessed and dispatched while the previous result is
still materializing on device (JAX async dispatch), overlapping host decode
with device compute (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import argparse
import time

import cv2
import numpy as np

from yolov3_tensorflow_tpu.cli.common import (load_anchors, load_classes,
                                              load_variables, str2bool)
from yolov3_tensorflow_tpu.cli.detect_image import invert_boxes, preprocess
from yolov3_tensorflow_tpu.ops.postprocess import (build_detector,
                                                   pack_detections,
                                                   unpack_detections)
from yolov3_tensorflow_tpu.utils.viz import get_color_table, plot_one_box


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="YOLOv3 TPU video detection.")
    p.add_argument("input_video", type=str)
    p.add_argument("--anchor_path", type=str, default="")
    p.add_argument("--new_size", nargs="*", type=int, default=[416, 416])
    p.add_argument("--letterbox_resize", type=str2bool, default=True)
    p.add_argument("--class_name_path", type=str, default="")
    p.add_argument("--restore_path", type=str, required=True)
    p.add_argument("--score_thresh", type=float, default=0.3)
    p.add_argument("--nms_thresh", type=float, default=0.45)
    p.add_argument("--max_boxes", type=int, default=200)
    p.add_argument("--save_video", type=str2bool, default=False)
    p.add_argument("--output", type=str, default="video_result.mp4")
    p.add_argument("--show", action="store_true")
    p.add_argument("--max_frames", type=int, default=0,
                   help="stop after N frames (0 = all); useful headless")
    p.add_argument("--device_preprocess", type=str2bool, default=True,
                   help="letterbox+normalize on the TPU from raw uint8 "
                        "frames (4x less host->device traffic); implies "
                        "letterbox_resize")
    p.add_argument("--mode", type=str, default="prefilter",
                   choices=["exact", "prefilter", "split", "packed"],
                   help="postprocess pipeline; packed is the fastest "
                        "serving path (streaming supports prefilter/packed)")
    p.add_argument("--pipeline_depth", type=int, default=2,
                   help="frames in flight on the device; raise to hide "
                        "host<->device round-trip latency (adds that many "
                        "frames of display latency)")
    return p


def main(argv=None) -> int:
    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    anchors = load_anchors(args.anchor_path)
    classes = load_classes(args.class_name_path)
    num_classes = len(classes)
    color_table = get_color_table(num_classes)

    vid = cv2.VideoCapture(args.input_video)
    if not vid.isOpened():
        print(f"cannot open video: {args.input_video}")
        return 1
    fps = vid.get(cv2.CAP_PROP_FPS) or 25
    width = int(vid.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(vid.get(cv2.CAP_PROP_FRAME_HEIGHT))

    writer = None
    if args.save_video:
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        writer = cv2.VideoWriter(args.output, fourcc, fps, (width, height))

    import jax

    variables = load_variables(args.restore_path, num_classes)
    use_device_pre = args.device_preprocess and args.letterbox_resize
    if use_device_pre:
        from yolov3_tensorflow_tpu.ops.preprocess import (
            build_streaming_detector)
        stream_mode = args.mode if args.mode in ("prefilter", "packed") \
            else "prefilter"
        detect_raw, invert_stream = build_streaming_detector(
            variables, anchors, num_classes, (height, width),
            (args.new_size[1], args.new_size[0]), max_out=args.max_boxes,
            score_thresh=args.score_thresh, iou_thresh=args.nms_thresh,
            bgr_input=True, mode=stream_mode)
        # pack inside ONE program: a single fetched buffer per frame
        detect_stream = jax.jit(lambda fr: pack_detections(detect_raw(fr)))
    else:
        detect_dict = build_detector(
            variables, anchors, num_classes,
            (args.new_size[1], args.new_size[0]),
            max_out=args.max_boxes, score_thresh=args.score_thresh,
            iou_thresh=args.nms_thresh, mode=args.mode)
        detect = jax.jit(lambda im: pack_detections(detect_dict(im)))

    from collections import deque
    pending = deque()  # (frame, inv, device detections) in flight
    depth = max(1, args.pipeline_depth)
    frames = 0
    t_start = time.time()
    t_warm = None  # set after frame 0 completes (excludes jit compile)

    def finish(item):
        frame, inv, dets = item
        t0 = time.time()
        boxes, scores, labels = unpack_detections(dets, 0)  # ONE device sync
        boxes = invert_stream(boxes) if inv is None else invert_boxes(boxes, inv)
        for box, score, label in zip(boxes, scores, labels):
            plot_one_box(frame, box,
                         label=f"{classes[int(label)]}, {score * 100:.2f}%",
                         color=color_table[int(label)])
        ms = (time.time() - t0) * 1000
        cv2.putText(frame, f"{ms:.2f} ms", (40, 40), 0, fontScale=1,
                    color=(0, 255, 0), thickness=2)
        if writer is not None:
            writer.write(frame)
        if args.show:
            cv2.imshow("image", frame)
            cv2.waitKey(1)

    while True:
        ok, frame = vid.read()
        if not ok or (args.max_frames and frames >= args.max_frames):
            break
        if use_device_pre:
            inv = None
            dets = detect_stream(np.asarray(frame[None]))  # raw uint8 BGR
        else:
            inp, inv = preprocess(frame, args.new_size, args.letterbox_resize)
            dets = detect(inp)      # async dispatch; no host sync yet
        pending.append((frame, inv, dets))
        frames += 1
        if len(pending) >= depth + 1 or (t_warm is None and pending):
            finish(pending.popleft())  # overlap: consume oldest in flight
            if t_warm is None:
                t_warm = time.time()  # first result done -> compile finished
    while pending:
        finish(pending.popleft())

    elapsed = time.time() - t_start
    if frames:
        msg = (f"{frames} frames in {elapsed:.2f}s "
               f"({frames / elapsed:.1f} FPS incl. decode+draw+compile)")
        if t_warm is not None and frames > 1:
            steady = (frames - 1) / max(time.time() - t_warm, 1e-9)
            msg += f"; steady-state {steady:.1f} FPS (first frame excluded)"
        print(msg)
    vid.release()
    if writer is not None:
        writer.release()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
