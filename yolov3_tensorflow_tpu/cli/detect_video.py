"""Streaming video detection demo (reference video_test.py parity).

TPU-aware twists (SURVEY.md §7 hard part 6):
- software pipelining: the next dispatch goes out while previous results are
  still materializing on device (JAX async dispatch), overlapping host
  decode/draw with device compute (--pipeline_depth);
- frame batching (--frame_batch): on remote-attached devices every
  dispatch+fetch pays a fixed RPC round trip that dwarfs the 416^2 model
  itself, so file-input frames are detected N per device call and fetched as
  one packed buffer — the round trip amortizes N-fold at N-1 frames of
  latency (keep 1 for live input).
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
                   help="dispatches in flight on the device; raise to hide "
                        "host<->device round-trip latency (adds that much "
                        "display latency)")
    p.add_argument("--frame_batch", type=int, default=1,
                   help="frames per device call. On remote-attached devices "
                        "every dispatch+fetch pays a fixed RPC round trip "
                        "(~26 ms on the dev tunnel) that dwarfs the model "
                        "itself; batching N file-input frames amortizes it "
                        "N-fold. Adds N-1 frames of latency — keep 1 for "
                        "live/interactive input")
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
    pending = deque()  # (frames, invs, device detections) per dispatch
    depth = max(1, args.pipeline_depth)
    fb = max(1, args.frame_batch)
    frames = 0
    t_start = time.time()
    t_warm = None  # set after batch 0 completes (excludes jit compile)

    def finish(item):
        batch_frames, invs, dets = item
        t0 = time.time()
        dets = np.asarray(dets)                      # ONE device sync
        for i, (frame, inv) in enumerate(zip(batch_frames, invs)):
            boxes, scores, labels = unpack_detections(dets, i)
            boxes = (invert_stream(boxes) if inv is None
                     else invert_boxes(boxes, inv))
            for box, score, label in zip(boxes, scores, labels):
                plot_one_box(frame, box,
                             label=f"{classes[int(label)]}, "
                                   f"{score * 100:.2f}%",
                             color=color_table[int(label)])
            ms = (time.time() - t0) * 1000 / len(batch_frames)
            cv2.putText(frame, f"{ms:.2f} ms", (40, 40), 0, fontScale=1,
                        color=(0, 255, 0), thickness=2)
            if writer is not None:
                writer.write(frame)
            if args.show:
                cv2.imshow("image", frame)
                cv2.waitKey(1)

    def dispatch(batch_frames):
        """One device call over len(batch_frames) frames. The LAST batch of
        the video may be short: pad it by repeating the final frame (jit
        sees one static batch shape = one compile) and drop the pad rows."""
        n = len(batch_frames)
        padded = batch_frames + [batch_frames[-1]] * (fb - n)
        if use_device_pre:
            invs = [None] * n
            dets = detect_stream(np.stack(padded))   # raw uint8 BGR
        else:
            pre = [preprocess(f, args.new_size, args.letterbox_resize)
                   for f in padded]
            invs = [inv for _, inv in pre[:n]]
            dets = detect(np.concatenate([inp for inp, _ in pre]))
        pending.append((batch_frames, invs, dets))

    batch_buf = []
    while True:
        ok, frame = vid.read()
        if not ok or (args.max_frames and frames >= args.max_frames):
            break
        batch_buf.append(frame)
        frames += 1
        if len(batch_buf) < fb:
            continue
        dispatch(batch_buf)
        batch_buf = []
        if len(pending) >= depth + 1 or (t_warm is None and pending):
            finish(pending.popleft())  # overlap: consume oldest in flight
            if t_warm is None:
                t_warm = time.time()  # first result done -> compile finished
                frames_at_warm = frames
    if batch_buf:
        dispatch(batch_buf)
    while pending:
        finish(pending.popleft())

    elapsed = time.time() - t_start
    if frames:
        msg = (f"{frames} frames in {elapsed:.2f}s "
               f"({frames / elapsed:.1f} FPS incl. decode+draw+compile)")
        if t_warm is not None and frames > frames_at_warm:
            steady = (frames - frames_at_warm) / max(
                time.time() - t_warm, 1e-9)
            msg += (f"; steady-state {steady:.1f} FPS "
                    f"(first batch excluded)")
        print(msg)
    vid.release()
    if writer is not None:
        writer.release()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
