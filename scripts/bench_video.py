"""Measure the streaming video demo at several --frame_batch settings.

VERDICT round 3 weak #5: the --frame_batch flag (batch N file-input frames
per device dispatch, cli/detect_video.py) landed without a measured number.
This script generates a deterministic synthetic 416x416 mp4, runs the real
`cli.detect_video` main at frame_batch 1/4/8, and reports the steady-state
FPS line the CLI prints (first frame / compile excluded by the CLI itself).

Context for the numbers (docs/BENCHMARKS.md): on this dev tunnel every
device dispatch pays a ~26 ms RPC round trip, so single-frame streaming is
RPC-floor-bound (~23.6 FPS round 2); batching N frames amortizes that floor
across N frames at the cost of N frames of latency. The reference's
comparable number is ~30 FPS on a locally-attached Titan XP
(/root/reference/video_test.py:76-93 on-frame ms overlay).

Usage: python scripts/bench_video.py [--frames 120] [--batches 1,4,8]
Writes docs/results/video_frame_batch.json.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import tempfile
from contextlib import redirect_stderr, redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_video(path: str, frames: int, size: int = 416) -> None:
    import cv2
    rng = np.random.default_rng(7)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                         (size, size))
    # moving rectangles over noise: stable decode cost, nonzero detections
    base = rng.integers(0, 80, (size, size, 3), dtype=np.uint8)
    for i in range(frames):
        f = base.copy()
        x = (13 * i) % (size - 120)
        cv2.rectangle(f, (x, 60), (x + 100, 180), (250, 250, 250), -1)
        cv2.rectangle(f, (40, x), (140, x + 90), (40, 220, 220), -1)
        vw.write(f)
    vw.release()


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--batches", type=str, default="1,4,8")
    p.add_argument("--out", default="docs/results/video_frame_batch.json")
    args = p.parse_args(argv)

    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    from yolov3_tensorflow_tpu.cli import detect_video
    from yolov3_tensorflow_tpu.models.yolov3 import init_yolov3
    from yolov3_tensorflow_tpu.train.checkpoint import CheckpointStore

    tmp = tempfile.mkdtemp(prefix="bench_video_")
    vid = os.path.join(tmp, "in.mp4")
    make_video(vid, args.frames)
    names = os.path.join(tmp, "names.txt")
    with open(names, "w") as f:
        f.write("\n".join(f"c{i}" for i in range(80)) + "\n")
    variables = init_yolov3(jax.random.PRNGKey(0), 80)
    store = CheckpointStore(os.path.join(tmp, "ckpt"))
    ckpt = store.save("m", {"params": variables["params"],
                            "batch_stats": variables["batch_stats"]})

    results = {}
    for fb in (int(x) for x in args.batches.split(",")):
        buf = io.StringIO()
        with redirect_stdout(buf), redirect_stderr(buf):
            rc = detect_video.main([
                vid, "--restore_path", ckpt,
                "--class_name_path", names,
                "--new_size", "416", "416",
                "--score_thresh", "0.3", "--max_boxes", "20",
                "--mode", "packed", "--pipeline_depth", "3",
                "--frame_batch", str(fb),
                "--save_video", "false", "--show", "false",
            ])
        text = buf.getvalue()
        m = re.search(r"steady-state ([0-9.]+) FPS", text)
        overall = re.search(r"\(([0-9.]+) FPS incl", text)
        results[str(fb)] = {
            "rc": rc,
            "steady_fps": float(m.group(1)) if m else None,
            "overall_fps": float(overall.group(1)) if overall else None,
        }
        print(f"frame_batch={fb}: steady {results[str(fb)]['steady_fps']} "
              f"FPS (overall {results[str(fb)]['overall_fps']})", flush=True)

    out = {"frames": args.frames, "size": 416, "mode": "packed",
           "pipeline_depth": 3, "results": results,
           "note": "synthetic 416^2 mp4, random-init weights, dev tunnel "
                   "(~26 ms RPC/dispatch); steady-state excludes "
                   "compile/warmup frames"}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["results"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
