"""Host data-pipeline throughput: images/sec through the real DataLoader.

The device-side benches (bench.py, bench_train.py) use device-resident
data; this measures the OTHER half — annotation parse + cv2 imread +
augmentation chain + y_true encoding + batch assembly on host threads —
so the end-to-end training picture is honest about where the input
pipeline saturates. The Trainer overlaps this with device compute via the
prefetch queue, so training throughput ~= min(device step rate, this).

  python scripts/bench_loader.py [--threads 4,8,16] [--images 200]

Uses the deterministic synthetic dataset (no external data needed).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--threads", type=str, default="4,8,16")
    p.add_argument("--images", type=int, default=200,
                   help="synthetic dataset size")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3,
                   help="epochs per timing pass (first warms page cache)")
    p.add_argument("--out_dir", default="/tmp/loader_bench")
    args = p.parse_args(argv)

    from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS
    from yolov3_tensorflow_tpu.data.loader import DataLoader
    from yolov3_tensorflow_tpu.data.synthetic import generate_dataset

    data = generate_dataset(os.path.join(args.out_dir, "data"),
                            num_images=args.images, seed=0,
                            img_size=(416, 416))
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)

    def run(mode: str, threads: int, mixup: bool,
            device_augment: bool = False, device_encode: bool = False
            ) -> float:
        loader = DataLoader(data["annotation_file"], 3, anchors, args.batch,
                            (416, 416), mode=mode, letterbox=(mode == "val"),
                            num_threads=threads, use_mix_up=mixup,
                            device_augment=device_augment, staged_size=416,
                            device_encode=device_encode)
        n = 0
        # epoch 0 warms the OS page cache; time the rest
        for b in loader.epoch(0):
            pass
        t0 = time.perf_counter()
        for ep in range(1, args.epochs + 1):
            for b in loader.epoch(ep):
                n += (b.images if b.images is not None
                      else b.staged).shape[0]
        return n / (time.perf_counter() - t0)

    print(f"host: {os.cpu_count()} cpus; dataset {args.images} x 416x416 "
          f"jpgs, batch {args.batch}", flush=True)
    for threads in (int(t) for t in args.threads.split(",")):
        r_train = run("train", threads, mixup=False)
        r_mix = run("train", threads, mixup=True)
        r_val = run("val", threads, mixup=False)
        # device-resident data path: host does decode + parameter draws +
        # (optionally) y_true encode only; pixels (and grids) move on-device
        r_plan = run("train", threads, mixup=True, device_augment=True)
        r_plan_enc = run("train", threads, mixup=True, device_augment=True,
                         device_encode=True)
        print(f"threads {threads:3d}: train {r_train:7.1f} img/s | "
              f"train+mixup {r_mix:7.1f} | val {r_val:7.1f} | "
              f"device-augment {r_plan:7.1f} | +device-encode "
              f"{r_plan_enc:7.1f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
