"""Training entry point (reference train.py + args.py).

  python -m yolov3_tensorflow_tpu.cli.train \
      --config voc.json train.batch_size=32 data.train_file=.../train.txt
"""

from __future__ import annotations

import argparse

from yolov3_tensorflow_tpu.config import load_config
from yolov3_tensorflow_tpu.train.trainer import Trainer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train YOLOv3 on TPU.",
        epilog="Any config field can be overridden positionally as "
               "section.key=value, e.g. train.batch_size=32")
    p.add_argument("--config", type=str, default="",
                   help="optional JSON config file")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("overrides", nargs="*", default=[])
    return p


def main(argv=None) -> int:
    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    cfg = load_config(args.config or None, args.overrides).finalize()
    trainer = Trainer(cfg, seed=args.seed)
    trainer.fit()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
