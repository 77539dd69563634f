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
    # multi-host bring-up (SURVEY.md §2.3: DCN runtime init). Single-process
    # runs leave these unset; under a launcher (GKE/axlearn/mpirun) they are
    # usually picked up from the environment instead.
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 for jax.distributed")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("overrides", nargs="*", default=[])
    return p


def main(argv=None) -> int:
    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)

    from yolov3_tensorflow_tpu.parallel.multihost import initialize_distributed
    initialize_distributed(coordinator_address=args.coordinator_address,
                           num_processes=args.num_processes,
                           process_id=args.process_id)

    cfg = load_config(args.config or None, args.overrides).finalize()
    trainer = Trainer(cfg, seed=args.seed)
    trainer.fit()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
